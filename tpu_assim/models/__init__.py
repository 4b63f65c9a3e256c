"""Toy models and integration (reference: /root/reference/pytassim/model/)."""

from tpu_assim.models.lorenz96 import Lorenz96
from tpu_assim.models.lorenz84 import Lorenz84
from tpu_assim.models.integration import (
    BaseIntegrator,
    RK4Integrator,
    integrate_trajectory,
)

__all__ = [
    "Lorenz96",
    "Lorenz84",
    "BaseIntegrator",
    "RK4Integrator",
    "integrate_trajectory",
]
