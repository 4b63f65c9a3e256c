"""Kernel family for the kernelized ETKF (reference: /root/reference/pytassim/kernels/)."""

from tpu_assim.ops.kernels.base import (
    BaseKernel,
    CompKernel,
    AdditiveKernel,
    MultiplicativeKernel,
    PowerKernel,
)
from tpu_assim.ops.kernels.concrete import (
    LinearKernel,
    GaussKernel,
    RBFKernel,
    PolyKernel,
    PeriodicKernel,
    RationalKernel,
    TanhKernel,
    OrnsteinUhlenbeckKernel,
    ScaleKernel,
    DiagKernel,
    ModuleKernel,
)
from tpu_assim.ops.kernels.utils import dot_product, distance_matrix, euclidean_dist

__all__ = [
    "BaseKernel",
    "CompKernel",
    "AdditiveKernel",
    "MultiplicativeKernel",
    "PowerKernel",
    "LinearKernel",
    "GaussKernel",
    "RBFKernel",
    "PolyKernel",
    "PeriodicKernel",
    "RationalKernel",
    "TanhKernel",
    "OrnsteinUhlenbeckKernel",
    "ScaleKernel",
    "DiagKernel",
    "ModuleKernel",
    "dot_product",
    "distance_matrix",
    "euclidean_dist",
]
