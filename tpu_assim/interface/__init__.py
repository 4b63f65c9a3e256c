"""Algorithm interface layer (reference: /root/reference/pytassim/interface/__init__.py:1-6)."""

from tpu_assim.interface.base import BaseAssimilation
from tpu_assim.interface.filter import FilterAssimilation
from tpu_assim.interface.variational import VarAssimilation
from tpu_assim.interface.etkf import ETKF
from tpu_assim.interface.letkf import LETKF
from tpu_assim.interface.ketkf import KETKF
from tpu_assim.interface.lketkf import LKETKF
from tpu_assim.interface.ienks import IEnKSTransform, IEnKSBundle
from tpu_assim.interface.lienks import (
    LocalizedIEnKSTransform,
    LocalizedIEnKSBundle,
)

__all__ = [
    "BaseAssimilation",
    "FilterAssimilation",
    "VarAssimilation",
    "ETKF",
    "LETKF",
    "KETKF",
    "LKETKF",
    "IEnKSTransform",
    "IEnKSBundle",
    "LocalizedIEnKSTransform",
    "LocalizedIEnKSBundle",
]
