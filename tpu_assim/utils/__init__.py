"""Utilities (reference: /root/reference/pytassim/utilities/)."""

from tpu_assim.utils.decorators import lazy_property, bound_scalar, ensure_array
from tpu_assim.utils.checkpoint import (
    save_weights,
    load_weights,
    save_arrays,
    load_arrays,
)

__all__ = [
    "lazy_property",
    "bound_scalar",
    "ensure_array",
    "save_weights",
    "load_weights",
    "save_arrays",
    "load_arrays",
]
