"""Numeric analysis cores (reference: /root/reference/pytassim/core/)."""

from tpu_assim.ops.linalg import (
    evd,
    rev_evd,
    svd,
    rev_svd,
    matrix_product,
    diagonal_add,
    eigh_psd,
    inv_sqrt_psd_newton,
)
from tpu_assim.ops.etkf import (
    etkf_weights,
    etkf_weights_from_gram,
    etkf_prior_weights,
    letkf_weights_dense,
    letkf_weights_nbh,
)
from tpu_assim.ops.ketkf import ketkf_weights, center_gram
from tpu_assim.ops.ienks import ienks_transform_step, ienks_bundle_step
from tpu_assim.ops.localization import (
    BaseLocalization,
    GaspariCohn,
    GaspariCohnInf,
    abs_distance,
    periodic_distance,
    neighborhood_select,
)
from tpu_assim.ops import kernels

__all__ = [
    "evd",
    "rev_evd",
    "svd",
    "rev_svd",
    "matrix_product",
    "diagonal_add",
    "eigh_psd",
    "inv_sqrt_psd_newton",
    "etkf_weights",
    "etkf_weights_from_gram",
    "etkf_prior_weights",
    "letkf_weights_dense",
    "letkf_weights_nbh",
    "ketkf_weights",
    "center_gram",
    "ienks_transform_step",
    "ienks_bundle_step",
    "BaseLocalization",
    "GaspariCohn",
    "GaspariCohnInf",
    "abs_distance",
    "periodic_distance",
    "neighborhood_select",
    "kernels",
]
