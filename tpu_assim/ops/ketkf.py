"""
Kernelized ETKF (KETKF) analysis core.

Functional TPU-native equivalent of the reference's ``KETKFModule``
(/root/reference/pytassim/core/ketkf.py:29-94): the same regularized
weight-space solve as the ETKF, but the Gram matrix comes from an arbitrary
kernel and is double-centered in feature space.

Kernels are plain callables ``kernel(x, y) -> gram`` over the trailing two
dims (see :mod:`tpu_assim.ops.kernels`); everything broadcasts over leading
batch dimensions so the localized variant (LKETKF) evaluates all grid columns
in one batched call.
"""

from typing import Callable, Tuple

import jax.numpy as jnp

from tpu_assim.ops.etkf import etkf_weights_from_gram, etkf_prior_weights

__all__ = ["ketkf_weights", "center_gram"]


def center_gram(
    k_perts: jnp.ndarray, k_obs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Double-center the perturbation Gram matrix and center the obs Gram
    vector, with the exact operation order of the reference
    (pytassim/core/ketkf.py:77-89):

        m_row  = mean_cols(K_zz)                  (row means, keepdim)
        m_part = m_row - mean(m_row)              (row means minus total mean)
        K_zz_c = K_zz - mean_rows(K_zz) - m_part
        K_zy_c = K_zy - mean_rows(K_zy) - m_part
    """
    k_partial_mean = jnp.mean(k_perts, axis=-1, keepdims=True)
    k_partial_mean = k_partial_mean - jnp.mean(k_partial_mean, axis=-2, keepdims=True)
    k_perts_centered = (
        k_perts - jnp.mean(k_perts, axis=-2, keepdims=True) - k_partial_mean
    )
    k_obs_centered = k_obs - jnp.mean(k_obs, axis=-2, keepdims=True)
    k_obs_centered = k_obs_centered - k_partial_mean
    return k_perts_centered, k_obs_centered


def ketkf_weights(
    normed_perts: jnp.ndarray,
    normed_obs: jnp.ndarray,
    kernel: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    inf_factor: jnp.ndarray | float = 1.0,
    method: str = "eigh",
    newton_iters: int = 25,
) -> jnp.ndarray:
    """KETKF ensemble weights (reference: pytassim/core/ketkf.py:65-94 with
    the forward template of core/etkf.py:79-103).

    Parameters
    ----------
    normed_perts : [..., k, l] normalized obs-space ensemble perturbations.
    normed_obs : [..., 1, l] (or [..., l]) normalized innovations.
    kernel : callable Gram function, e.g. :class:`tpu_assim.ops.kernels.GaussKernel`.
    inf_factor : inflation factor rho (l2-regularization of the GP weights).
    method : ``"eigh"`` (exact) or ``"newton"`` (matmul-only Newton-Schulz
        on the MXU — valid because the double-centered Gram of a PSD kernel
        is itself PSD: centering is the projection ``P K P``).
    newton_iters : iterations for ``method="newton"``.
    """
    if normed_obs.ndim == normed_perts.ndim - 1:
        normed_obs = normed_obs[..., None, :]
    ens_size = normed_perts.shape[-2]
    if normed_perts.shape[-1] == 0:
        prior = etkf_prior_weights(ens_size, inf_factor, dtype=normed_perts.dtype)
        return jnp.broadcast_to(
            prior, normed_perts.shape[:-2] + (ens_size, ens_size)
        )
    k_perts = kernel(normed_perts, normed_perts)
    k_obs = kernel(normed_perts, normed_obs)
    k_perts_centered, k_obs_centered = center_gram(k_perts, k_obs)
    w_mean, w_perts, _ = etkf_weights_from_gram(
        k_perts_centered, k_obs_centered, ens_size, inf_factor,
        method=method, newton_iters=newton_iters,
    )
    return w_mean + w_perts
