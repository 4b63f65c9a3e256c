"""Native host-side runtime (C++ via ctypes). See :mod:`tpu_assim.runtime.native`."""

from tpu_assim.runtime.native import (
    native_available,
    letkf_weights_dense_cpu,
    etkf_weights_cpu,
    bucket_obs_cpu,
    gaspari_cohn_cpu,
)

__all__ = [
    "native_available",
    "letkf_weights_dense_cpu",
    "etkf_weights_cpu",
    "bucket_obs_cpu",
    "gaspari_cohn_cpu",
]
