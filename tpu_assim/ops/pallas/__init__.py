"""Pallas TPU kernels for the analysis hot path."""

from tpu_assim.ops.pallas.letkf import letkf_nbh_analysis_fused

__all__ = ["letkf_nbh_analysis_fused"]
