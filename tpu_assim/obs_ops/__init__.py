"""Observation operators (reference: /root/reference/pytassim/obs_ops/)."""

from tpu_assim.obs_ops.base_ops import BaseOperator
from tpu_assim.obs_ops.lorenz96 import IdentityOperator, BernoulliOperator

__all__ = ["BaseOperator", "IdentityOperator", "BernoulliOperator"]
