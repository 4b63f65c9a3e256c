"""Pre/post transforms (reference: /root/reference/pytassim/transform/)."""

from tpu_assim.transform.base import BaseTransformer
from tpu_assim.transform.mul_inflation import MultiplicativeInflation
from tpu_assim.transform.normalize import Normalizer

__all__ = ["BaseTransformer", "MultiplicativeInflation", "Normalizer"]
