"""
Test decorators (reference: /root/reference/pytassim/testing/decorators.py:39
``if_gpu_decorator`` skips unless CUDA is available; here the accelerator is
a TPU).
"""

import functools

__all__ = ["if_tpu_decorator", "tpu_available"]


def tpu_available() -> bool:
    try:
        import jax

        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


def if_tpu_decorator(test_fn):
    """Skip the test unless a TPU device is present (works for pytest and
    stdlib unittest)."""

    @functools.wraps(test_fn)
    def wrapper(*args, **kwargs):
        if not tpu_available():
            import pytest

            pytest.skip("no TPU available")
        return test_fn(*args, **kwargs)

    return wrapper
