"""
Small decorators/validators (reference: /root/reference/pytassim/utilities/decorators.py:26-76).
"""

from typing import Optional

__all__ = ["lazy_property", "bound_scalar", "ensure_array"]


def lazy_property(name: str):
    """Cache a property's value on the instance under ``_<name>``
    (reference: utilities/decorators.py:26-48)."""

    def decorator(fget):
        attr = "_" + name

        @property
        def wrapper(self):
            cached = getattr(self, attr, None)
            if cached is None:
                cached = fget(self)
                setattr(self, attr, cached)
            return cached

        return wrapper

    return decorator


def bound_scalar(
    value,
    min_val: Optional[float] = None,
    max_val: Optional[float] = None,
    name: str = "value",
) -> float:
    """Validate that a scalar lies in [min_val, max_val]
    (reference: utilities/decorators.py:60-76 ``bound_tensor``)."""
    value = float(value)
    if min_val is not None and value < min_val:
        raise ValueError(
            "{0} has to be larger or equal than {1}".format(name, min_val)
        )
    if max_val is not None and value > max_val:
        raise ValueError(
            "{0} has to be smaller or equal than {1}".format(name, max_val)
        )
    return value


def ensure_array(value):
    """Coerce python scalars to jnp arrays
    (reference: utilities/decorators.py:51-57 ``ensure_tensor``)."""
    import jax.numpy as jnp

    return jnp.asarray(value)
