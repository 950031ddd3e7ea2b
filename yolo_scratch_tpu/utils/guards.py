"""Numerical-safety guards (SURVEY.md §5.2: the TPU-native stand-in for the
reference's nonexistent sanitizers is JAX purity + explicit NaN checks).

* ``finite_or_raise``  — host-side assert that a metrics dict is finite.
* ``tree_all_finite``  — device-side scalar: every leaf of a pytree finite
  (cheap to fold into a jitted step; one bool comes back).
* ``checkify_fn``      — wrap a jitted function with jax.checkify NaN/div
  checks for debugging (checked errors surface as Python exceptions).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def tree_all_finite(tree: Any) -> jnp.ndarray:
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    flags = [
        jnp.all(jnp.isfinite(l)) for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)
    ]
    if not flags:
        return jnp.asarray(True)
    return jnp.all(jnp.stack(flags))


def finite_or_raise(metrics: Dict[str, Any], context: str = "train step") -> None:
    bad = {k: float(v) for k, v in metrics.items() if not np.isfinite(float(v))}
    if bad:
        raise FloatingPointError(f"non-finite metrics in {context}: {bad}")


def checkify_fn(fn: Callable, *, errors=checkify.float_checks) -> Callable:
    """Return a wrapped fn that raises on NaN/inf produced inside ``fn``."""
    checked = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
