"""Numerical-sanity utilities (SURVEY §5: the JAX analog of sanitizers).

`checked_train_step` wraps a train step with `jax.experimental.checkify` so
NaN/Inf production inside the compiled program raises with a location
instead of silently corrupting the run — the functional-core replacement
for race detectors/ASAN in the reference's (absent) tooling.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, errors=checkify.float_checks):
    """Wrap `fn` with checkify; returns a fn raising on NaN/Inf/div0."""
    checked_fn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite_tree(tree, name: str = "tree"):
    """Host-side finite check over a pytree (use in tests / debug loops)."""
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def tree_norms(tree) -> dict:
    """Per-top-level-key L2 norms — quick blowup triage for params/grads."""
    out = {}
    for key, sub in tree.items():
        leaves = jax.tree_util.tree_leaves(sub)
        if leaves:
            out[key] = float(
                jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))
            )
    return out
