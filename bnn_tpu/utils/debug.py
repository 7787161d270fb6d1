"""Numerical-debugging helpers (SURVEY.md §5.2).

The reference has no sanitizers at all (pure Python + flake8; reference
tox.ini:1-3). The TPU-native equivalents of "race detection / sanitizers"
for a compiled functional framework are numeric checks:

- :func:`debug_nans` — scoped ``jax_debug_nans``: any NaN produced inside
  the block re-runs the offending primitive un-jitted and raises with the
  exact operation (XLA-side "sanitizer").
- :func:`checkify_errors` — wrap a jitted function with
  ``jax.experimental.checkify`` so NaN/OOB/div-by-zero inside compiled code
  (including under ``jit``/``scan``) become *returned*, raiseable errors
  instead of silent garbage — usable on TPU where eager re-execution is not.
- :func:`assert_finite` — pytree-wide finiteness assert for use at step
  boundaries (e.g. gradient pytrees in a QAT loop, where an exploding alpha
  scale is the classic failure).

Pallas kernels get the same treatment via their ``interpret=True`` mode
(every kernel in :mod:`bnn_tpu.kernels` exposes it), which runs the kernel
body un-compiled on CPU for inspection.
"""
from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

__all__ = ["debug_nans", "checkify_errors", "assert_finite"]


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped NaN checking: ``with debug_nans(): step(...)`` raises
    ``FloatingPointError`` at the first NaN-producing op."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkify_errors(fn: Callable, *, errors=None) -> Callable:
    """Wrap ``fn`` so float errors inside compiled code are raised eagerly.

    Returns a callable with the same signature; internally runs
    ``checkify.checkify(fn)`` and throws the captured error (if any) after
    the computation. ``errors`` defaults to the float-error set (NaN, inf,
    div-by-zero); pass ``checkify.all_checks`` to add OOB indexing.
    """
    errors = checkify.float_checks if errors is None else errors
    checked = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree, name: str = "tree") -> None:
    """Raise ``ValueError`` naming the offending path if any leaf of the
    pytree holds a non-finite value. Host-side (blocks on the values) — use
    at step boundaries, not inside jit."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise ValueError(f"non-finite values in {name}: {bad}")
