"""Model precision casting.

TPU inference is usually bandwidth-bound outside the MXU; running the float
path (stem/head, BatchNorm, activations, residuals) in bf16 halves HBM
traffic and moves float convs to the MXU's bf16 rate. Binary layers are
unaffected (int8 compute, exact int32 accumulation); only the float glue
changes precision (~4e-3 relative logit error on ResNet-18 — standard
serving practice).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["cast_floats"]


def cast_floats(obj: nnx.Module, dtype=jnp.bfloat16) -> nnx.Module:
    """Cast every floating-point array in ``obj``'s state to ``dtype``,
    in place. Integer state (packed/int8 weights, counters) is untouched.
    Feed inputs of the same dtype for a fully-``dtype`` float path."""
    state = nnx.state(obj)
    state = jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        state,
    )
    nnx.update(obj, state)
    return obj
