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


def cast_float_tree(tree, dtype):
    """Cast floating leaves of a pytree to ``dtype``; everything else
    (int8/packed weights, counters) passes through. The ONE copy of the
    mixed-precision cast rule (also used per-step by
    ``make_train_step(compute_dtype=...)``)."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def cast_floats(obj: nnx.Module, dtype=jnp.bfloat16, *,
                keep_batch_stats: bool = False) -> nnx.Module:
    """Cast every floating-point array in ``obj``'s state to ``dtype``,
    in place. Integer state (packed/int8 weights, counters) is untouched.
    Feed inputs of the same dtype for a fully-``dtype`` float path.

    ``keep_batch_stats=True`` leaves ``nnx.BatchStat`` variables (BN
    running mean/var) in their current dtype and pins each BatchNorm's
    compute ``dtype`` to the target so its outputs stay narrowed — use
    this when casting a model for pure-low-precision TRAINING: flax
    computes batch statistics in f32 and assigns them into the stat
    variables, which raises (future JAX: errors) on an unsafe f32->bf16
    scatter cast when the stats were narrowed; f32 stats are also what
    the mixed-precision convention keeps elsewhere (masters, optimizer
    moments). Serving casts (``deploy``/``Predictor``) never update
    stats and should keep the default."""
    if keep_batch_stats:
        rest = cast_float_tree(
            nnx.state(obj, nnx.Not(nnx.BatchStat)), dtype)
        nnx.update(obj, rest)
        for _path, node in nnx.iter_graph(obj):
            if isinstance(node, nnx.BatchNorm):
                # without this the f32 stats promote BN outputs to f32
                # and downstream convs see mixed operand dtypes
                node.dtype = dtype
        return obj
    nnx.update(obj, cast_float_tree(nnx.state(obj), dtype))
    return obj
