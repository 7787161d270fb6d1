"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipeline parallelism at all (SURVEY.md §2.3 — its only
scaling mechanisms are ``nn.DataParallel``/DDP, examples/imagenet.py:120-187).
This module is the TPU-native extra: a microbatched pipeline schedule written
with ``jax.shard_map`` + ``lax.ppermute`` so activations hop stage→stage over
ICI while every stage computes a different microbatch — the standard SPMD
pipelining recipe (scaling-book formulation), not a port of anything torch.

Scope (stated, not hidden): stages must be *homogeneous* — identical module
structure and matching input/output activation shapes — so per-stage params
stack into one pytree with a leading ``num_stages`` axis that shards
``P('pipe')``. That is exactly the shape of the repeated binary residual
trunk this framework serves (stacks of same-width binary blocks); the stem /
head stay outside the pipeline. Heterogeneous stages would need per-stage
jitted programs, which defeats SPMD — by design we don't do that.

Differentiable end to end: the schedule is a ``lax.scan`` over
``n_micro + n_stages - 1`` ticks, ``ppermute`` and the masked ``psum``
broadcast both have well-defined transposes, so ``jax.grad`` through
:func:`pipeline_apply` yields the standard GPipe backward (reverse schedule)
for free.

Note on mutable state: the stage function is pure. BatchNorm running-stat
updates inside a pipelined trunk are NOT written back (merge/discard) — run
pipelined training with frozen stats, or use the plain data/tensor-parallel
train step (bnn_tpu/parallel/trainstep.py) which handles stats.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_pipeline_mesh",
    "stack_stage_states",
    "make_stage_fn",
    "shard_stacked_state",
    "pipeline_apply",
]


def make_pipeline_mesh(pipe: int, data: int = 1,
                       devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A ``(pipe, data)`` mesh. ``pipe`` is the stage axis (activations hop
    along it via ppermute); ``data`` batch-shards each microbatch."""
    devices = list(jax.devices()) if devices is None else list(devices)
    assert pipe * data == len(devices), (pipe, data, len(devices))
    arr = np.array(devices).reshape(pipe, data)
    return Mesh(arr, axis_names=("pipe", "data"))


def stack_stage_states(modules: Sequence[nnx.Module]):
    """Stack the states of structurally-identical modules along a new leading
    ``num_stages`` axis (the axis that shards over ``pipe``)."""
    states = [nnx.state(m) for m in modules]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_stage_fn(template: nnx.Module) -> Callable:
    """Build the pure per-stage function ``stage_fn(state, x) -> y`` from a
    template module (any of the identical stage modules)."""
    graphdef, _ = nnx.split(template)

    def stage_fn(state, x):
        return nnx.merge(graphdef, state)(x)

    return stage_fn


def shard_stacked_state(stacked_state, mesh: Mesh, axis: str = "pipe"):
    """Commit a stacked stage state to the mesh: leading stage axis over
    ``pipe``, everything else local."""
    def _put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(_put, stacked_state)


def pipeline_apply(stage_fn: Callable, stacked_state, x: jax.Array, *,
                   mesh: Mesh, n_microbatches: int,
                   axis: str = "pipe") -> jax.Array:
    """Run ``x`` through ``n_stages`` sequential stages with a GPipe
    microbatch schedule over the mesh's ``axis``.

    ``stacked_state``: stage params stacked on a leading axis of size
    ``n_stages`` (see :func:`stack_stage_states`), sharded ``P(axis)``.
    ``x``: ``(batch, ...)`` — split into ``n_microbatches`` equal microbatches.
    If the mesh also has a ``data`` axis (size > 1), each microbatch is
    batch-sharded across it, composing PP x DP in one program.

    Returns ``stage_{S-1}(... stage_0(x))`` with the same leading batch dim,
    replicated over ``axis``. Semantics are verified against the plain
    sequential application in tests/test_parallel.py.
    """
    n_stages = mesh.shape[axis]
    batch = x.shape[0]
    n_stacked = jax.tree.leaves(stacked_state)[0].shape[0]
    if n_stacked != n_stages:
        # a multiple would pass shard_map's P(axis) spec with >1 rows per
        # device, and the per-device `p[0]` below would silently DROP the
        # extra stages — plausible-looking wrong activations, no error
        raise ValueError(
            f"{n_stacked} stacked stages != {n_stages}-way '{axis}' mesh "
            f"axis (one stage per pipeline device)")
    assert batch % n_microbatches == 0, (batch, n_microbatches)
    micro = batch // n_microbatches
    has_data = "data" in mesh.shape and mesh.shape["data"] > 1
    data_spec = "data" if has_data else None
    if has_data:
        assert micro % mesh.shape["data"] == 0, (
            f"microbatch size {micro} must divide over the data axis "
            f"({mesh.shape['data']}); use fewer microbatches or more batch")
    xs = x.reshape(n_microbatches, micro, *x.shape[1:])

    state_specs = jax.tree.map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stacked_state)
    x_spec = P(None, data_spec, *([None] * (x.ndim - 1)))

    def _local(state, xs_local):
        # local stage params: leading axis is the per-device shard of size 1
        state = jax.tree.map(lambda p: p[0], state)
        s = jax.lax.axis_index(axis)
        last = n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        ticks = n_microbatches + n_stages - 1

        buf = jnp.zeros_like(xs_local[0])
        ys = jnp.zeros_like(xs_local)

        def tick(carry, t):
            buf, ys = carry
            # stage 0 ingests microbatch t (clamped: past the last microbatch
            # it recomputes a stale one whose output is never written)
            feed_idx = jnp.clip(t, 0, n_microbatches - 1)
            feed = jax.lax.dynamic_index_in_dim(xs_local, feed_idx, 0,
                                                keepdims=False)
            inp = jnp.where(s == 0, feed, buf)
            out = stage_fn(state, inp)
            # the last stage finishes microbatch (t - last) at tick t
            out_idx = jnp.clip(t - last, 0, n_microbatches - 1)
            valid = jnp.logical_and(t - last >= 0, s == last)
            cur = jax.lax.dynamic_index_in_dim(ys, out_idx, 0, keepdims=False)
            ys = jax.lax.dynamic_update_index_in_dim(
                ys, jnp.where(valid, out, cur), out_idx, 0)
            # hand the activation to the next stage over ICI
            buf = jax.lax.ppermute(out, axis, perm)
            return (buf, ys), None

        (_, ys), _ = jax.lax.scan(tick, (buf, ys), jnp.arange(ticks))
        # only the last stage holds real outputs; masked psum broadcasts them
        return jax.lax.psum(jnp.where(s == last, ys, jnp.zeros_like(ys)), axis)

    y = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(state_specs, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(stacked_state, xs)
    return y.reshape(batch, *y.shape[2:])
