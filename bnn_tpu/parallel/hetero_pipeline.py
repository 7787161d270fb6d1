"""Heterogeneous-stage pipeline parallelism (GPipe over a ``pipe`` axis).

``parallel.pipeline`` requires homogeneous stages (stackable params,
matching activation shapes) — which excludes the real ResNet trunk, whose
stage widths grow 64 -> 512 while feature maps shrink. This module lifts
that restriction while KEEPING the single-program SPMD formulation
(shard_map + ppermute over ICI, differentiable end to end):

- every stage's parameters are flattened to one padded f32 row of a
  ``(n_stages, Lmax)`` buffer that shards ``P('pipe')`` — each chip holds
  only its own stage's row;
- activations cross stage boundaries as padded flat ``(micro, Amax)``
  buffers (``Amax`` = the largest per-sample boundary activation);
- the per-device stage body is selected with ``lax.switch`` on
  ``axis_index('pipe')`` — each branch unflattens params/input to its own
  STATIC shapes, applies its module, and re-flattens. Every device traces
  all branches once; at runtime each executes only its own.

Training works on the flat buffer directly: elementwise optimizers (Adam,
SGD) on the flat row are exactly the per-leaf update, and padding lanes
have zero gradient so they stay zero. ``unflatten_stage_states`` recovers
per-stage module states for checkpointing / evaluation.

Unlike the homogeneous pipeline, BatchNorm running stats are NOT lost:
``apply(..., return_state=True)`` returns the updated flat buffer with
each stage's mutable-state writes, committed per REAL microbatch tick in
schedule order — exactly the sequential per-microbatch EMA (verified in
tests). With a data axis, stats are additionally pmean-averaged across
replicas (SyncBN-style).

The reference has no pipeline parallelism of any kind (SURVEY.md §2.3).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["HeteroPipeline"]


def _flatten_state(st) -> Tuple[jax.Array, list, object]:
    leaves, treedef = jax.tree.flatten(st)
    assert all(jnp.issubdtype(l.dtype, jnp.floating) for l in leaves), (
        "hetero pipeline flattens stage params into one f32 buffer; "
        "non-float stage state is not supported")
    shapes = [tuple(l.shape) for l in leaves]
    flat = (jnp.concatenate([l.reshape(-1).astype(jnp.float32)
                             for l in leaves])
            if leaves else jnp.zeros((0,), jnp.float32))
    return flat, shapes, treedef


def _unflatten_state(flat, shapes, treedef, dtypes):
    leaves, off = [], 0
    for shp, dt in zip(shapes, dtypes):
        n = math.prod(shp) if shp else 1
        leaves.append(flat[off:off + n].reshape(shp).astype(dt))
        off += n
    return jax.tree.unflatten(treedef, leaves)


class HeteroPipeline:
    """GPipe schedule over arbitrary (non-uniform) pipeline stages.

    Args:
        stages: the sequential stage modules (stage i feeds stage i+1).
        x_shape: per-sample input shape (no batch dim), used to derive every
            boundary activation shape via ``jax.eval_shape``.
        mesh: a mesh with a ``pipe`` axis of size ``len(stages)`` (and
            optionally a ``data`` axis that batch-shards each microbatch);
            see :func:`~bnn_tpu.parallel.pipeline.make_pipeline_mesh`.

    Usage::

        pipe = HeteroPipeline(stages, x_shape=(32, 32, 3), mesh=mesh)
        y = pipe.apply(pipe.flat_params, x, n_microbatches=4)
        grads = jax.grad(loss)(pipe.flat_params, ...)   # trains directly
        states = pipe.unflatten_stage_states(flat)      # for checkpoints
    """

    def __init__(self, stages: Sequence[nnx.Module], x_shape: Tuple[int, ...],
                 mesh: Mesh, axis: str = "pipe"):
        self.n_stages = len(stages)
        self.mesh = mesh
        self.axis = axis
        assert mesh.shape[axis] == self.n_stages, (
            f"mesh {axis} axis {mesh.shape[axis]} != {self.n_stages} stages")

        self._graphdefs, self._shapes, self._treedefs = [], [], []
        self._dtypes = []
        flats, masks = [], []
        self.io_shapes = []  # per-stage (in_shape, out_shape), per sample
        cur = jax.ShapeDtypeStruct((1,) + tuple(x_shape), jnp.float32)
        for m in stages:
            gd, st = nnx.split(m)
            flat, shapes, treedef = _flatten_state(st)
            leaves = jax.tree.leaves(st)
            self._graphdefs.append(gd)
            self._shapes.append(shapes)
            self._treedefs.append(treedef)
            self._dtypes.append([l.dtype for l in leaves])
            flats.append(flat)
            # 1.0 on lanes holding trainable Params, 0.0 on everything else
            # (BatchNorm running stats...). flat_state() iterates in the
            # same sorted order jax.tree.flatten uses, so lane offsets line
            # up with _flatten_state's concatenation.
            masks.append(jnp.concatenate([
                jnp.full(math.prod(v.value.shape) if v.value.shape else 1,
                         1.0 if issubclass(v.type, nnx.Param) else 0.0,
                         jnp.float32)
                for _, v in st.flat_state()
            ]) if leaves else jnp.zeros((0,), jnp.float32))

            def _fwd(state, v, gd=gd):
                return nnx.merge(gd, state)(v)

            out = jax.eval_shape(_fwd, st, cur)
            self.io_shapes.append((tuple(cur.shape[1:]), tuple(out.shape[1:])))
            cur = out

        self.out_shape = self.io_shapes[-1][1]
        self._lmax = max(f.shape[0] for f in flats)
        self._amax = max(
            max(math.prod(i), math.prod(o)) for i, o in self.io_shapes)
        stacked = jnp.stack([
            jnp.pad(f, (0, self._lmax - f.shape[0])) for f in flats])
        self.flat_params = jax.device_put(
            stacked, NamedSharding(mesh, P(axis, None)))
        #: (n_stages, Lmax) 0/1 buffer — 1.0 exactly on nnx.Param lanes.
        #: Trainers must keep weight decay off the 0 lanes (running stats);
        #: passing ``params * pipe.param_mask`` to ``tx.update`` does it for
        #: any optax chain whose only params-reading transform is
        #: ``add_decayed_weights`` (adamw/adam/sgd qualify).
        self.param_mask = jax.device_put(
            jnp.stack([jnp.pad(mk, (0, self._lmax - mk.shape[0]))
                       for mk in masks]),
            NamedSharding(mesh, P(axis, None)))

    # -- state round-trips ------------------------------------------------

    def unflatten_stage_states(self, flat_params):
        """Per-stage nnx states from the flat buffer (for checkpointing)."""
        return [
            _unflatten_state(flat_params[i], self._shapes[i],
                             self._treedefs[i], self._dtypes[i])
            for i in range(self.n_stages)
        ]

    def stage_modules(self, flat_params):
        """Re-materialized stage modules (e.g. for sequential eval)."""
        return [nnx.merge(gd, st) for gd, st in
                zip(self._graphdefs, self.unflatten_stage_states(flat_params))]

    # -- pipelined forward -------------------------------------------------

    def _branches(self, micro: int):
        branches = []
        for i in range(self.n_stages):
            in_shape, out_shape = self.io_shapes[i]
            gd = self._graphdefs[i]
            shapes, treedef = self._shapes[i], self._treedefs[i]
            dtypes = self._dtypes[i]
            n = sum(math.prod(s) if s else 1 for s in shapes)

            def _branch(flat, xflat, gd=gd, shapes=shapes, treedef=treedef,
                        dtypes=dtypes, in_shape=in_shape,
                        out_shape=out_shape, n=n):
                st = _unflatten_state(flat, shapes, treedef, dtypes)
                x = xflat[:, :math.prod(in_shape)].reshape(
                    (micro,) + in_shape)
                mod = nnx.merge(gd, st)
                y = mod(x).reshape(micro, -1)
                # mutable state (BN running stats in train mode) written
                # back into this stage's flat row
                new_flat, _, _ = _flatten_state(nnx.state(mod))
                new_flat = jnp.pad(new_flat, (0, flat.shape[0] - n))
                return new_flat, jnp.pad(
                    y.astype(xflat.dtype),
                    ((0, 0), (0, self._amax - y.shape[1])))

            branches.append(_branch)
        return branches

    def apply(self, flat_params, x: jax.Array, *,
              n_microbatches: int, return_state: bool = False):
        """Pipelined forward of ``x`` (``(batch, *x_shape)``); returns the
        final stage output, differentiable w.r.t. ``flat_params``/``x``.

        ``return_state=True`` additionally returns the updated flat buffer
        carrying each stage's mutable-state writes (BatchNorm running
        stats in train mode) with EXACTLY the sequential per-microbatch
        EMA semantics — each stage processes microbatches in order in the
        GPipe schedule, the same order a sequential loop would. The state
        path is gradient-stopped."""
        axis, mesh = self.axis, self.mesh
        n_stages = self.n_stages
        batch = x.shape[0]
        if tuple(x.shape[1:]) != self.io_shapes[0][0]:
            # the flat-buffer pad/reshape below would happily accept any
            # smaller input and reinterpret it (plus zeros) into the
            # declared layout — finite garbage with no error
            raise ValueError(
                f"input sample shape {tuple(x.shape[1:])} != pipeline's "
                f"declared x_shape {self.io_shapes[0][0]}")
        assert batch % n_microbatches == 0, (batch, n_microbatches)
        micro = batch // n_microbatches
        has_data = "data" in mesh.shape and mesh.shape["data"] > 1
        data_spec = "data" if has_data else None
        if has_data:
            assert micro % mesh.shape["data"] == 0
            micro_local = micro // mesh.shape["data"]
        else:
            micro_local = micro
        branches = self._branches(micro_local)

        xf = x.reshape(batch, -1).astype(jnp.float32)
        xf = jnp.pad(xf, ((0, 0), (0, self._amax - xf.shape[1])))
        xs = xf.reshape(n_microbatches, micro, self._amax)

        state_spec = P(axis, None)
        x_spec = P(None, data_spec, None)

        def _local(flat_local, xs_local):
            flat0 = flat_local[0]  # this device's stage row
            s = jax.lax.axis_index(axis)
            last = n_stages - 1
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            ticks = n_microbatches + n_stages - 1

            buf = jnp.zeros_like(xs_local[0])
            ys = jnp.zeros_like(xs_local)

            def tick(carry, t):
                buf, ys, flat = carry
                feed_idx = jnp.clip(t, 0, n_microbatches - 1)
                feed = jax.lax.dynamic_index_in_dim(xs_local, feed_idx, 0,
                                                    keepdims=False)
                inp = jnp.where(s == 0, feed, buf)
                # VALUE: the carried buffer (running stats compound across
                # microbatches). GRADIENT: entirely w.r.t. the original
                # params — carried deltas are stats-only (train-mode BN
                # outputs don't read them) and must not truncate the
                # per-tick param gradient paths.
                eff = flat0 + jax.lax.stop_gradient(flat - flat0)
                new_flat, out = jax.lax.switch(s, branches, eff, inp)
                # stage s processes REAL microbatch (t - s) at tick t; only
                # then commit its mutable-state writes (running stats) —
                # warm-up/drain ticks compute on garbage and must not
                proc = jnp.logical_and(t - s >= 0, t - s < n_microbatches)
                flat = jnp.where(proc, jax.lax.stop_gradient(new_flat), flat)
                out_idx = jnp.clip(t - last, 0, n_microbatches - 1)
                valid = jnp.logical_and(t - last >= 0, s == last)
                cur = jax.lax.dynamic_index_in_dim(ys, out_idx, 0,
                                                   keepdims=False)
                ys = jax.lax.dynamic_update_index_in_dim(
                    ys, jnp.where(valid, out, cur), out_idx, 0)
                buf = jax.lax.ppermute(out, axis, perm)
                return (buf, ys, flat), None

            (_, ys, flat), _ = jax.lax.scan(
                tick, (buf, ys, flat0), jnp.arange(ticks))
            ys = jax.lax.psum(
                jnp.where(s == last, ys, jnp.zeros_like(ys)), axis)
            if has_data:
                # with a data axis each replica saw its own batch shard;
                # average the running stats across replicas (SyncBN-style
                # EMA average; params are identical so this is a no-op on
                # them)
                flat = jax.lax.pmean(flat, "data")
            return ys, flat[None]

        y, new_flat = jax.shard_map(
            _local, mesh=mesh,
            in_specs=(state_spec, x_spec),
            out_specs=(x_spec, state_spec),
            check_vma=False,
        )(flat_params, xs)
        n_out = math.prod(self.out_shape)
        y = y.reshape(batch, self._amax)[:, :n_out].reshape(
            (batch,) + self.out_shape)
        if return_state:
            return y, new_flat
        return y
