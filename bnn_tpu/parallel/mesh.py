"""Device meshes and sharding rules.

TPU-native scaling layer. The reference scales with ``nn.DataParallel`` /
DDP + NCCL (examples/imagenet.py:120-187); here the same capability (and
more — the reference has no tensor parallelism at all, SURVEY.md §2.3) is a
``jax.sharding.Mesh`` plus ``NamedSharding`` annotations: XLA's GSPMD
partitioner inserts the gradient ``psum`` (DDP's allreduce) and weight-shard
``all-gather`` collectives over ICI/DCN automatically.

Axes convention:
- ``data``: batch axis (data parallelism; gradients psum over it)
- ``model``: output-channel axis of kernels / packed weights (tensor
  parallelism; the north-star "bitpacked weights tensor-sharded over ICI")
"""
from __future__ import annotations

import re

from flax import nnx
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_host_batch", "replicate",
           "shard_state", "shard_model", "shard_optimizer_zero1",
           "DEFAULT_TP_RULES"]


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data=None`` uses all remaining devices on the data axis. On multi-host
    systems call ``jax.distributed.initialize()`` first; ``jax.devices()``
    then spans all hosts and the mesh lays the data axis across DCN and the
    model axis within a slice (ICI) by construction order.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Place a batch (pytree of arrays, leading batch dim) on the data axis.

    Multi-host contract: every process must hold the SAME global batch
    (``jax.device_put`` keeps only the rows its devices own). When each
    host assembled only its own shard, use :func:`shard_host_batch`.
    """
    def _shard(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(_shard, batch)


def shard_host_batch(batch, mesh: Mesh):
    """Assemble a GLOBAL batch from per-process local shards.

    Each process passes its own ``global_batch / process_count`` rows
    (e.g. a ``NativeDataLoader`` host shard); the returned arrays are
    global, data-axis-sharded, with every row used exactly once. On a
    single process this is identical to :func:`shard_batch`.
    """

    def _shard(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        s = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        return jax.make_array_from_process_local_data(s, np.asarray(x))
    return jax.tree_util.tree_map(_shard, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    def _rep(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(_rep, tree)


# Tensor-parallel rules: dotted-path regex -> PartitionSpec factory taking the
# array rank. Kernels are out-channel-last in this framework, so TP shards the
# LAST axis; the bitpacked inference weights (``w_packed`` (Kw, N)) shard the
# same way — packed lanes stay local, out-channels split over ICI.
DEFAULT_TP_RULES: Tuple[Tuple[str, object], ...] = (
    (r"\bkernel$", lambda ndim: P(*([None] * (ndim - 1) + ["model"]))),
    (r"\bw_packed$", lambda ndim: P(*([None] * (ndim - 1) + ["model"]))),
    (r"\bbias$", lambda ndim: P("model")),
    (r"\bscale$", lambda ndim: P("model")),
    (r"\badd$", lambda ndim: P("model")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))
        parts.append(str(key))
    # nnx state leaves live under the Variable's `.value`; rules address the
    # variable name itself
    if parts and parts[-1] == "value":
        parts.pop()
    return ".".join(parts)


def shard_state(state, mesh: Mesh, rules=DEFAULT_TP_RULES, min_size: int = 1024):
    """Apply tensor-parallel sharding rules to an nnx state pytree.

    Arrays whose path matches a rule (and whose sharded axes divide
    evenly over the mesh axes the rule's spec names) get the rule's
    spec; everything else is replicated. Shardings are NamedShardings so
    the same state drives ``jit``'s ``in_shardings`` directly.
    """

    def _axis_size(axis_name):
        # a spec entry may name one mesh axis or a tuple of them
        names = axis_name if isinstance(axis_name, tuple) else (axis_name,)
        size = 1
        for n in names:
            size *= mesh.shape.get(n, 1)
        return size

    def _assign(path, x):
        if not hasattr(x, "ndim"):
            return x
        name = _path_str(path)
        if x.size >= min_size:
            for pat, spec_fn in rules:
                if re.search(pat, name):
                    spec = spec_fn(x.ndim)
                    # gate + divisibility per the axes THIS spec names
                    # (hardcoding 'model' here silently no-opped custom
                    # rules over other axes, e.g. FSDP-style 'data')
                    sizes = [(_axis_size(a), axis)
                             for axis, a in enumerate(spec)
                             if a is not None]
                    ok = any(s > 1 for s, _ in sizes) and all(
                        x.shape[axis] % s == 0 for s, axis in sizes)
                    if ok:
                        return jax.device_put(x, NamedSharding(mesh, spec))
                    break
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(_assign, state)


def shard_optimizer_zero1(optimizer, mesh: Mesh, axis: str = "data",
                          min_size: int = 1024):
    """ZeRO-1 optimizer-state sharding over the data axis.

    The reference has no ZeRO/FSDP of any kind (SURVEY.md §2.3). Here the
    optimizer moments (``opt_state`` subtree: Adam ``mu``/``nu`` etc.) are
    sharded over ``axis`` along the largest dimension that divides evenly
    (conv-kernel moments lead with kernel height, so axis 0 alone would
    rarely qualify); params and gradients stay replicated (gradients are
    already psum'd by GSPMD), so for every moment array with a divisible
    dimension the update runs ``1/axis_size`` of the elementwise FLOPs per
    device and stores ``1/axis_size`` of that moment's HBM, at the cost of
    one all-gather of the parameter update — ZeRO stage 1. Moments with no
    divisible dimension (and anything below ``min_size``) are left on their
    existing sharding. XLA inserts the collectives from the shardings; no
    manual reduce-scatter is written.

    Leaves that don't match (params, non-moment state) keep whatever
    sharding they already have, so this composes with a prior
    :func:`shard_model` tensor-parallel pass.

    Mutates ``optimizer`` in place and returns it.
    """
    n = mesh.shape[axis]

    def _assign(path, x):
        if not hasattr(x, "ndim"):
            return x
        name = _path_str(path)
        if n > 1 and "opt_state" in name and x.ndim >= 1 and x.size >= min_size:
            # compose with any existing (tensor-parallel) sharding: keep its
            # spec and add ``axis`` on a still-unsharded dim
            spec = [None] * x.ndim
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh.shape == mesh.shape:
                for d, entry in enumerate(sh.spec):
                    spec[d] = entry
            if axis in spec:
                return x
            # shard the largest evenly-divisible free dim, preferring later
            # axes on ties (out-channel-last kernels put the big dim last)
            best = None
            for d in range(x.ndim):
                if spec[d] is None and x.shape[d] % n == 0 and (
                        best is None or x.shape[d] >= x.shape[best]):
                    best = d
            if best is not None:
                spec[best] = axis
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return x

    state = nnx.state(optimizer)
    nnx.update(optimizer, jax.tree_util.tree_map_with_path(_assign, state))
    return optimizer


def shard_model(obj, mesh: Mesh, rules=DEFAULT_TP_RULES, min_size: int = 1024):
    """Commit an nnx object's (model or optimizer) state arrays to the mesh.

    With ``model`` axis size 1 this replicates everything (pure data
    parallelism); otherwise tensor-parallel rules apply. Mutates ``obj`` in
    place and returns it.
    """
    state = nnx.state(obj)
    state = shard_state(state, mesh, rules=rules, min_size=min_size)
    nnx.update(obj, state)
    return obj
