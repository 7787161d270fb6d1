"""Tensor-parallel serving: bitpacked weights sharded over ICI.

The north-star serving topology (BASELINE.json:5): each chip holds 1/N of
every eligible layer's *packed* weights (out-channel shard of ``w_packed``
plus the matching ``scale``/``add`` epilogue slices), the forward runs under
``shard_map``, and each layer reassembles its full-channel output with a
tiled ``all_gather`` over the ``model`` axis. XLA's latency-hiding scheduler
overlaps those gathers with independent compute (the residual shortcut
branch, the next layer's sign/pack prologue); weights never exist whole on
any chip.

Contrast with ``Predictor(mesh=...)`` data-parallel serving, which
replicates weights and shards only the batch (serving.py); here HBM weight
bytes per chip drop by the model-axis size — the regime for models whose
packed weights outgrow one chip, or for latency-critical serving where N
chips' MXUs cooperate on one request.

The reference has no tensor parallelism of any kind (SURVEY.md §2.3 — its
scaling story is DataParallel/DDP, examples/imagenet.py:120-187).
"""
from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import jax
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..binarize import named_modules
from .deploy import DeployedConv, DeployedLinear

__all__ = ["tag_tensor_parallel", "tp_state_specs", "shard_tp_state"]

logger = logging.getLogger(__name__)

# leaf names holding out-channel-last arrays in a deployed layer
_TP_LEAVES = ("w_packed", "scale", "add")


def _tp_skip_reason(m, n: int) -> str:
    """'' when shardable over n chips, else why the layer stays replicated."""
    if isinstance(m, DeployedLinear):
        return ("" if m.out_features % n == 0
                else f"out_features {m.out_features} % {n} != 0")
    if isinstance(m, DeployedConv):
        # grouped convs would need group-aligned shards of BOTH operands;
        # out of scope (BATS groups are small layers anyway)
        if m.groups != 1:
            return f"grouped conv (groups={m.groups})"
        return ("" if m.out_channels % n == 0
                else f"out_channels {m.out_channels} % {n} != 0")
    return "not a deployed binary layer"


def tag_tensor_parallel(model: nnx.Module, mesh: Mesh,
                        axis: str = "model") -> List[str]:
    """Mark eligible deployed layers for sharded serving under ``shard_map``.

    Each tagged layer will treat its ``w_packed``/``scale``/``add`` as the
    local out-channel shard and all-gather its output over ``axis``.
    Returns the tagged module names. Layers whose out-channel count does
    not divide the axis (and grouped convs) stay replicated — the deployed
    model remains correct either way, but every skip is logged so the
    sharding story of a real pod deployment is auditable.
    """
    n = mesh.shape[axis]
    tagged, skipped = [], []
    for name, m in named_modules(model):
        if not isinstance(m, (DeployedConv, DeployedLinear)):
            continue
        reason = _tp_skip_reason(m, n)
        if not reason:
            m.tp_axis = axis
            tagged.append(name)
        else:
            skipped.append((name, reason))
            logger.warning(
                "tensor-parallel serving: layer %r stays REPLICATED (%s)",
                name, reason)
    logger.info("tensor-parallel serving: sharded %d/%d deployed layers "
                "over %d-way %r axis", len(tagged),
                len(tagged) + len(skipped), n, axis)
    return tagged


def tp_state_specs(model: nnx.Module, axis: str = "model"):
    """PartitionSpec pytree for ``nnx.state(model)`` after tagging.

    Tagged layers' ``w_packed``/``scale``/``add`` shard their LAST axis over
    ``axis`` (out-channels — packed K lanes stay local, matching
    ``parallel.mesh.DEFAULT_TP_RULES``); every other leaf is replicated.
    Feed the result to ``shard_map``'s ``in_specs`` and to
    :func:`shard_tp_state`.
    """
    sharded: Dict[Tuple[str, str], bool] = {}
    for name, m in named_modules(model):
        if getattr(m, "tp_axis", None) == axis:
            for leaf in _TP_LEAVES:
                sharded[(name, leaf)] = True

    state = nnx.state(model)

    def _key_str(k) -> str:
        return str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))

    def _spec(path, x):
        parts = [_key_str(p) for p in path]
        if parts and parts[-1] == "value":
            parts.pop()
        if parts and (".".join(parts[:-1]), parts[-1]) in sharded:
            return P(*([None] * (x.ndim - 1) + [axis]))
        return P()

    return jax.tree_util.tree_map_with_path(_spec, state)


def shard_tp_state(state, specs, mesh: Mesh):
    """Place a state pytree on the mesh per its spec pytree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
