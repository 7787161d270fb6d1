"""Training metrics utilities (capability of reference examples/utils.py)."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx


class AverageMeter:
    """Streaming mean of a scalar metric.

    Tracks the last value and a weighted running sum; ``avg`` is derived on
    access. ``str()`` renders "name last (mean)" with the given format spec
    (the display contract of reference examples/utils.py:6-27).
    """

    __slots__ = ("name", "fmt", "val", "sum", "count")

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1) -> None:
        self.val = float(val)
        self.sum += self.val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0

    def __str__(self) -> str:
        spec = self.fmt.lstrip(":")
        return (f"{self.name} {format(self.val, spec)}"
                f" ({format(self.avg, spec)})")


class ProgressMeter:
    """Renders one tab-joined progress line per displayed batch from a set
    of meters (display contract of reference examples/utils.py:30-44)."""

    def __init__(self, num_batches: int, meters: Sequence[AverageMeter],
                 prefix: str = ""):
        self._width = len(str(num_batches))
        self._total = num_batches
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int) -> None:
        head = f"{self.prefix}[{batch:{self._width}d}/{self._total}]"
        print("\t".join([head, *map(str, self.meters)]))


def accuracy(output: jax.Array, target: jax.Array,
             topk: Tuple[int, ...] = (1,)) -> list:
    """Top-k accuracy in percent for each k (capability of reference
    examples/utils.py:46-60), computed in one top-k pass: a cumulative sum
    over the ranked-hit mask gives hits-within-top-k for every k at once."""
    # clamp k to the class count (same guard as make_eval_step): the
    # reference's topk=(1, 5) call on a 2-class head must not crash
    maxk = min(max(topk), output.shape[-1])
    ranked_hit = jax.lax.top_k(output, maxk)[1] == target[:, None]
    pct_within = jnp.cumsum(ranked_hit, axis=1).mean(axis=0) * 100.0
    return [float(pct_within[min(k, maxk) - 1]) for k in topk]


def count_parameters(model: nnx.Module) -> int:
    """Total trainable parameter count (reference examples/utils.py:70-71)."""
    leaves = jax.tree_util.tree_leaves(nnx.state(model, nnx.Param))
    return sum(leaf.size for leaf in leaves)
