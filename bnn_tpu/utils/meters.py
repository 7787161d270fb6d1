"""Training metrics utilities (reference: examples/utils.py:6-60)."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx


class AverageMeter:
    """Computes and stores the average and current value
    (reference: examples/utils.py:6-27)."""

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1) -> None:
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self) -> str:
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    """Prints a batch-progress line from a list of meters
    (reference: examples/utils.py:30-44)."""

    def __init__(self, num_batches: int, meters: Sequence[AverageMeter],
                 prefix: str = ""):
        num_digits = len(str(num_batches // 1))
        self.batch_fmtstr = "[{:" + str(num_digits) + "d}/" + str(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int) -> None:
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(meter) for meter in self.meters]
        print("\t".join(entries))


def accuracy(output: jax.Array, target: jax.Array,
             topk: Tuple[int, ...] = (1,)) -> list:
    """Top-k accuracy in percent (reference: examples/utils.py:46-60)."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(output, maxk)
    correct = pred == target[:, None]
    res = []
    for k in topk:
        correct_k = jnp.sum(correct[:, :k].astype(jnp.float32))
        res.append(float(correct_k * 100.0 / target.shape[0]))
    return res


def count_parameters(model: nnx.Module) -> int:
    """Number of trainable parameters (reference: examples/utils.py:70-71)."""
    params = nnx.state(model, nnx.Param)
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
