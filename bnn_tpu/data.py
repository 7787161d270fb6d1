"""Input-pipeline utilities.

The reference leans on torch's multi-worker ``DataLoader`` (its native C++
machinery) for host-side batching (examples/imagenet.py:279-297). The
TPU-native equivalent concerns are (a) overlapping host preprocessing with
device compute and (b) sharding each batch across the mesh before the step
runs; both are covered here.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import numpy as np

from .parallel.mesh import shard_batch

__all__ = ["prefetch_to_device", "augment_crop_flip"]


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       mesh=None) -> Iterator:
    """Asynchronously stage host batches onto the device(s).

    A background thread pulls from ``iterator``, transfers each pytree to
    the device (sharded over ``mesh``'s data axis when given), and keeps up
    to ``size`` batches in flight so host preprocessing and H2D transfer
    overlap with the training step.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def _put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def _worker():
        try:
            for batch in iterator:
                q.put(_put(batch))
        except Exception as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=_worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def augment_crop_flip(x: np.ndarray, rng: np.random.Generator,
                      pad: int = 4) -> np.ndarray:
    """Vectorized random crop (reflect pad) + horizontal flip for NHWC
    uint8/float batches — the reference's CIFAR transforms
    (examples/cifar10.py:36-44) without a per-image Python loop."""
    n, h, w, c = x.shape
    padded = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode="reflect")
    oy = rng.integers(0, 2 * pad + 1, n)
    ox = rng.integers(0, 2 * pad + 1, n)
    # gather crops with advanced indexing (one shot, no loop)
    rows = oy[:, None] + np.arange(h)[None, :]            # (n, h)
    cols = ox[:, None] + np.arange(w)[None, :]            # (n, w)
    out = padded[np.arange(n)[:, None, None], rows[:, :, None],
                 cols[:, None, :], :]
    flips = rng.random(n) < 0.5
    out[flips] = out[flips, :, ::-1]
    return out
