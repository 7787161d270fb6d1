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
from typing import Iterable, Iterator, Optional, Sequence

import jax
import numpy as np

from .parallel.mesh import shard_batch

__all__ = ["prefetch_to_device", "augment_crop_flip", "NativeDataLoader"]


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       mesh=None, host_shards: bool = False) -> Iterator:
    """Asynchronously stage host batches onto the device(s).

    A background thread pulls from ``iterator``, transfers each pytree to
    the device (sharded over ``mesh``'s data axis when given), and keeps up
    to ``size`` batches in flight so host preprocessing and H2D transfer
    overlap with the training step.

    ``host_shards=True`` treats each process's batches as its own shard of
    a larger global batch (``shard_host_batch``) — the multi-host
    ``NativeDataLoader`` contract, where every host assembles
    ``global_batch / process_count`` rows. The default assumes identical
    batches on every process (single-host, or replicated synthetic data).
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def _put(batch):
        if mesh is not None:
            from .parallel.mesh import shard_host_batch
            fn = shard_host_batch if host_shards else shard_batch
            return fn(batch, mesh)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def _offer(item) -> bool:
        # bounded put that gives up when the consumer is gone — a plain
        # q.put would block forever if the generator is closed early
        # (break mid-epoch / exception in the train step), leaking the
        # thread AND pinning size+1 device-resident batches
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker():
        try:
            for batch in iterator:
                if not _offer(_put(batch)):
                    return
        except Exception as e:  # propagate into the consumer
            err.append(e)
        finally:
            _offer(sentinel)

    threading.Thread(target=_worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # release any queued device arrays immediately
            try:
                q.get_nowait()
            except queue.Empty:
                break


def _gather_crops(padded: np.ndarray, oy: np.ndarray, ox: np.ndarray,
                  h: int, w: int) -> np.ndarray:
    """Per-image crop gather via advanced indexing (one shot, no loop) —
    the shared core of :func:`augment_crop_flip` and the loader's numpy
    fallback."""
    n = padded.shape[0]
    rows = oy[:, None] + np.arange(h)[None, :]            # (n, h)
    cols = ox[:, None] + np.arange(w)[None, :]            # (n, w)
    return padded[np.arange(n)[:, None, None], rows[:, :, None],
                  cols[:, None, :], :]


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
    out = _gather_crops(padded, oy, ox, h, w)
    flips = rng.random(n) < 0.5
    out[flips] = out[flips, :, ::-1]
    return out


class NativeDataLoader:
    """Multi-core host data loader over an in-memory / mmapped uint8 store.

    The framework's torch-``DataLoader`` equivalent (reference
    examples/imagenet.py:279-297): per-epoch shuffling, multi-host sharding
    (``DistributedSampler`` semantics — disjoint round-robin slices of one
    seeded permutation), and a native batch-assembly stage
    (:func:`bnn_tpu.native.load_batch`) that gathers, augments (padded
    random crop + horizontal flip) and normalizes each batch with OpenMP
    across cores, GIL-free. Falls back to a vectorized numpy path when the
    native library is unavailable.

    Typical use::

        loader = NativeDataLoader(train_x_u8, train_y, batch_size=256,
                                  mean=(0.485, 0.456, 0.406),
                                  std=(0.229, 0.224, 0.225),
                                  pad=4, flip=True)
        for epoch in range(epochs):
            loader.set_epoch(epoch)          # reshuffle, like set_epoch()
            for x, y in prefetch_to_device(iter(loader), mesh=mesh):
                metrics = train_step(model, opt, x, y)

    Args:
        images: ``(N, H, W, C)`` uint8 (a ``np.load(..., mmap_mode='r')``
            array works — pages stream from disk on first touch).
        labels: ``(N,)`` integer labels, or None.
        batch_size: per-host batch size.
        shuffle: reshuffle each epoch with ``seed + epoch``.
        mean/std: per-channel normalization in [0, 1] units (torchvision
            convention); output is ``(u8/255 - mean) / std``.
        pad: padded-random-crop size (0 disables). ``pad_mode='zeros'``
            matches torchvision RandomCrop; ``'reflect'`` matches
            :func:`augment_crop_flip`.
        flip: random horizontal flip.
        drop_last: drop the trailing partial batch (keeps step shapes
            static — one XLA compilation for the whole epoch).
        process_index/process_count: multi-host shard (defaults to
            ``jax.process_index()/jax.process_count()``).
    """

    def __init__(self, images: np.ndarray, labels: Optional[np.ndarray],
                 batch_size: int, *, shuffle: bool = True,
                 mean: Sequence[float] = 0.0,
                 std: Sequence[float] = 1.0,
                 pad: int = 0, pad_mode: str = "zeros", flip: bool = False,
                 drop_last: bool = True, seed: int = 0,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 use_native: Optional[bool] = None):
        assert images.dtype == np.uint8 and images.ndim == 4, \
            "images must be (N, H, W, C) uint8"
        self.images = images
        self.labels = None if labels is None else np.ascontiguousarray(
            labels, np.int32)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.pad, self.pad_mode, self.flip = int(pad), pad_mode, bool(flip)
        self.drop_last = drop_last
        self.seed = int(seed)
        self.epoch = 0
        c = images.shape[-1]
        mean = np.broadcast_to(np.asarray(mean, np.float32), (c,))
        std = np.broadcast_to(np.asarray(std, np.float32), (c,))
        self.scale = np.ascontiguousarray(1.0 / (255.0 * std))
        self.bias = np.ascontiguousarray(-mean / std)
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        if use_native is None:
            from . import native
            use_native = native.loader_available()
        self.use_native = use_native

    def set_epoch(self, epoch: int) -> None:
        """Advance the shuffle/augmentation seed (DistributedSampler's
        ``set_epoch``, reference examples/imagenet.py:306)."""
        self.epoch = int(epoch)

    def _epoch_indices(self) -> np.ndarray:
        n = self.images.shape[0]
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        # round-robin host shard of the SAME permutation on every host
        return np.ascontiguousarray(
            idx[self.process_index::self.process_count], np.int64)

    def __len__(self) -> int:
        n = len(range(self.process_index, self.images.shape[0],
                      self.process_count))
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = self._epoch_indices()
        bs = self.batch_size
        end = len(idx) - (len(idx) % bs) if self.drop_last else len(idx)
        aug_seed = self.seed * 1_000_003 + self.epoch
        for lo in range(0, end, bs):
            sel = idx[lo:lo + bs]
            if self.use_native:
                from . import native
                yield native.load_batch(
                    self.images, sel, self.labels, self.scale, self.bias,
                    pad=self.pad, pad_mode=self.pad_mode, flip=self.flip,
                    seed=aug_seed)
            else:
                yield self._numpy_batch(sel, aug_seed)

    def _numpy_batch(self, sel: np.ndarray, aug_seed: int):
        """Vectorized numpy fallback (same transforms; RNG stream differs
        from the native path, both deterministic in (seed, epoch))."""
        x = self.images[sel].astype(np.float32) * self.scale + self.bias
        if self.pad > 0 or self.flip:
            rng = np.random.default_rng(aug_seed + int(sel[0]))
            if self.pad > 0:
                n, h, w, _ = x.shape
                mode = "reflect" if self.pad_mode == "reflect" else "constant"
                kw = {} if mode == "reflect" else \
                    {"constant_values": 0.0}
                # pad in normalized space with the u8-zero value bias
                pv = np.broadcast_to(self.bias, x.shape[-1:])
                padded = np.pad(
                    x - pv, ((0, 0), (self.pad,) * 2, (self.pad,) * 2,
                             (0, 0)), mode=mode, **kw) + pv
                oy = rng.integers(0, 2 * self.pad + 1, n)
                ox = rng.integers(0, 2 * self.pad + 1, n)
                x = _gather_crops(padded, oy, ox, h, w)
            if self.flip:
                flips = rng.random(x.shape[0]) < 0.5
                x[flips] = x[flips, :, ::-1]
        y = None if self.labels is None else self.labels[sel]
        return x, y
