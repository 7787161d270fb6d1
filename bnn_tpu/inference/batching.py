"""Continuous batching: coalesce request streams into compiled batches.

The north-star serving shape (BASELINE.json: "continuous batching of
image streams across hosts") needs a front-end between arriving
requests and the fixed-batch compiled predictor: individual requests
(one image, or a few rows) are queued, a dispatcher thread coalesces
whatever is waiting — up to the predictor's compiled batch size, or
until ``max_delay`` expires for the oldest request — dispatches ONE
fixed-shape call, and fans the output rows back to per-request futures.

TPU-first reasoning behind the design:

- **One compiled shape.** Everything funnels into ``predictor`` calls at
  its fixed ``batch_size`` (the Predictor pads internally), so the whole
  stream runs one cached XLA program — no recompiles, no shape zoo.
  Bucketing by size is unnecessary on TPU: padding rows through the
  int8/bitpacked pipeline costs ~nothing next to a recompile.
- **Single dispatcher thread.** All jax dispatch happens on one thread;
  callers only build numpy/jax arrays and wait on futures, so the
  server composes with any frontend (HTTP worker pools, grpc executors)
  without touching jax's thread-safety rules.
- **Latency/throughput knob in one place.** ``max_delay`` bounds how
  long the oldest request waits for co-riders; at high offered load the
  delay never triggers (batches fill), at low load it caps added
  latency.
- **Across chips/hosts**: hand in a mesh-sharded ``Predictor``
  (``mesh=make_mesh(data=N)`` or ``tensor_parallel=True``) and the
  coalesced batch is batch-sharded / weight-sharded over the mesh by
  the predictor itself; one coalescer runs per host process in a
  ``jax.distributed`` launch (each host feeds its local request
  stream, exactly like the training-side per-host data contract).

The reference has no serving layer at all (its README stops at
"deployment ... in the future" — reference README.md:20-24); this module
is part of the execution engine this framework adds on top of parity.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional

import numpy as np

__all__ = ["ContinuousBatcher", "BatcherStats"]


@dataclass
class _Request:
    x: Any                      # (n, *feature_dims) array
    rows: int
    future: Future
    t_enqueue: float


LATENCY_WINDOW = 65536  # most-recent requests kept for percentiles


@dataclass
class BatcherStats:
    """Cumulative serving statistics (see :meth:`ContinuousBatcher.stats`).

    Counters are cumulative; ``latencies_ms`` is a sliding window of the
    most recent ``LATENCY_WINDOW`` request latencies (a long-lived server
    would otherwise grow the list without bound — percentiles are about
    current behavior anyway)."""
    requests: int = 0
    rows: int = 0
    batches: int = 0
    max_batch_rows: int = 0
    latencies_ms: Any = field(
        default_factory=lambda: deque(maxlen=LATENCY_WINDOW))

    @property
    def mean_occupancy(self) -> float:
        """Mean fraction of the compiled batch filled with real rows."""
        if not self.batches or not self.max_batch_rows:
            return 0.0
        return self.rows / (self.batches * self.max_batch_rows)

    def latency_percentile(self, p: float) -> float:
        """p-th percentile request latency (enqueue -> result), ms."""
        if not self.latencies_ms:
            return 0.0
        return float(np.percentile(np.asarray(list(self.latencies_ms)), p))


class ContinuousBatcher:
    """Queue + dispatcher turning a request stream into batched calls.

    ``predictor`` is typically :class:`bnn_tpu.inference.Predictor` (its
    ``batch_size`` is the coalescing target) but any ``fn(x) -> y`` that
    maps row ``i`` of ``x`` to row ``i`` of ``y`` works — including a
    bundle loaded with :func:`bnn_tpu.inference.load_serving` (pass
    ``max_batch`` explicitly for plain callables).

    Usage::

        server = ContinuousBatcher(predictor, max_delay_ms=2.0)
        fut = server.submit(image[None])    # non-blocking, returns Future
        logits = fut.result()
        ...
        server.close()
    """

    def __init__(self, predictor: Callable, *,
                 max_batch: Optional[int] = None,
                 max_delay_ms: float = 2.0,
                 max_queue: int = 1024):
        if max_batch is None:
            max_batch = getattr(predictor, "batch_size", None)
        if not max_batch or max_batch < 1:
            raise ValueError(
                "max_batch must be provided (or predictor.batch_size set)")
        self._predictor = predictor
        self.max_batch = int(max_batch)
        self.max_delay = max_delay_ms / 1e3
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue(
            maxsize=max_queue)
        self._stats = BatcherStats(max_batch_rows=self.max_batch)
        self._stats_lock = threading.Lock()
        self._closed = False
        # guards the closed-check + enqueue pair in submit() against a
        # concurrent close(): without it a request can land BEHIND the
        # shutdown sentinel and hang forever
        self._submit_lock = threading.Lock()
        self._feature_shape: Optional[tuple] = None
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="bnn-batcher", daemon=True)
        self._thread.start()

    # -- client side ---------------------------------------------------------

    def submit(self, x) -> Future:
        """Enqueue one request; returns a Future resolving to its rows.

        ``x`` is a batch ``(n, *feature_dims)`` with an explicit leading
        batch dim (use :meth:`predict_one` for bare single examples); the
        future resolves to the matching ``(n, classes)`` rows. Raises
        ``ValueError`` on a rank/feature-shape mismatch with earlier
        requests (all riders of one stream must coalesce into one
        array), ``queue.Full`` when ``max_queue`` requests are already
        waiting (backpressure — callers should shed or retry), and
        ``RuntimeError`` after :meth:`close`.
        """
        x = np.asarray(x)
        if x.ndim < 1 or x.shape[0] < 1:
            raise ValueError(
                f"submit() needs (n, *feature_dims) with n >= 1, got "
                f"shape {x.shape}; use predict_one() for bare examples")
        rows = x.shape[0]
        fut: Future = Future()
        req = _Request(x=x, rows=rows, future=fut, t_enqueue=time.monotonic())
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("ContinuousBatcher is closed")
            # reject mismatched feature shapes HERE, in the client
            # thread — a bad np.concatenate in the dispatcher would
            # otherwise take the whole server down
            if self._feature_shape is None:
                self._feature_shape = x.shape[1:]
            elif x.shape[1:] != self._feature_shape:
                raise ValueError(
                    f"request feature shape {x.shape[1:]} != stream's "
                    f"{self._feature_shape}")
            self._queue.put_nowait(req)
        return fut

    def predict(self, x):
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(x).result()

    def predict_one(self, x):
        """Blocking single-example predict: ``(*feature_dims)`` in,
        ``(classes,)`` out."""
        return self.submit(np.asarray(x)[None]).result()[0]

    def stats(self) -> BatcherStats:
        with self._stats_lock:
            return BatcherStats(
                requests=self._stats.requests,
                rows=self._stats.rows,
                batches=self._stats.batches,
                max_batch_rows=self._stats.max_batch_rows,
                latencies_ms=list(self._stats.latencies_ms),
            )

    def close(self, *, drain: bool = True) -> None:
        """Stop accepting requests; finish (``drain=True``) or fail
        (``drain=False``) whatever is queued; join the dispatcher."""
        with self._submit_lock:  # no submit can interleave past here
            if self._closed:
                return
            self._closed = True
            if not drain:
                try:
                    while True:
                        req = self._queue.get_nowait()
                        if req is not None:
                            self._fail_future(req.future, RuntimeError(
                                "ContinuousBatcher closed"))
                except queue.Empty:
                    pass
            # sentinel wakes + stops the dispatcher; put() (blocking)
            # is safe: submits are locked out, so at most the dispatcher
            # is draining the queue, freeing a slot
            self._queue.put(None)
        self._thread.join(timeout=60.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatcher side -----------------------------------------------------

    def _collect(self, seed: Optional[_Request] = None
                 ) -> Optional[List[_Request]]:
        """Block for the first request (or start from a held ``seed``),
        then coalesce co-riders until the batch is full or the oldest
        request's delay budget expires."""
        first = seed if seed is not None else self._queue.get()
        if first is None:
            return None
        batch = [first]
        rows = first.rows
        deadline = first.t_enqueue + self.max_delay
        while rows < self.max_batch:
            timeout = deadline - time.monotonic()
            try:
                nxt = self._queue.get(
                    timeout=max(timeout, 0.0) if timeout > 0 else None,
                    block=timeout > 0)
            except queue.Empty:
                break
            if nxt is None:  # close() sentinel: dispatch what we have,
                self._queue.put(None)   # then stop on the next round
                break
            if rows + nxt.rows > self.max_batch:
                # doesn't fit: hold it for the next round rather than
                # splitting a request across two compiled calls
                self._requeue_front(nxt)
                break
            batch.append(nxt)
            rows += nxt.rows
        return batch

    def _requeue_front(self, req: _Request) -> None:
        # queue.Queue has no push-front; a one-slot hold keeps FIFO order
        # (only the dispatcher thread touches it)
        assert getattr(self, "_held", None) is None
        self._held = req

    @staticmethod
    def _fail_future(fut: Future, exc: Exception) -> None:
        try:
            fut.set_exception(exc)
        except Exception:  # already cancelled/resolved by the client
            pass

    def _dispatch_loop(self) -> None:
        while True:
            held = getattr(self, "_held", None)
            if held is not None:
                self._held = None
            batch = self._collect(held)
            if batch is None:
                return
            # clients may have cancelled while waiting; a cancelled
            # Future rejects set_result (InvalidStateError) — claim each
            # rider first and drop the cancelled ones from the batch
            batch = [r for r in batch
                     if r.future.set_running_or_notify_cancel()]
            if not batch:
                continue
            # EVERYTHING below is guarded: an escaped exception would
            # kill the dispatcher thread and hang every future forever
            try:
                x = np.concatenate([r.x for r in batch], axis=0) \
                    if len(batch) > 1 else batch[0].x
                y = np.asarray(self._predictor(x))
                now = time.monotonic()
                off = 0
                for r in batch:
                    r.future.set_result(y[off:off + r.rows])
                    off += r.rows
            except Exception as e:  # propagate to every rider, keep serving
                for r in batch:
                    self._fail_future(r.future, e)
                continue
            with self._stats_lock:
                self._stats.requests += len(batch)
                self._stats.rows += off
                self._stats.batches += 1
                self._stats.latencies_ms.extend(
                    (now - r.t_enqueue) * 1e3 for r in batch)
