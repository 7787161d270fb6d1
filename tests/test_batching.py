"""Continuous batching front-end (bnn_tpu/inference/batching.py).

The north-star serving shape coalesces image streams into the fixed
compiled batch (BASELINE.json "continuous batching of image streams");
these tests drive it over a real deployed binary model on CPU and over
plain callables for the protocol edge cases (errors, backpressure,
held oversized requests, shutdown).
"""
import queue
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.inference import ContinuousBatcher, Predictor
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)

BC = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def make_predictor(batch_size=8):
    rngs = nnx.Rngs(0)
    net = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1, rngs=rngs),
        nn.BatchNorm2d(8, rngs=rngs),
        nn.ReLU(),
        nn.Conv2d(8, 8, 3, padding=1, rngs=rngs),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(8, 4, rngs=rngs),
    )
    net = prepare_binary_model(net, bconfig=BC,
                               ignore_layers_name=["_first_", "_last_"])
    net.eval()
    return Predictor(net, batch_size=batch_size, use_pallas=False,
                     fuse=False, space_to_depth=False, dtype=None)


class TestAgainstPredictor:
    def test_results_match_direct_calls(self):
        """Rows coalesced across requests must equal the direct
        per-request predictor outputs (same compiled program, same
        padding discipline)."""
        pred = make_predictor(batch_size=8)
        rng = np.random.RandomState(0)
        reqs = [rng.randn(n, 8, 8, 3).astype(np.float32)
                for n in (1, 3, 1, 2, 5, 8, 1)]
        with ContinuousBatcher(pred, max_delay_ms=20.0) as srv:
            futs = [srv.submit(r) for r in reqs]
            outs = [f.result(timeout=120) for f in futs]
        for r, o in zip(reqs, outs):
            np.testing.assert_allclose(
                o, np.asarray(pred(r)), rtol=0, atol=1e-5)
            assert o.shape == (r.shape[0], 4)

    def test_coalescing_batches_requests(self):
        """Requests submitted together ride one compiled call (batches <
        requests) and occupancy reflects real rows."""
        pred = make_predictor(batch_size=8)
        rng = np.random.RandomState(1)
        with ContinuousBatcher(pred, max_delay_ms=200.0) as srv:
            futs = [srv.submit(rng.randn(2, 8, 8, 3).astype(np.float32))
                    for _ in range(8)]  # 16 rows -> >= 2 batches of 8
            for f in futs:
                f.result(timeout=120)
            st = srv.stats()
        assert st.requests == 8 and st.rows == 16
        assert st.batches < st.requests, st
        assert 0 < st.mean_occupancy <= 1.0
        assert st.latency_percentile(99) > 0

    def test_single_request_flushes_on_delay(self):
        """A lone request must not wait forever for co-riders."""
        pred = make_predictor(batch_size=8)
        with ContinuousBatcher(pred, max_delay_ms=5.0) as srv:
            out = srv.predict_one(np.zeros((8, 8, 3), np.float32))
        assert out.shape == (4,)


class TestOverMeshPredictor:
    def test_batcher_over_dp_mesh_predictor(self):
        """The coalesced batch is mesh-sharded by the predictor itself:
        a data-parallel Predictor on the virtual mesh serves the stream
        with identical results to its own direct calls (the "across
        chips/hosts" composition — one batcher per host process)."""
        import jax

        from bnn_tpu.parallel import make_mesh

        if len(jax.devices()) < 2:
            import pytest as _pytest
            _pytest.skip("needs the virtual multi-device mesh")
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            nn.Conv2d(3, 8, 3, padding=1, rngs=rngs),
            nn.ReLU(),
            nn.AdaptiveAvgPool2d(1),
            nn.Flatten(),
            nn.Linear(8, 4, rngs=rngs),
        )
        net = prepare_binary_model(net, bconfig=BC,
                                   ignore_layers_name=["_first_", "_last_"])
        net.eval()
        pred = Predictor(net, batch_size=8,
                         mesh=make_mesh(data=2,
                                        devices=jax.devices()[:2]),
                         use_pallas=False, fuse=False,
                         space_to_depth=False, dtype=None)
        rng = np.random.RandomState(3)
        reqs = [rng.randn(n, 8, 8, 3).astype(np.float32)
                for n in (1, 3, 2, 1, 1)]
        with ContinuousBatcher(pred, max_delay_ms=20.0) as srv:
            outs = [f.result(timeout=120)
                    for f in [srv.submit(r) for r in reqs]]
        for r, o in zip(reqs, outs):
            np.testing.assert_allclose(
                o, np.asarray(pred(r)), rtol=0, atol=1e-5)


class TestOverExportedBundle:
    def test_batcher_serves_a_loaded_bundle(self, tmp_path):
        """The coalescer composes with an exported serving bundle: the
        loaded server exposes batch_size, so requests stream through the
        frozen StableHLO program with no model code."""
        from bnn_tpu.inference import load_serving

        pred = make_predictor(batch_size=4)
        pred.export(str(tmp_path / "bundle"), input_shape=(8, 8, 3))
        server = load_serving(str(tmp_path / "bundle"))
        rng = np.random.RandomState(2)
        reqs = [rng.randn(n, 8, 8, 3).astype(np.float32) for n in (1, 2, 1)]
        with ContinuousBatcher(server, max_delay_ms=20.0) as srv:
            outs = [f.result(timeout=120)
                    for f in [srv.submit(r) for r in reqs]]
        for r, o in zip(reqs, outs):
            np.testing.assert_allclose(
                o, np.asarray(pred(r)), rtol=0, atol=1e-5)


class _CountingModel:
    """Callable predictor stub recording the batch shapes it sees."""

    def __init__(self, delay=0.0):
        self.calls = []
        self.delay = delay

    def __call__(self, x):
        self.calls.append(x.shape[0])
        if self.delay:
            time.sleep(self.delay)
        return x.sum(axis=tuple(range(1, x.ndim))) if x.ndim > 1 else x


class TestProtocol:
    def test_oversized_corider_is_held_not_split(self):
        """A request that does not fit the current batch dispatches whole
        in the next one — never split across two compiled calls."""
        m = _CountingModel(delay=0.05)
        with ContinuousBatcher(m, max_batch=4, max_delay_ms=100.0) as srv:
            f1 = srv.submit(np.ones((3, 2)))   # fills 3/4
            time.sleep(0.01)                   # let the dispatcher seed
            f2 = srv.submit(np.ones((2, 2)))   # doesn't fit -> held
            assert f1.result(timeout=30).shape == (3,)
            assert f2.result(timeout=30).shape == (2,)
        assert m.calls == [3, 2], m.calls

    def test_error_propagates_and_server_survives(self):
        calls = {"n": 0}

        def flaky(x):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("boom")
            return x

        with ContinuousBatcher(flaky, max_batch=4, max_delay_ms=5.0) as srv:
            bad = srv.submit(np.ones((1, 2)))
            with pytest.raises(ValueError, match="boom"):
                bad.result(timeout=30)
            ok = srv.submit(np.ones((1, 2)))
            np.testing.assert_array_equal(ok.result(timeout=30),
                                          np.ones((1, 2)))

    def test_backpressure_raises_queue_full(self):
        m = _CountingModel(delay=0.5)  # slow: queue backs up
        srv = ContinuousBatcher(m, max_batch=1, max_delay_ms=1.0,
                                max_queue=2)
        try:
            with pytest.raises(queue.Full):
                for _ in range(16):
                    srv.submit(np.ones((1, 2)))
        finally:
            srv.close()

    def test_close_drains_then_rejects(self):
        m = _CountingModel()
        srv = ContinuousBatcher(m, max_batch=4, max_delay_ms=1.0)
        futs = [srv.submit(np.ones((1, 2))) for _ in range(5)]
        srv.close()
        for f in futs:
            assert f.result(timeout=30) is not None
        with pytest.raises(RuntimeError):
            srv.submit(np.ones((1, 2)))

    def test_requires_max_batch_for_plain_callables(self):
        with pytest.raises(ValueError):
            ContinuousBatcher(lambda x: x)

    def test_mismatched_feature_shape_rejected_in_client(self):
        """Shape mismatches must fail the SUBMITTING caller, not reach
        the dispatcher (a bad np.concatenate there would take the whole
        server down and hang every pending future)."""
        m = _CountingModel(delay=0.05)
        with ContinuousBatcher(m, max_batch=8, max_delay_ms=50.0) as srv:
            ok = srv.submit(np.ones((2, 8, 8, 3)))
            with pytest.raises(ValueError, match="feature shape"):
                srv.submit(np.ones((1, 4, 4, 3)))
            with pytest.raises(ValueError, match="predict_one"):
                srv.submit(np.ones(()))  # scalar: no batch dim
            assert ok.result(timeout=30).shape == (2,)
            # the server is still alive for well-shaped requests
            assert srv.submit(np.ones((1, 8, 8, 3))).result(
                timeout=30).shape == (1,)

    def test_cancelled_future_does_not_kill_dispatcher(self):
        """A client that times out and cancels its Future must not crash
        the dispatcher (set_result on a cancelled future raises
        InvalidStateError) — co-riders and later requests still serve."""
        m = _CountingModel(delay=0.2)
        with ContinuousBatcher(m, max_batch=4, max_delay_ms=1.0) as srv:
            doomed = srv.submit(np.ones((1, 2)))
            time.sleep(0.02)  # let the dispatcher pick it up or not —
            doomed.cancel()   # either way the cancel must be survivable
            ok = srv.submit(np.ones((1, 2)))
            np.testing.assert_array_equal(ok.result(timeout=30),
                                          np.asarray([2.0]))

    def test_latency_window_is_bounded(self):
        from bnn_tpu.inference.batching import LATENCY_WINDOW

        m = _CountingModel()
        with ContinuousBatcher(m, max_batch=64, max_delay_ms=0.5) as srv:
            for _ in range(50):
                srv.submit(np.ones((1, 2))).result(timeout=30)
            st = srv.stats()
        assert len(st.latencies_ms) <= LATENCY_WINDOW
        assert st.requests == 50

    def test_concurrent_submitters(self):
        """Many client threads, one dispatcher: results stay per-request
        correct (each future gets ITS rows back)."""
        m = _CountingModel()
        outs = {}

        def client(i, srv):
            x = np.full((2, 3), float(i))
            outs[i] = srv.submit(x).result(timeout=60)

        with ContinuousBatcher(m, max_batch=8, max_delay_ms=5.0) as srv:
            ts = [threading.Thread(target=client, args=(i, srv))
                  for i in range(12)]
            [t.start() for t in ts]
            [t.join() for t in ts]
        for i, o in outs.items():
            np.testing.assert_array_equal(o, np.full((2,), 3.0 * i))
