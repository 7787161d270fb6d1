"""Input-pipeline utility tests."""
import jax
import jax.numpy as jnp
import numpy as np

from bnn_tpu.data import augment_crop_flip, prefetch_to_device
from bnn_tpu.parallel import make_mesh
from bnn_tpu.utils import compiled_stats


def test_augment_shapes_and_content():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    out = augment_crop_flip(x, np.random.default_rng(1))
    assert out.shape == x.shape
    # values are drawn from the reflect-padded input
    assert np.isfinite(out).all()
    # with a fixed rng, deterministic
    out2 = augment_crop_flip(x, np.random.default_rng(1))
    np.testing.assert_array_equal(out, out2)


def test_augment_identity_crop_exists():
    # pad=0 means crop offset 0 and only flips can change content
    x = np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1)
    out = augment_crop_flip(x, np.random.default_rng(0), pad=0)
    for i in range(2):
        assert (np.array_equal(out[i], x[i])
                or np.array_equal(out[i], x[i, :, ::-1]))


def test_prefetch_to_device():
    def gen():
        for i in range(5):
            yield (np.full((4, 3), i, np.float32), np.full((4,), i, np.int32))

    batches = list(prefetch_to_device(gen(), size=2))
    assert len(batches) == 5
    for i, (x, y) in enumerate(batches):
        assert isinstance(x, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), i)


def test_prefetch_with_mesh():
    mesh = make_mesh()
    def gen():
        yield np.ones((16, 3), np.float32)
    (batch,) = list(prefetch_to_device(gen(), mesh=mesh))
    assert batch.sharding.spec[0] == "data"


def test_prefetch_early_exit_stops_worker():
    """Breaking out of the consumer (or an exception in the train step)
    must stop the background thread — a blocked q.put would leak the
    thread and pin size+1 device batches for the process lifetime."""
    import threading
    import time

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield np.full((2,), i, np.float32)

    before = threading.active_count()
    it = prefetch_to_device(gen(), size=2)
    next(it)
    it.close()  # what a `break` in a for-loop does
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"
    assert len(produced) < 100  # the source iterator stopped being drained


def test_prefetch_propagates_errors():
    def gen():
        yield np.ones((2,), np.float32)
        raise RuntimeError("loader broke")
    import pytest
    with pytest.raises(RuntimeError, match="loader broke"):
        list(prefetch_to_device(gen()))


def test_compiled_stats_reports_flops():
    def f(a, b):
        return a @ b
    x = jnp.ones((64, 64))
    stats = compiled_stats(f, x, x)
    assert isinstance(stats, dict)
    flops = stats.get("flops")
    if flops is not None:  # backend-dependent
        assert flops >= 2 * 64 * 64 * 64 * 0.5


class TestNativeDataLoader:
    """Native batch-assembly loader (torch-DataLoader equivalent)."""

    def _store(self, n=64, h=8, w=8, c=3):
        # image i is filled with value i so labels can be cross-checked
        imgs = np.broadcast_to(
            np.arange(n, dtype=np.uint8)[:, None, None, None], (n, h, w, c)
        ).copy()
        labels = np.arange(n, dtype=np.int32)
        return imgs, labels

    def test_native_matches_numpy_without_augment(self):
        from bnn_tpu.data import NativeDataLoader
        imgs = np.random.default_rng(0).integers(
            0, 256, (32, 8, 8, 3)).astype(np.uint8)
        labels = np.arange(32, dtype=np.int32)
        kw = dict(batch_size=8, shuffle=True, seed=3,
                  mean=(0.4, 0.5, 0.6), std=(0.2, 0.25, 0.3),
                  process_index=0, process_count=1)
        a = list(NativeDataLoader(imgs, labels, use_native=True, **kw))
        b = list(NativeDataLoader(imgs, labels, use_native=False, **kw))
        assert len(a) == len(b) == 4
        for (xa, ya), (xb, yb) in zip(a, b):
            np.testing.assert_allclose(xa, xb, atol=1e-6)
            np.testing.assert_array_equal(ya, yb)

    def test_labels_track_images_through_shuffle(self):
        from bnn_tpu.data import NativeDataLoader
        imgs, labels = self._store()
        loader = NativeDataLoader(imgs, labels, batch_size=16, seed=1,
                                  process_index=0, process_count=1)
        loader.set_epoch(2)
        for x, y in loader:
            # pixel value == label (x = u8/255 ... scale=1/255, bias=0)
            np.testing.assert_allclose(x[:, 0, 0, 0] * 255.0, y, atol=1e-4)

    def test_epoch_reshuffles_deterministically(self):
        from bnn_tpu.data import NativeDataLoader
        imgs, labels = self._store()
        loader = NativeDataLoader(imgs, labels, batch_size=64, seed=5,
                                  process_index=0, process_count=1)
        loader.set_epoch(0)
        y0 = next(iter(loader))[1]
        loader.set_epoch(1)
        y1 = next(iter(loader))[1]
        loader.set_epoch(0)
        y0b = next(iter(loader))[1]
        assert not np.array_equal(y0, y1)
        np.testing.assert_array_equal(y0, y0b)

    def test_multihost_shards_are_disjoint_and_cover(self):
        from bnn_tpu.data import NativeDataLoader
        imgs, labels = self._store(n=60)
        seen = []
        for rank in range(4):
            loader = NativeDataLoader(imgs, labels, batch_size=5, seed=2,
                                      process_index=rank, process_count=4)
            assert len(loader) == 3
            for _, y in loader:
                seen.extend(y.tolist())
        assert len(seen) == 60
        assert sorted(seen) == list(range(60))

    def test_crop_zero_padding_introduces_only_pad_value(self):
        from bnn_tpu.data import NativeDataLoader
        # constant-127 images: any crop pixel is 127/255 or the pad value 0
        imgs = np.full((16, 8, 8, 3), 127, np.uint8)
        loader = NativeDataLoader(imgs, np.zeros(16, np.int32), batch_size=16,
                                  pad=2, pad_mode="zeros", seed=0,
                                  process_index=0, process_count=1)
        x, _ = next(iter(loader))
        vals = np.unique(np.round(x * 255).astype(np.int32))
        assert set(vals.tolist()) <= {0, 127}
        assert 0 in vals  # some crop actually hit the padding

    def test_reflect_crop_preserves_constant_images(self):
        from bnn_tpu.data import NativeDataLoader
        imgs = np.full((16, 8, 8, 3), 99, np.uint8)
        loader = NativeDataLoader(imgs, np.zeros(16, np.int32), batch_size=16,
                                  pad=3, pad_mode="reflect", flip=True, seed=0,
                                  process_index=0, process_count=1)
        x, _ = next(iter(loader))
        np.testing.assert_allclose(x, 99.0 / 255.0, atol=1e-6)

    def test_flip_produces_mirrored_samples(self):
        from bnn_tpu.data import NativeDataLoader
        # left half 0, right half 200: a flip swaps the halves exactly
        imgs = np.zeros((64, 4, 4, 1), np.uint8)
        imgs[:, :, 2:, :] = 200
        loader = NativeDataLoader(imgs, np.zeros(64, np.int32), batch_size=64,
                                  flip=True, shuffle=False, seed=0,
                                  process_index=0, process_count=1)
        x, _ = next(iter(loader))
        orig = imgs[0].astype(np.float32) / 255.0
        mirrored = orig[:, ::-1]
        is_orig = np.isclose(x, orig).all(axis=(1, 2, 3))
        is_mirr = np.isclose(x, mirrored).all(axis=(1, 2, 3))
        assert np.all(is_orig | is_mirr)
        assert is_orig.any() and is_mirr.any()

    def test_mmap_store_works(self, tmp_path):
        from bnn_tpu.data import NativeDataLoader
        imgs, labels = self._store()
        p = tmp_path / "x.npy"
        np.save(p, imgs)
        mm = np.load(p, mmap_mode="r")
        loader = NativeDataLoader(mm, labels, batch_size=16, seed=1,
                                  process_index=0, process_count=1)
        x, y = next(iter(loader))
        np.testing.assert_allclose(x[:, 0, 0, 0] * 255.0, y, atol=1e-4)


def test_shard_host_batch_single_process_equals_shard_batch():
    """Single-process: shard_host_batch == shard_batch. (The multi-host
    path — per-process shards assembled into one global array — runs in
    the 2-process distributed test via make_array_from_process_local_data,
    which is what shard_host_batch wraps.)"""
    from bnn_tpu.parallel import shard_batch, shard_host_batch

    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    a = shard_batch(x, mesh)
    b = shard_host_batch(x, mesh)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.sharding.spec == b.sharding.spec
