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
