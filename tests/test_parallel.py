"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.inference import deploy
from bnn_tpu.ops import BasicInputBinarizer, BasicScaleBinarizer, XNORWeightBinarizer
from bnn_tpu.parallel import (
    make_eval_step,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_model,
    shard_state,
)

BC = BConfig(BasicInputBinarizer, BasicScaleBinarizer, XNORWeightBinarizer)


def make_model(seed=0):
    rngs = nnx.Rngs(seed)
    net = nn.Sequential(
        nn.Conv2d(3, 32, 3, padding=1, rngs=rngs),
        nn.BatchNorm2d(32, rngs=rngs),
        nn.PReLU(32, rngs=rngs),
        nn.Conv2d(32, 64, 3, stride=2, padding=1, rngs=rngs),
        nn.BatchNorm2d(64, rngs=rngs),
        nn.PReLU(64, rngs=rngs),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(64, 10, rngs=rngs),
    )
    return prepare_binary_model(net, bconfig=BC, ignore_layers_name=["_first_"])


def test_device_count():
    assert len(jax.devices()) == 8


class TestMesh:
    def test_make_mesh_shapes(self):
        assert make_mesh().shape == {"data": 8, "model": 1}
        assert make_mesh(model=2).shape == {"data": 4, "model": 2}
        assert make_mesh(data=2, model=4).shape == {"data": 2, "model": 4}

    def test_shard_batch(self):
        mesh = make_mesh()
        xs = shard_batch(jnp.ones((16, 8, 8, 3)), mesh)
        assert xs.sharding.spec == P("data", None, None, None)

    def test_shard_state_tp_rules(self):
        mesh = make_mesh(data=4, model=2)
        model = make_model()
        _, params, _ = nnx.split(model, nnx.Param, ...)
        sharded = shard_state(params, mesh)
        flat = jax.tree_util.tree_leaves_with_path(sharded)
        kernels = [(p, x) for p, x in flat
                   if "kernel" in jax.tree_util.keystr(p) and x.size >= 1024]
        assert kernels
        for p, x in kernels:
            assert x.sharding.spec[-1] == "model", \
                f"{jax.tree_util.keystr(p)} not TP-sharded: {x.sharding.spec}"


class TestDataParallelTraining:
    def _train_once(self, mesh, x, y, dp):
        model = make_model()
        model.train()
        opt = nnx.Optimizer(model, optax.sgd(0.1), wrt=nnx.Param)
        if dp:
            shard_model(model, mesh)
            shard_model(opt, mesh)
            x, y = shard_batch((x, y), mesh)
        step = make_train_step()
        metrics = step(model, opt, x, y)
        return model, metrics

    def test_dp_step_matches_single_device(self):
        mesh = make_mesh()
        x = jax.random.normal(jax.random.key(0), (16, 8, 8, 3))
        y = jax.random.randint(jax.random.key(1), (16,), 0, 10)
        m1, met1 = self._train_once(mesh, x, y, dp=False)
        m2, met2 = self._train_once(mesh, x, y, dp=True)
        np.testing.assert_allclose(float(met1["loss"]), float(met2["loss"]),
                                   rtol=1e-5)
        l1 = jax.tree_util.tree_leaves(nnx.state(m1, nnx.Param))
        l2 = jax.tree_util.tree_leaves(nnx.state(m2, nnx.Param))
        assert len(l1) == len(l2)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_dp_loss_decreases(self):
        mesh = make_mesh()
        model = make_model()
        model.train()
        opt = nnx.Optimizer(model, optax.adam(1e-2), wrt=nnx.Param)
        shard_model(model, mesh)
        shard_model(opt, mesh)
        step = make_train_step()
        x, y = shard_batch((
            jax.random.normal(jax.random.key(2), (32, 8, 8, 3)),
            jax.random.randint(jax.random.key(3), (32,), 0, 10)), mesh)
        first = last = None
        for _ in range(20):
            metrics = step(model, opt, x, y)
            if first is None:
                first = float(metrics["loss"])
            last = float(metrics["loss"])
        assert last < first

    def test_tp_forward_matches_replicated(self):
        mesh = make_mesh(data=4, model=2)
        model = make_model()
        model.eval()
        x = jax.random.normal(jax.random.key(4), (8, 8, 8, 3))
        y_ref = model(x)

        shard_model(model, mesh)
        xb = shard_batch(x, mesh)
        y_tp = nnx.jit(lambda m, v: m(v))(model, xb)
        np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_eval_step_aggregation(self):
        model = make_model()
        model.eval()
        estep = make_eval_step()
        x = jax.random.normal(jax.random.key(5), (16, 8, 8, 3))
        y = jax.random.randint(jax.random.key(6), (16,), 0, 10)
        m = estep(model, x, y)
        assert float(m["count"]) == 16
        assert 0 <= float(m["top1"]) <= 16
        assert float(m["top5"]) >= float(m["top1"])


class TestDeployedTensorParallel:
    def test_deployed_model_tp_sharding(self):
        """The north star: bitpacked weights tensor-sharded over the mesh."""
        mesh = make_mesh(data=4, model=2)
        model = make_model()
        model.eval()
        x = jax.random.normal(jax.random.key(7), (8, 8, 8, 3))
        x = jnp.where(x == 0, 1e-3, x)
        y_ref = model(x)

        dep = deploy(model, use_pallas=False)
        shard_model(dep, mesh, min_size=64)
        xb = shard_batch(x, mesh)
        y_tp = nnx.jit(lambda m, v: m(v))(dep, xb)
        np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)

        flat = jax.tree_util.tree_leaves_with_path(nnx.state(dep))
        packed = [x for p, x in flat
                  if "w_packed" in jax.tree_util.keystr(p) and x.size >= 64]
        assert packed
        assert any(x.sharding.spec[-1] == "model" for x in packed
                   if len(x.sharding.spec) > 0)


class TestSTEUnderShardMap:
    """SURVEY.md §7.4: custom_vjp STEs must compose with shard_map and
    sharded reductions."""

    def test_sign_ste_grad_under_shard_map(self):
        from jax.experimental.shard_map import shard_map
        from bnn_tpu.ops import sign_ste

        mesh = make_mesh()
        x = jax.random.normal(jax.random.key(0), (16, 8))

        def local_loss(xs):
            # per-shard partial sums psum'd across the data axis
            return jax.lax.psum(jnp.sum(sign_ste(xs) * 2.0), "data")

        smapped = shard_map(local_loss, mesh=mesh,
                            in_specs=P("data", None), out_specs=P())
        g_sharded = jax.grad(lambda v: smapped(v))(x)
        g_single = jax.grad(lambda v: jnp.sum(sign_ste(v) * 2.0))(x)
        np.testing.assert_allclose(np.asarray(g_sharded),
                                   np.asarray(g_single), rtol=1e-6)

    def test_xnor_alpha_reduction_under_tp(self):
        """Per-out-channel alpha must be invariant to out-axis sharding."""
        from bnn_tpu.ops import XNORWeightBinarizer
        from jax.sharding import NamedSharding

        mesh = make_mesh(data=4, model=2)
        w = jax.random.normal(jax.random.key(1), (3, 3, 32, 64))
        wq_single = XNORWeightBinarizer()(w)
        w_tp = jax.device_put(w, NamedSharding(mesh, P(None, None, None, "model")))
        wq_tp = jax.jit(lambda v: XNORWeightBinarizer()(v))(w_tp)
        np.testing.assert_allclose(np.asarray(wq_tp), np.asarray(wq_single),
                                   rtol=1e-6)


def test_remat_train_step_matches_plain():
    """Rematerialized training computes identical updates."""
    x = jax.random.normal(jax.random.key(30), (8, 8, 8, 3))
    y = jax.random.randint(jax.random.key(31), (8,), 0, 10)

    def run(remat):
        model = make_model()
        model.train()
        opt = nnx.Optimizer(model, optax.sgd(0.1), wrt=nnx.Param)
        step = make_train_step(remat=remat)
        m = step(model, opt, x, y)
        return float(m["loss"]), jax.tree_util.tree_leaves(
            nnx.state(model, nnx.Param))

    l0, p0 = run(False)
    l1, p1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
