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

    def test_shard_state_honors_non_model_rule_axes(self):
        """Rules naming other mesh axes (FSDP-style 'data') must shard —
        the old hardcoded model_size>1 gate silently replicated them on
        a model=1 mesh."""
        mesh = make_mesh(data=8, model=1)
        model = make_model()
        _, params, _ = nnx.split(model, nnx.Param, ...)
        rules = ((r"\bkernel$",
                  lambda ndim: P(*([None] * (ndim - 1) + ["data"]))),)
        sharded = shard_state(params, mesh, rules=rules)
        flat = jax.tree_util.tree_leaves_with_path(sharded)
        kernels = [(p, x) for p, x in flat
                   if "kernel" in jax.tree_util.keystr(p)
                   and x.size >= 1024 and x.shape[-1] % 8 == 0]
        assert kernels
        for p, x in kernels:
            assert x.sharding.spec[-1] == "data", \
                f"{jax.tree_util.keystr(p)}: {x.sharding.spec}"


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

    @pytest.mark.slow
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


class TestPipelineParallel:
    """GPipe-style pipeline over the 'pipe' mesh axis (new capability — the
    reference has no PP at all, SURVEY.md §2.3)."""

    @staticmethod
    def _stages(n, width=16, seed=0):
        from bnn_tpu import layers
        stages = []
        for i in range(n):
            stages.append(layers.Linear(width, width, bconfig=BC,
                                        rngs=nnx.Rngs(seed + i)))
        return stages

    def test_pipeline_matches_sequential(self):
        from bnn_tpu.parallel import (
            make_pipeline_mesh, make_stage_fn, pipeline_apply,
            shard_stacked_state, stack_stage_states,
        )
        stages = self._stages(4)
        mesh = make_pipeline_mesh(pipe=4, data=2)
        stacked = shard_stacked_state(stack_stage_states(stages), mesh)
        fn = make_stage_fn(stages[0])
        x = jax.random.normal(jax.random.key(5), (16, 16))

        y_pipe = jax.jit(
            lambda st, v: pipeline_apply(fn, st, v, mesh=mesh,
                                         n_microbatches=4))(stacked, x)
        y_seq = x
        for s in stages:
            y_seq = s(y_seq)
        np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq),
                                   rtol=1e-5, atol=1e-5)

    def test_pipeline_rejects_stage_count_mesh_mismatch(self):
        """8 stacked stages over a 4-way pipe axis used to silently run
        only stages 0,2,4,6 (shard_map hands each device 2 rows, the
        body used row 0) — must be a loud error."""
        from bnn_tpu.parallel import (
            make_pipeline_mesh, make_stage_fn, pipeline_apply,
            stack_stage_states,
        )
        stages = self._stages(8)
        mesh = make_pipeline_mesh(pipe=4, data=2)
        stacked = stack_stage_states(stages)
        fn = make_stage_fn(stages[0])
        x = jax.random.normal(jax.random.key(5), (16, 16))
        with pytest.raises(ValueError, match="stacked stages"):
            pipeline_apply(fn, stacked, x, mesh=mesh, n_microbatches=4)

    @pytest.mark.slow
    def test_pipeline_single_microbatch_and_many(self):
        from bnn_tpu.parallel import (
            make_pipeline_mesh, make_stage_fn, pipeline_apply,
            shard_stacked_state, stack_stage_states,
        )
        stages = self._stages(2, width=8, seed=7)
        mesh = make_pipeline_mesh(pipe=2, data=4)
        stacked = shard_stacked_state(stack_stage_states(stages), mesh)
        fn = make_stage_fn(stages[0])
        x = jax.random.normal(jax.random.key(6), (16, 8))
        y_seq = stages[1](stages[0](x))
        for n_micro in (1, 2, 4):
            y = pipeline_apply(fn, stacked, x, mesh=mesh,
                               n_microbatches=n_micro)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_seq),
                                       rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_pipeline_backward(self):
        """jax.grad through the pipeline schedule equals the sequential
        gradient (GPipe backward for free via scan/ppermute transposes)."""
        from bnn_tpu.parallel import (
            make_pipeline_mesh, make_stage_fn, pipeline_apply,
            shard_stacked_state, stack_stage_states,
        )
        stages = self._stages(4, width=8, seed=3)
        mesh = make_pipeline_mesh(pipe=4, data=2)
        stacked_host = stack_stage_states(stages)
        stacked = shard_stacked_state(stacked_host, mesh)
        fn = make_stage_fn(stages[0])
        x = jax.random.normal(jax.random.key(8), (8, 8))

        def loss_pipe(st):
            y = pipeline_apply(fn, st, x, mesh=mesh, n_microbatches=2)
            return jnp.sum(y ** 2)

        def loss_seq(st):
            h = x
            for i in range(4):
                hi = jax.tree.map(lambda p: p[i], st)
                h = fn(hi, h)
            return jnp.sum(h ** 2)

        g_pipe = jax.grad(loss_pipe)(stacked)
        g_seq = jax.grad(loss_seq)(stacked_host)
        for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestGradAccumulation:
    def test_accum_matches_full_batch_on_bn_free_model(self):
        from bnn_tpu import layers

        def build():
            rngs = nnx.Rngs(0)
            net = nn.Sequential(
                layers.Linear(12, 32, bconfig=BC, rngs=rngs),
                nn.PReLU(32, rngs=rngs),
                layers.Linear(32, 10, bconfig=BC, rngs=rngs),
            )
            return net

        x = jax.random.normal(jax.random.key(11), (16, 12))
        y = jax.random.randint(jax.random.key(12), (16,), 0, 10)

        def run(accum):
            model = build()
            opt = nnx.Optimizer(model, optax.sgd(0.1), wrt=nnx.Param)
            step = make_train_step(accum_steps=accum)
            m = step(model, opt, x, y)
            return float(m["loss"]), [np.asarray(p) for p in
                                      jax.tree.leaves(nnx.state(model, nnx.Param))]

        l1, p1 = run(1)
        l4, p4 = run(4)
        np.testing.assert_allclose(l1, l4, rtol=1e-5)
        for a, b in zip(p1, p4):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class TestZero1:
    def test_opt_state_sharded_params_replicated(self):
        from bnn_tpu.parallel import shard_optimizer_zero1

        mesh = make_mesh()  # data=8
        model = make_model()
        model.train()
        opt = nnx.Optimizer(model, optax.adamw(1e-3), wrt=nnx.Param)
        shard_model(model, mesh)
        shard_optimizer_zero1(opt, mesh, min_size=64)

        flat = jax.tree_util.tree_leaves_with_path(nnx.state(opt))
        sharded = [(jax.tree_util.keystr(p), x) for p, x in flat
                   if hasattr(x, "sharding") and "opt_state" in
                   jax.tree_util.keystr(p) and x.size >= 64
                   and x.shape and x.shape[0] % 8 == 0]
        assert sharded
        assert any(x.sharding.spec and x.sharding.spec[0] == "data"
                   for _, x in sharded)

        # training still runs and converges numerically like the replicated
        # version for one step
        x = jax.random.normal(jax.random.key(13), (16, 8, 8, 3))
        y = jax.random.randint(jax.random.key(14), (16,), 0, 10)
        x, y = shard_batch((x, y), mesh)
        step = make_train_step()
        m = step(model, opt, x, y)
        assert np.isfinite(float(m["loss"]))

    def test_conv_moments_get_sharded(self):
        # ADVICE r1: conv-kernel moments lead with kernel height (3), which
        # never divides the data axis — zero1 must pick a divisible dim
        from bnn_tpu.parallel import shard_optimizer_zero1

        mesh = make_mesh()  # data=8
        model = make_model()
        opt = nnx.Optimizer(model, optax.adamw(1e-3), wrt=nnx.Param)
        shard_model(model, mesh)
        shard_optimizer_zero1(opt, mesh, min_size=64)

        flat = jax.tree_util.tree_leaves_with_path(nnx.state(opt))
        conv_moments = [x for p, x in flat
                        if "opt_state" in jax.tree_util.keystr(p)
                        and hasattr(x, "ndim") and x.ndim == 4
                        and x.size >= 64]
        assert conv_moments
        for x in conv_moments:
            assert "data" in tuple(x.sharding.spec), (
                x.shape, x.sharding.spec)

    @pytest.mark.slow
    def test_zero1_checkpoint_roundtrip_continuity(self, tmp_path):
        """Save/restore a ZeRO-1-sharded optimizer through Orbax on the
        8-device mesh and resume: the loss trajectory must match an
        uninterrupted sharded run (VERDICT r3 next #4 — the resume
        continuity test previously ran unsharded only). Orbax writes the
        full logical array regardless of sharding; on restore the fresh
        optimizer is re-sharded exactly like the trainer does
        (examples/imagenet.py resume path with --zero1)."""
        from bnn_tpu.parallel import shard_optimizer_zero1
        from bnn_tpu.utils import (load_checkpoint, restore_into,
                                   restore_optimizer, save_checkpoint)

        mesh = make_mesh()  # data=8

        def build():
            model = make_model()
            model.train()
            sched = optax.cosine_decay_schedule(5e-2, 24)
            opt = nnx.Optimizer(model, optax.adamw(sched), wrt=nnx.Param)
            shard_model(model, mesh)
            shard_model(opt, mesh)
            shard_optimizer_zero1(opt, mesh, min_size=64)
            return model, opt

        x = jax.random.normal(jax.random.key(5), (32, 8, 8, 3))
        y = jax.random.randint(jax.random.key(6), (32,), 0, 10)
        step = make_train_step()

        def run(model, opt, lo, hi):
            losses = []
            for i in range(lo, hi):
                idx = jnp.arange(16) + (i % 2) * 16
                xb, yb = shard_batch((x[idx], y[idx]), mesh)
                losses.append(float(step(model, opt, xb, yb)["loss"]))
            return losses

        model_a, opt_a = build()
        losses_full = run(model_a, opt_a, 0, 12)

        model_b, opt_b = build()
        run(model_b, opt_b, 0, 6)
        # the moments being saved really are data-sharded
        assert any(
            "data" in tuple(x.sharding.spec)
            for p, x in jax.tree_util.tree_leaves_with_path(nnx.state(opt_b))
            if "opt_state" in jax.tree_util.keystr(p)
            and hasattr(x, "sharding") and x.size >= 64)
        path = str(tmp_path / "zero1_ckpt")
        save_checkpoint(path, model_b, opt_state=opt_b)

        model_c, opt_c = build()
        payload = load_checkpoint(path)
        restore_into(model_c, payload)
        assert restore_optimizer(opt_c, payload) == []  # strict, no skips
        shard_model(model_c, mesh)
        shard_model(opt_c, mesh)
        shard_optimizer_zero1(opt_c, mesh, min_size=64)
        losses_resumed = run(model_c, opt_c, 6, 12)
        np.testing.assert_allclose(losses_resumed, losses_full[6:],
                                   rtol=2e-4)

    def test_zero1_preserves_tensor_parallel_sharding(self):
        # ADVICE r1: zero1 must not clobber the TP shardings shard_model
        # applied to moment arrays — it should compose with them
        from bnn_tpu.parallel import shard_optimizer_zero1

        mesh = make_mesh(data=4, model=2)
        model = make_model()
        opt = nnx.Optimizer(model, optax.adamw(1e-3), wrt=nnx.Param)
        shard_model(model, mesh, min_size=64)
        shard_model(opt, mesh, min_size=64)
        shard_optimizer_zero1(opt, mesh, min_size=64)

        flat = jax.tree_util.tree_leaves_with_path(nnx.state(opt))
        tp_moments = [x for p, x in flat
                      if "opt_state" in jax.tree_util.keystr(p)
                      and jax.tree_util.keystr(p).find("kernel") != -1
                      and hasattr(x, "ndim") and x.ndim >= 2
                      and x.size >= 64 and x.shape[-1] % 2 == 0]
        assert tp_moments
        assert any("model" in tuple(x.sharding.spec) for x in tp_moments), \
            "TP sharding of moments was discarded by zero1"
