"""Heterogeneous-stage pipeline parallelism (parallel/hetero_pipeline.py).

Pipelines the REAL trunk shape — stage widths doubling while feature maps
halve, exactly what the homogeneous pipeline cannot stack (VERDICT r2 weak
#3). Runs on the virtual 8-device CPU mesh (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.models.layers import BasicBlock
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.parallel import HeteroPipeline, make_pipeline_mesh

BC = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def _shortcut(cin, cout, rngs):
    return nn.Sequential(
        nn.AvgPool2d(2, 2, ceil_mode=True, count_include_pad=False),
        nn.Conv2d(cin, cout, 1, bias=False, rngs=rngs),
        nn.BatchNorm2d(cout, rngs=rngs),
    )


def _resnet_like_stages(seed=0):
    """Stem + 3 stages with DOUBLING widths (8 -> 16 -> 32) and halving
    feature maps + a head — the heterogeneous trunk shape."""
    rngs = nnx.Rngs(seed)
    stem = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1, bias=False, rngs=rngs),
        nn.BatchNorm2d(8, rngs=rngs),
        nn.ReLU(),
    )
    s1 = BasicBlock(8, 8, rngs=rngs)
    s2 = BasicBlock(8, 16, stride=2, downsample=_shortcut(8, 16, rngs),
                    rngs=rngs)
    s3 = nn.Sequential(
        BasicBlock(16, 32, stride=2, downsample=_shortcut(16, 32, rngs),
                   rngs=rngs),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(32, 5, rngs=rngs),
    )
    stages = [stem, s1, s2, s3]
    for st in stages:
        bst = prepare_binary_model(st, bconfig=BC,
                                   ignore_layers_name=["_first_", "_last_"])
        bst.eval()  # frozen BN stats (documented pipeline caveat)
        yield bst


def _sequential(stages, x):
    for st in stages:
        x = st(x)
    return x


class TestHeteroPipeline:
    def test_forward_matches_sequential(self):
        stages = list(_resnet_like_stages())
        mesh = make_pipeline_mesh(pipe=4, data=2)
        pipe = HeteroPipeline(stages, x_shape=(16, 16, 3), mesh=mesh)
        assert pipe.io_shapes[0][0] == (16, 16, 3)
        assert pipe.io_shapes[-1][1] == (5,)

        x = jax.random.normal(jax.random.key(0), (8, 16, 16, 3))
        expected = _sequential(stages, x)
        got = pipe.apply(pipe.flat_params, x, n_microbatches=4)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_rejects_mismatched_input_shape(self):
        """A smaller-than-declared input used to be silently zero-padded
        and reinterpreted into the declared layout (finite garbage)."""
        stages = list(_resnet_like_stages())
        mesh = make_pipeline_mesh(pipe=4, data=2)
        pipe = HeteroPipeline(stages, x_shape=(16, 16, 3), mesh=mesh)
        bad = jax.random.normal(jax.random.key(1), (8, 12, 12, 3))
        with pytest.raises(ValueError, match="declared x_shape"):
            pipe.apply(pipe.flat_params, bad, n_microbatches=4)

    def test_per_device_params_are_one_stage_row(self):
        stages = list(_resnet_like_stages())
        mesh = make_pipeline_mesh(pipe=4, data=2)
        pipe = HeteroPipeline(stages, x_shape=(16, 16, 3), mesh=mesh)
        shard = pipe.flat_params.addressable_shards[0].data
        assert shard.shape == (1, pipe.flat_params.shape[1])

    def _grad_pair(self, stages, x, y, n_micro=2):
        mesh = make_pipeline_mesh(pipe=len(stages), data=2)
        pipe = HeteroPipeline(stages, x_shape=tuple(x.shape[1:]), mesh=mesh)

        def loss_pipe(flat):
            logits = pipe.apply(flat, x, n_microbatches=n_micro)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        def loss_seq(flat):
            states = pipe.unflatten_stage_states(flat)
            h = x
            for gd, st in zip(pipe._graphdefs, states):
                h = nnx.merge(gd, st)(h)
            return optax.softmax_cross_entropy_with_integer_labels(h, y).mean()

        lp, gp = jax.value_and_grad(loss_pipe)(pipe.flat_params)
        ls, gs = jax.value_and_grad(loss_seq)(pipe.flat_params)
        return lp, gp, ls, gs

    @pytest.mark.slow
    def test_grad_matches_sequential_float(self):
        """Exact grad check on FLOAT stages (no STE sign boundaries)."""
        rngs = nnx.Rngs(0)
        stages = [
            nn.Sequential(nn.Conv2d(3, 8, 3, padding=1, rngs=rngs),
                          nn.Tanh()),
            nn.Sequential(nn.Conv2d(8, 16, 3, stride=2, padding=1,
                                    rngs=rngs), nn.Tanh()),
            nn.Sequential(nn.Conv2d(16, 32, 3, stride=2, padding=1,
                                    rngs=rngs), nn.Tanh()),
            nn.Sequential(nn.AdaptiveAvgPool2d(1), nn.Flatten(),
                          nn.Linear(32, 5, rngs=rngs)),
        ]
        x = jax.random.normal(jax.random.key(1), (8, 16, 16, 3)) * 0.5
        y = jax.random.randint(jax.random.key(2), (8,), 0, 5)
        lp, gp, ls, gs = self._grad_pair(stages, x, y)
        np.testing.assert_allclose(lp, ls, rtol=1e-6)
        np.testing.assert_allclose(gp, gs, rtol=1e-4, atol=1e-6)

    @pytest.mark.slow
    def test_grad_matches_sequential_binary(self):
        """Binarized stages: isolated STE-mask boundary flips (|x| ~ 1 under
        different f32 summation orders) make elementwise equality too
        strict; assert the loss matches and grads are near-identical in
        direction and magnitude."""
        stages = list(_resnet_like_stages())
        x = jax.random.normal(jax.random.key(1), (8, 16, 16, 3)) * 0.5
        y = jax.random.randint(jax.random.key(2), (8,), 0, 5)
        lp, gp, ls, gs = self._grad_pair(stages, x, y)
        np.testing.assert_allclose(lp, ls, rtol=1e-5)
        num = float(jnp.sum(gp * gs))
        cos = num / (float(jnp.linalg.norm(gp)) * float(jnp.linalg.norm(gs)))
        assert cos > 0.999, cos
        rel = float(jnp.linalg.norm(gp - gs) / jnp.linalg.norm(gs))
        assert rel < 0.05, rel

    @pytest.mark.slow
    def test_trains_on_flat_buffer(self):
        """Adam on the flat buffer (the supported training mode) reduces the
        loss; padding rows stay exactly zero."""
        stages = list(_resnet_like_stages())
        mesh = make_pipeline_mesh(pipe=4, data=2)
        pipe = HeteroPipeline(stages, x_shape=(16, 16, 3), mesh=mesh)
        x = jax.random.normal(jax.random.key(3), (8, 16, 16, 3)) * 0.5
        y = jax.random.randint(jax.random.key(4), (8,), 0, 5)
        tx = optax.adam(5e-3)

        @jax.jit
        def step(flat, opt_state):
            def loss_fn(f):
                logits = pipe.apply(f, x, n_microbatches=2)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            loss, g = jax.value_and_grad(loss_fn)(flat)
            upd, opt_state = tx.update(g, opt_state, flat)
            return optax.apply_updates(flat, upd), opt_state, loss

        flat = pipe.flat_params
        opt_state = tx.init(flat)
        flat, opt_state, l0 = step(flat, opt_state)
        for _ in range(12):
            flat, opt_state, loss = step(flat, opt_state)
        assert float(loss) < float(l0)
        # padding lanes untouched
        sizes = [sum(int(np.prod(s)) for s in shapes)
                 for shapes in pipe._shapes]
        for i, n in enumerate(sizes):
            np.testing.assert_array_equal(flat[i, n:], 0.0)

    @pytest.mark.slow
    def test_state_round_trip(self):
        stages = list(_resnet_like_stages())
        mesh = make_pipeline_mesh(pipe=4, data=2)
        pipe = HeteroPipeline(stages, x_shape=(16, 16, 3), mesh=mesh)
        x = jax.random.normal(jax.random.key(5), (4, 16, 16, 3))
        expected = _sequential(stages, x)
        rebuilt = pipe.stage_modules(pipe.flat_params)
        got = _sequential(rebuilt, x)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


class TestPipelinedBNStats:
    """apply(return_state=True): BN running stats updated with the exact
    sequential per-microbatch EMA semantics (lifts the homogeneous
    pipeline's stats-discarded caveat)."""

    def _stages(self, seed=0):
        rngs = nnx.Rngs(seed)
        stages = [
            nn.Sequential(nn.Conv2d(3, 8, 3, padding=1, rngs=rngs),
                          nn.BatchNorm2d(8, rngs=rngs), nn.ReLU()),
            nn.Sequential(nn.Conv2d(8, 16, 3, stride=2, padding=1,
                                    rngs=rngs),
                          nn.BatchNorm2d(16, rngs=rngs), nn.ReLU()),
            nn.Sequential(nn.Conv2d(16, 16, 3, padding=1, rngs=rngs),
                          nn.BatchNorm2d(16, rngs=rngs), nn.ReLU()),
            nn.Sequential(nn.AdaptiveAvgPool2d(1), nn.Flatten(),
                          nn.Linear(16, 4, rngs=rngs)),
        ]
        for st in stages:
            st.train()  # BN updates running stats
        return stages

    def test_stats_match_sequential_microbatch_loop(self):
        from bnn_tpu.parallel.hetero_pipeline import _flatten_state

        mesh = make_pipeline_mesh(pipe=4, data=1,
                                  devices=jax.devices()[:4])
        stages = self._stages()
        pipe = HeteroPipeline(stages, x_shape=(8, 8, 3), mesh=mesh)
        x = jax.random.normal(jax.random.key(7), (8, 8, 8, 3))

        _, new_flat = pipe.apply(pipe.flat_params, x, n_microbatches=4,
                                 return_state=True)
        assert not np.allclose(np.asarray(new_flat),
                               np.asarray(pipe.flat_params))

        # sequential reference: each microbatch through all stages in order
        seq_stages = self._stages()
        for mb in x.reshape(4, 2, 8, 8, 3):
            h = mb
            for st in seq_stages:
                h = st(h)
        ref_flat = jnp.stack([
            jnp.pad(f, (0, pipe.flat_params.shape[1] - f.shape[0]))
            for f in [_flatten_state(nnx.state(st))[0] for st in seq_stages]
        ])
        np.testing.assert_allclose(np.asarray(new_flat), np.asarray(ref_flat),
                                   rtol=1e-5, atol=1e-6)

    def test_stats_with_data_axis(self):
        """data>1: stats are pmean-averaged (SyncBN-style); Params stay
        bit-identical, BatchStats move."""
        mesh = make_pipeline_mesh(pipe=4, data=2)
        stages = self._stages()
        pipe = HeteroPipeline(stages, x_shape=(8, 8, 3), mesh=mesh)
        x = jax.random.normal(jax.random.key(8), (8, 8, 8, 3))
        _, new_flat = pipe.apply(pipe.flat_params, x, n_microbatches=2,
                                 return_state=True)
        assert np.all(np.isfinite(np.asarray(new_flat)))
        olds = pipe.stage_modules(pipe.flat_params)
        news = pipe.stage_modules(new_flat)
        np.testing.assert_array_equal(
            np.asarray(news[0][0].kernel[...]),
            np.asarray(olds[0][0].kernel[...]))
        assert not np.allclose(np.asarray(news[0][1].mean[...]),
                               np.asarray(olds[0][1].mean[...]))
