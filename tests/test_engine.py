"""Recipe-engine tests (mirrors reference test/test_engine.py, plus recipe
validation tests the reference lacks)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import nn
from bnn_tpu import layers as blayers
from bnn_tpu.engine import BinaryChef, RecipeError
from bnn_tpu.ops import BasicInputBinarizer, Identity, XNORWeightBinarizer, register

ASSET = os.path.join(os.path.dirname(__file__), "assets", "test.yaml")


def make_net():
    rngs = nnx.Rngs(0)
    return nn.Sequential(
        nn.Conv2d(3, 16, 1, rngs=rngs),
        nn.BatchNorm2d(16, rngs=rngs),
        nn.ReLU(),
        nn.Conv2d(16, 16, 1, rngs=rngs),
        nn.BatchNorm2d(16, rngs=rngs),
        nn.ReLU(),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(16, 3, rngs=rngs),
    )


class TestBinaryChef:
    def test_step_length(self):
        chef = BinaryChef(ASSET)
        assert len(chef) == 3
        assert chef.get_num_steps() == 3

    def test_engine_progression(self):
        # reference: test/test_engine.py:44-66
        model = make_net()
        chef = BinaryChef(ASSET)

        # Step 1: activations binarized, weights Identity; first/last ignored
        model = chef.next(model)
        assert type(model[0]) is nn.Conv2d  # _first_ ignored
        assert type(model[8]) is nn.Linear  # _last_ ignored
        assert isinstance(model[3], blayers.Conv2d)
        assert isinstance(model[3].weight_pre_process, Identity)
        assert isinstance(model[3].activation_pre_process, BasicInputBinarizer)

        # Step 2: weights now XNOR-binarized
        model = chef.next(model)
        assert isinstance(model[3].weight_pre_process, XNORWeightBinarizer)
        assert model[3].weight_pre_process.center_weights is True
        w_alpha = model[3].activation_post_process.alpha
        w_alpha[...] = jnp.linspace(0.1, 2.0, 16)  # pretend training moved it

        # Step 3: update=True carries the learnable alpha across the re-wrap
        model = chef.next(model, update=True)
        assert isinstance(model[3].weight_pre_process, XNORWeightBinarizer)
        assert model[3].weight_pre_process.center_weights is False
        np.testing.assert_array_equal(
            model[3].activation_post_process.alpha[...], jnp.linspace(0.1, 2.0, 16)
        )
        # step 3 has no ignore list: first/last get binarized now
        assert isinstance(model[0], blayers.Conv2d)
        assert isinstance(model[8], blayers.Linear)

    def test_weights_survive_across_steps(self):
        model = make_net()
        w = model[3].kernel
        chef = BinaryChef(ASSET)
        model = chef.next(model)
        model = chef.next(model)
        assert model[3].kernel is w

    def test_user_module_registration(self):
        class MyCustomBinarizer(BasicInputBinarizer):
            pass

        recipe = {
            "step0": {
                "pre_activation": {"name": "MyCustomBinarizer"},
                "post_activation": {"name": "Identity"},
                "weight": {"name": "Identity"},
            }
        }
        chef = BinaryChef(recipe, user_modules=[MyCustomBinarizer])
        model = chef.next(make_net())
        assert isinstance(model[3].activation_pre_process, MyCustomBinarizer)

    def test_case_insensitive_keys(self):
        # the reference crashes on a mis-cased key (xnor-net.yaml:6 'NAME:');
        # we normalize instead
        recipe = {
            "step0": {
                "pre_activation": {"NAME": "BasicInputBinarizer"},
                "post_activation": {"name": "Identity"},
                "weight": {"name": "Identity"},
            }
        }
        chef = BinaryChef(recipe)
        assert len(chef) == 1


class TestRecipeValidation:
    def test_missing_slot(self):
        with pytest.raises(RecipeError, match="missing required section 'weight'"):
            BinaryChef({"step0": {"pre_activation": {"name": "Identity"},
                                  "post_activation": {"name": "Identity"}}})

    def test_missing_name(self):
        with pytest.raises(RecipeError, match="missing required key 'name'"):
            BinaryChef({"step0": {"pre_activation": {"args": {}},
                                  "post_activation": {"name": "Identity"},
                                  "weight": {"name": "Identity"}}})

    def test_unknown_binarizer(self):
        with pytest.raises(KeyError, match="Unknown binarizer"):
            BinaryChef({"step0": {"pre_activation": {"name": "NopeBinarizer"},
                                  "post_activation": {"name": "Identity"},
                                  "weight": {"name": "Identity"}}})

    def test_unknown_step_key(self):
        with pytest.raises(RecipeError, match="unknown keys"):
            BinaryChef({"step0": {"pre_activation": {"name": "Identity"},
                                  "post_activation": {"name": "Identity"},
                                  "weight": {"name": "Identity"},
                                  "ignore_layers": []}})

    def test_empty_recipe(self):
        with pytest.raises(RecipeError, match="non-empty"):
            BinaryChef({})

    def test_bogus_binarizer_args_rejected_at_init(self):
        """A typo'd args key must fail LOUD at construction, not as a raw
        TypeError mid-conversion once a non-ignored layer is reached."""
        with pytest.raises(RecipeError, match="bogus_arg"):
            BinaryChef({"step0": {
                "pre_activation": {"name": "BasicInputBinarizer"},
                "post_activation": {"name": "Identity"},
                "weight": {"name": "XNORWeightBinarizer",
                           "args": {"bogus_arg": 1}}}})

    def test_non_integer_epochs_is_recipe_error(self):
        with pytest.raises(RecipeError, match="epochs must be an integer"):
            BinaryChef({"step0": {
                "pre_activation": {"name": "Identity"},
                "post_activation": {"name": "Identity"},
                "weight": {"name": "Identity"},
                "epochs": "abc"}})

    def test_scalar_ignore_layer_names(self):
        """A natural YAML scalar ('ignore_layer_names: _last_') used to
        be exploded character-by-character by list(), silently
        binarizing the excluded layer."""
        chef = BinaryChef({"step0": {
            "pre_activation": {"name": "BasicInputBinarizer"},
            "post_activation": {"name": "Identity"},
            "weight": {"name": "XNORWeightBinarizer"},
            "ignore_layer_names": "_last_"}})
        m = nn.Sequential(nn.Linear(4, 4, rngs=nnx.Rngs(0)),
                          nn.Linear(4, 2, rngs=nnx.Rngs(1)))
        m = chef.run_step(m, 0)
        assert isinstance(getattr(m, "0"), blayers.Linear)
        assert not isinstance(getattr(m, "1"), blayers.Linear)

    def test_bad_ignore_layer_names_type(self):
        with pytest.raises(RecipeError, match="ignore_layer_names"):
            BinaryChef({"step0": {
                "pre_activation": {"name": "Identity"},
                "post_activation": {"name": "Identity"},
                "weight": {"name": "Identity"},
                "ignore_layer_names": {"a": 1}}})

    def test_next_does_not_skip_failed_step(self):
        """next() must advance the counter only on SUCCESS — otherwise a
        failed step is silently skipped on retry."""
        chef = BinaryChef({"step0": {
            "pre_activation": {"name": "Identity"},
            "post_activation": {"name": "Identity"},
            "weight": {"name": "Identity"}}})
        chef.run_step = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("boom"))
        with pytest.raises(RuntimeError):
            chef.next(object())
        assert chef.current_step == 0

    def test_multistep_milestone_at_warmup_boundary(self):
        """A milestone landing exactly at the warmup end used to be
        silently dropped (strict >), so the decay never fired."""
        from bnn_tpu.engine import _build_lr_schedule

        s = _build_lr_schedule(
            1.0, {"name": "multistep", "milestones": [1], "gamma": 0.1,
                  "warmup_epochs": 1}, epochs=5, steps_per_epoch=10)
        assert abs(float(s(30)) - 0.1) < 1e-6, float(s(30))


class TestShippedRecipes:
    @pytest.mark.parametrize("recipe", [
        "examples/recipes/xnor-net.yaml",
        "examples/recipes/xnor-net-plus.yaml",
        "examples/recipes/imagenet-baseline.yaml",
    ])
    def test_recipe_parses_and_applies(self, recipe):
        path = os.path.join(os.path.dirname(__file__), "..", recipe)
        chef = BinaryChef(path)
        model = make_net()
        for _ in range(len(chef)):
            model = chef.next(model)
        assert isinstance(model[3], blayers.Conv2d)


class TestRecipeOptimizer:
    """Per-step optimizer/schedule sections (TPU-native extension)."""

    RECIPE = {
        "step0": {
            "pre_activation": {"name": "BasicInputBinarizer"},
            "post_activation": {"name": "Identity"},
            "weight": {"name": "Identity"},
            "epochs": 4,
            "optimizer": {"name": "adam", "lr": 1e-2, "weight_decay": 1e-5},
            "lr_schedule": {"name": "cosine", "warmup_epochs": 1},
        },
        "step1": {
            "pre_activation": {"name": "BasicInputBinarizer"},
            "post_activation": {"name": "Identity"},
            "weight": {"name": "XNORWeightBinarizer"},
            "epochs": 2,
            "optimizer": {"name": "sgd", "lr": 0.1, "momentum": 0.9},
            "lr_schedule": {"name": "multistep", "milestones": [1],
                            "gamma": 0.1},
        },
    }

    def test_epochs_accessor(self):
        chef = BinaryChef(self.RECIPE)
        assert chef.epochs(0) == 4
        assert chef.epochs(1) == 2

    def test_schedule_values(self):
        chef = BinaryChef(self.RECIPE)
        # cosine with 1 warmup epoch over 4 epochs x 10 steps
        tx_unused = chef.make_tx(0, steps_per_epoch=10)
        from bnn_tpu.engine import (_build_lr_schedule,
                                    _validate_schedule_spec)
        sched = _build_lr_schedule(
            1e-2, {"name": "cosine", "warmup_epochs": 1}, 4, 10)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(10)), 1e-2, rtol=1e-5)
        assert float(sched(39)) < 1e-3  # decayed near the end
        # multistep drops by gamma at milestone*steps_per_epoch
        sched2 = _build_lr_schedule(
            0.1, {"name": "multistep", "milestones": [1], "gamma": 0.1}, 2, 10)
        np.testing.assert_allclose(float(sched2(5)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(sched2(15)), 0.01, rtol=1e-6)
        # multistep milestones are ABSOLUTE epochs even with warmup:
        # join_schedules feeds warmup-relative steps, so the boundary
        # must shift left by the warmup (a drop at step 30 here = bug)
        sched3 = _build_lr_schedule(
            1.0, {"name": "multistep", "milestones": [2], "gamma": 0.1,
                  "warmup_epochs": 1}, 4, 10)
        np.testing.assert_allclose(float(sched3(19)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(sched3(20)), 0.1, rtol=1e-6)

    def test_make_optimizer_trains(self):
        import optax  # noqa: F401
        chef = BinaryChef(self.RECIPE)
        model = chef.run_step(make_net(), 0)
        model.train()
        opt = chef.make_optimizer(model, 0, steps_per_epoch=2)
        from bnn_tpu.parallel import make_train_step
        import jax
        step = make_train_step()
        x = jax.random.normal(jax.random.key(0), (8, 8, 8, 3))
        y = jnp.zeros((8,), jnp.int32)
        first = step(model, opt, x, y)
        for _ in range(7):
            m = step(model, opt, x, y)
        assert float(m["loss"]) < float(first["loss"])

    def test_optimizer_validation(self):
        bad = {k: dict(v) for k, v in self.RECIPE.items()}
        bad["step0"] = dict(bad["step0"], optimizer={"name": "lamb", "lr": 1})
        with pytest.raises(RecipeError, match="lamb"):
            BinaryChef(bad)
        bad["step0"] = dict(self.RECIPE["step0"],
                            optimizer={"name": "sgd", "lr": 0.1,
                                       "momentom": 0.9})
        with pytest.raises(RecipeError, match="momentom"):
            BinaryChef(bad)
        bad["step0"] = dict(self.RECIPE["step0"],
                            lr_schedule={"name": "multistep"})
        with pytest.raises(RecipeError, match="milestones"):
            BinaryChef(bad)

    def test_missing_optimizer_section_is_loud(self):
        recipe = {"step0": {
            "pre_activation": {"name": "BasicInputBinarizer"},
            "post_activation": {"name": "Identity"},
            "weight": {"name": "Identity"},
        }}
        chef = BinaryChef(recipe)
        with pytest.raises(RecipeError, match="optimizer"):
            chef.make_tx(0)
