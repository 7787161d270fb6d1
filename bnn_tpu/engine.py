"""Recipe engine: YAML-driven progressive binarization.

TPU-native counterpart of the reference's ``BinaryChef``
(bnn/engine.py:23-79). Differences by design (SURVEY.md §7.5):

- binarizer names resolve through the explicit registry
  (:mod:`bnn_tpu.ops.registry`) instead of ``eval()`` +
  globals-injection;
- recipes are validated loudly with actionable errors (the reference
  crashes opaquely on a mis-cased key, examples/recepies/xnor-net.yaml:6 —
  here keys are case-normalized and unknown keys are reported);
- no stray debug prints.

Recipe schema (identical to the reference's YAML assets,
test/assets/test.yaml):

.. code-block:: yaml

    step0:
      pre_activation:  {name: BasicInputBinarizer}
      post_activation: {name: BasicScaleBinarizer}
      weight:          {name: XNORWeightBinarizer, args: {compute_alpha: true}}
      ignore_layer_names: ["_first_", "_last_", "layer2.0.downsample.1"]
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, List

import optax
import yaml
from flax import nnx

from .bconfig import BConfig
from .binarize import prepare_binary_model
from .ops import registry

__all__ = ["BinaryChef", "RecipeError"]

_SLOT_KEYS = ("pre_activation", "post_activation", "weight")
_KNOWN_STEP_KEYS = set(_SLOT_KEYS) | {
    "ignore_layer_names", "optimizer", "lr_schedule", "epochs",
}
_OPTIMIZERS = ("sgd", "adam", "adamw")
_SCHEDULES = ("constant", "cosine", "multistep")


class RecipeError(ValueError):
    """A recipe file failed validation."""


def _normalize_keys(d: Dict[str, Any]) -> Dict[str, Any]:
    return {str(k).lower(): v for k, v in d.items()}


def _build_binarizer_factory(slot: str, spec: Any, step_name: str) -> Callable:
    if not isinstance(spec, dict):
        raise RecipeError(
            f"{step_name}.{slot}: expected a mapping with a 'name' key, got {spec!r}"
        )
    spec = _normalize_keys(spec)
    if "name" not in spec:
        raise RecipeError(
            f"{step_name}.{slot}: missing required key 'name' (found keys: "
            f"{sorted(spec)})"
        )
    cls = registry.resolve(str(spec["name"]))
    args = spec.get("args", None)
    if args:
        if not isinstance(args, dict):
            raise RecipeError(
                f"{step_name}.{slot}.args: expected a mapping, got {args!r}"
            )
        # check args against the constructor NOW — otherwise a typo'd
        # key passes "loud validation" and dies mid-conversion as a raw
        # TypeError once the first non-ignored layer is reached
        try:
            inspect.signature(cls.__init__).bind_partial(None, **args)
        except TypeError as e:
            raise RecipeError(
                f"{step_name}.{slot}.args: {e} "
                f"(binarizer {cls.__name__})") from None
        return cls.with_args(**args)
    return cls


def _normalize_ignore_names(value: Any, step_name: str) -> List[str]:
    """A natural YAML scalar (``ignore_layer_names: _last_``) used to be
    exploded character-by-character by ``list()`` — silently binarizing
    the layer the user explicitly excluded."""
    if isinstance(value, str):
        return [value]
    if isinstance(value, (list, tuple)) and all(
            isinstance(s, str) for s in value):
        return list(value)
    raise RecipeError(
        f"{step_name}.ignore_layer_names: expected a name or list of "
        f"names, got {value!r}")


def _validate_optimizer_spec(spec: Any, step_name: str) -> Dict[str, Any]:
    if not isinstance(spec, dict):
        raise RecipeError(
            f"{step_name}.optimizer: expected a mapping with a 'name' key, "
            f"got {spec!r}"
        )
    spec = _normalize_keys(spec)
    name = str(spec.get("name", "")).lower()
    if name not in _OPTIMIZERS:
        raise RecipeError(
            f"{step_name}.optimizer.name: {spec.get('name')!r} is not one of "
            f"{list(_OPTIMIZERS)}"
        )
    known = {"name", "lr", "weight_decay", "momentum", "nesterov",
             "b1", "b2", "eps"}
    unknown = set(spec) - known
    if unknown:
        raise RecipeError(
            f"{step_name}.optimizer: unknown keys {sorted(unknown)}; allowed "
            f"keys are {sorted(known)}"
        )
    spec["name"] = name
    return spec


def _validate_schedule_spec(spec: Any, step_name: str) -> Dict[str, Any]:
    if not isinstance(spec, dict):
        raise RecipeError(
            f"{step_name}.lr_schedule: expected a mapping with a 'name' key, "
            f"got {spec!r}"
        )
    spec = _normalize_keys(spec)
    name = str(spec.get("name", "")).lower()
    if name not in _SCHEDULES:
        raise RecipeError(
            f"{step_name}.lr_schedule.name: {spec.get('name')!r} is not one "
            f"of {list(_SCHEDULES)}"
        )
    known = {"name", "milestones", "gamma", "warmup_epochs", "final_factor"}
    unknown = set(spec) - known
    if unknown:
        raise RecipeError(
            f"{step_name}.lr_schedule: unknown keys {sorted(unknown)}; "
            f"allowed keys are {sorted(known)}"
        )
    if name == "multistep" and not isinstance(spec.get("milestones"), list):
        raise RecipeError(
            f"{step_name}.lr_schedule: 'multistep' requires a 'milestones' "
            f"list (epoch indices)"
        )
    spec["name"] = name
    return spec


def _build_lr_schedule(base_lr: float, sched: Dict[str, Any], epochs: int,
                       steps_per_epoch: int):
    """Lower a schedule spec to an optax schedule over *optimizer steps*.

    Mirrors the reference trainer's scheduler menu: MultiStepLR /
    CosineAnnealingLR plus gradual warmup (examples/imagenet.py:206-216),
    expressed as pure optax schedules (TPU-side: the lr is a traced scalar,
    so one compiled train step serves the whole run).
    """
    name = sched.get("name", "constant")
    warmup_steps = int(sched.get("warmup_epochs", 0)) * int(steps_per_epoch)
    total = max(1, int(epochs) * int(steps_per_epoch) - warmup_steps)
    if name == "cosine":
        final = float(sched.get("final_factor", 0.0))
        main = optax.cosine_decay_schedule(base_lr, total, alpha=final)
    elif name == "multistep":
        gamma = float(sched.get("gamma", 0.1))
        # milestones are ABSOLUTE epochs; join_schedules feeds the main
        # schedule warmup-relative steps, so shift the boundaries left by
        # the warmup (an unshifted boundary fires warmup_epochs late)
        # >= keeps a milestone landing EXACTLY at the warmup boundary
        # (boundary key 0: the decay is in effect from the start of the
        # main schedule; the strict > silently dropped it entirely)
        bounds = {int(m) * steps_per_epoch - warmup_steps: gamma
                  for m in sched.get("milestones", [])
                  if int(m) * steps_per_epoch >= warmup_steps}
        main = optax.piecewise_constant_schedule(base_lr, bounds)
    else:
        main = optax.constant_schedule(base_lr)
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.join_schedules([warm, main], [warmup_steps])
    return main


class BinaryChef:
    """Converts a model step-by-step according to a YAML recipe.

    Example::

        chef = BinaryChef('recipe.yaml')
        for i in range(len(chef)):
            model = chef.next(model)
            # ... train this stage ...

    Args:
        config: path to a YAML recipe, or an already-parsed dict.
        user_modules: custom binarizer classes to register by class name
            (replaces the reference's globals-injection, bnn/engine.py:41-43).
    """

    def __init__(self, config, user_modules: List[Callable] = ()):  # noqa: D401
        for user_module in user_modules:
            registry.register(user_module)
        if isinstance(config, (str, bytes)):
            with open(config) as fh:
                raw = yaml.safe_load(fh)
        else:
            raw = config
        if not isinstance(raw, dict) or not raw:
            raise RecipeError(f"Recipe must be a non-empty mapping of steps, got {type(raw)}")
        self.config = [dict(raw[k]) for k in raw.keys()]
        self._validate()
        self.current_step = 0

    def _validate(self) -> None:
        for i, step in enumerate(self.config):
            step_norm = _normalize_keys(step)
            unknown = set(step_norm) - _KNOWN_STEP_KEYS
            if unknown:
                raise RecipeError(
                    f"step {i}: unknown keys {sorted(unknown)}; allowed keys are "
                    f"{sorted(_KNOWN_STEP_KEYS)}"
                )
            for slot in _SLOT_KEYS:
                if slot not in step_norm:
                    raise RecipeError(f"step {i}: missing required section '{slot}'")
                # build once to surface name/args problems eagerly
                _build_binarizer_factory(slot, step_norm[slot], f"step {i}")
            if "optimizer" in step_norm:
                _validate_optimizer_spec(step_norm["optimizer"], f"step {i}")
            if "lr_schedule" in step_norm:
                _validate_schedule_spec(step_norm["lr_schedule"], f"step {i}")
            if "epochs" in step_norm:
                try:
                    ep = int(step_norm["epochs"])
                except (TypeError, ValueError):
                    raise RecipeError(
                        f"step {i}: epochs must be an integer, got "
                        f"{step_norm['epochs']!r}") from None
                if ep <= 0:
                    raise RecipeError(f"step {i}: epochs must be positive")
            if "ignore_layer_names" in step_norm:
                _normalize_ignore_names(
                    step_norm["ignore_layer_names"], f"step {i}")

    def __len__(self) -> int:
        return len(self.config)

    def get_num_steps(self) -> int:
        return len(self)

    def run_step(self, model: nnx.Module, step: int, update: bool = False) -> nnx.Module:
        """Apply recipe step ``step`` to ``model`` (reference:
        bnn/engine.py:51-75)."""
        assert len(self) > step, f"step {step} out of range (recipe has {len(self)})"
        step_config = _normalize_keys(self.config[step])
        ignore_layer_names = _normalize_ignore_names(
            step_config.get("ignore_layer_names", []) or [], f"step {step}")

        bconfig = BConfig(
            activation_pre_process=_build_binarizer_factory(
                "pre_activation", step_config["pre_activation"], f"step {step}"),
            activation_post_process=_build_binarizer_factory(
                "post_activation", step_config["post_activation"], f"step {step}"),
            weight_pre_process=_build_binarizer_factory(
                "weight", step_config["weight"], f"step {step}"),
        )
        return prepare_binary_model(
            model, bconfig=bconfig, ignore_layers_name=list(ignore_layer_names),
            update=update,
        )

    def next(self, model: nnx.Module, update: bool = False) -> nnx.Module:
        # advance the counter only on SUCCESS — incrementing first meant
        # a failed step was silently skipped on retry
        out = self.run_step(model, self.current_step, update=update)
        self.current_step += 1
        return out

    # ------------------------------------------------------------------
    # Per-step training settings (TPU-native extension: the reference keeps
    # optimizer/scheduler choice in CLI flags, examples/imagenet.py:192-216;
    # here a recipe can carry them per step so a multi-stage run is fully
    # declarative).
    # ------------------------------------------------------------------

    def epochs(self, step: int) -> int:
        """Declared epoch budget for ``step`` (0 if the recipe doesn't say)."""
        return int(_normalize_keys(self.config[step]).get("epochs", 0))

    def make_tx(self, step: int, steps_per_epoch: int = 1):
        """Build the optax transform declared by ``step``'s ``optimizer`` /
        ``lr_schedule`` sections.

        The lr schedule is lowered over *optimizer steps* (epoch milestones ×
        ``steps_per_epoch``). Unlike the reference — which silently zeroes
        weight decay for every step after the first
        (examples/imagenet.py:192-204) — the recipe states ``weight_decay``
        explicitly per step; write ``weight_decay: 0`` in later steps to get
        the reference behavior.
        """
        step_norm = _normalize_keys(self.config[step])
        if "optimizer" not in step_norm:
            raise RecipeError(
                f"step {step} has no 'optimizer' section; add one to the "
                f"recipe or construct the optax transform yourself"
            )
        spec = _validate_optimizer_spec(step_norm["optimizer"], f"step {step}")
        lr = float(spec.get("lr", 1e-3))
        epochs = self.epochs(step) or 1
        sched = _validate_schedule_spec(
            step_norm["lr_schedule"], f"step {step}"
        ) if "lr_schedule" in step_norm else {"name": "constant"}
        lr_fn = _build_lr_schedule(lr, sched, epochs, steps_per_epoch)

        name = spec["name"]
        wd = float(spec.get("weight_decay", 0.0))
        if name == "sgd":
            tx = optax.sgd(lr_fn, momentum=float(spec.get("momentum", 0.0)),
                           nesterov=bool(spec.get("nesterov", False)))
            if wd:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
        elif name == "adamw":
            tx = optax.adamw(lr_fn, b1=float(spec.get("b1", 0.9)),
                             b2=float(spec.get("b2", 0.999)),
                             eps=float(spec.get("eps", 1e-8)),
                             weight_decay=wd)
        else:  # adam
            tx = optax.adam(lr_fn, b1=float(spec.get("b1", 0.9)),
                            b2=float(spec.get("b2", 0.999)),
                            eps=float(spec.get("eps", 1e-8)))
            if wd:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx

    def make_optimizer(self, model: nnx.Module, step: int,
                       steps_per_epoch: int = 1) -> nnx.Optimizer:
        """``nnx.Optimizer`` over ``model``'s params per ``step``'s recipe."""
        return nnx.Optimizer(model, self.make_tx(step, steps_per_epoch),
                             wrt=nnx.Param)
