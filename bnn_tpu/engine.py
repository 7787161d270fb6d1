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

from typing import Any, Callable, Dict, List

import yaml
from flax import nnx

from .bconfig import BConfig
from .binarize import prepare_binary_model
from .ops import registry

__all__ = ["BinaryChef", "RecipeError"]

_SLOT_KEYS = ("pre_activation", "post_activation", "weight")
_KNOWN_STEP_KEYS = set(_SLOT_KEYS) | {"ignore_layer_names"}


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
        return cls.with_args(**args)
    return cls


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

    def __len__(self) -> int:
        return len(self.config)

    def get_num_steps(self) -> int:
        return len(self)

    def run_step(self, model: nnx.Module, step: int, update: bool = False) -> nnx.Module:
        """Apply recipe step ``step`` to ``model`` (reference:
        bnn/engine.py:51-75)."""
        assert len(self) > step, f"step {step} out of range (recipe has {len(self)})"
        step_config = _normalize_keys(self.config[step])
        ignore_layer_names = step_config.get("ignore_layer_names", []) or []

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
        self.current_step += 1
        return self.run_step(model, self.current_step - 1, update=update)
