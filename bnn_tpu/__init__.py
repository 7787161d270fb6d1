"""bnn_tpu — a TPU-native binary-neural-network framework.

Ground-up JAX/XLA/Pallas re-design with the full capability surface of the
reference PyTorch framework (`1adrianb/binary-networks-pytorch`): pluggable
binarizers with straight-through estimators, config-driven model
transformation, progressive YAML binarization recipes, a BNN-adapted model
zoo — plus the bitpacked XNOR inference engine the reference explicitly does
not include (reference README.md:22).
"""

__version__ = "0.1.0"

from .bconfig import BConfig
from .ops.binarizers import Identity
from .binarize import (
    DEFAULT_MODULE_MAPPING,
    named_modules,
    get_modules_to_binarize,
    swap_modules_by_name,
    prepare_binary_model,
)
from .engine import BinaryChef, RecipeError
from . import functional
from . import nn
from . import ops
from . import layers
from . import models
from . import kernels
from . import inference
from . import parallel
from . import utils
from . import data

__all__ = [
    "BConfig",
    "Identity",
    "DEFAULT_MODULE_MAPPING",
    "named_modules",
    "get_modules_to_binarize",
    "swap_modules_by_name",
    "prepare_binary_model",
    "BinaryChef",
    "RecipeError",
    "functional",
    "nn",
    "ops",
    "layers",
    "models",
    "kernels",
    "inference",
    "parallel",
    "utils",
    "data",
]
