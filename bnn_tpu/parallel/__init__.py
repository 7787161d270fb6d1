from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_state,
    shard_model,
    DEFAULT_TP_RULES,
)
from .trainstep import make_train_step, make_eval_step

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "shard_state",
    "shard_model",
    "DEFAULT_TP_RULES",
    "make_train_step",
    "make_eval_step",
]
