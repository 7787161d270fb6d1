from .mesh import (
    make_mesh,
    shard_batch,
    shard_host_batch,
    replicate,
    shard_state,
    shard_model,
    shard_optimizer_zero1,
    DEFAULT_TP_RULES,
)
from .trainstep import make_train_step, make_eval_step
from .pipeline import (
    make_pipeline_mesh,
    stack_stage_states,
    make_stage_fn,
    shard_stacked_state,
    pipeline_apply,
)
from .hetero_pipeline import HeteroPipeline

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_host_batch",
    "replicate",
    "shard_state",
    "shard_model",
    "shard_optimizer_zero1",
    "DEFAULT_TP_RULES",
    "make_train_step",
    "make_eval_step",
    "make_pipeline_mesh",
    "HeteroPipeline",
    "stack_stage_states",
    "make_stage_fn",
    "shard_stacked_state",
    "pipeline_apply",
]
