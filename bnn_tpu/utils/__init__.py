from .meters import AverageMeter, ProgressMeter, accuracy, count_parameters
from .checkpoint import (save_checkpoint, load_checkpoint, restore_into,
                         optimizer_state_dict, restore_optimizer,
                         gather_replicated)
from .torch_import import (load_torch_file, torch_to_state_dict,
                           import_torch_checkpoint)
from .flops import OpCount, count_ops
from .precision import cast_floats
from .cache import enable_compilation_cache
from .profiling import compiled_stats, trace
from .timing import loop_time
from .debug import assert_finite, checkify_errors, debug_nans

__all__ = [
    "assert_finite",
    "checkify_errors",
    "debug_nans",
    "AverageMeter",
    "ProgressMeter",
    "accuracy",
    "count_parameters",
    "save_checkpoint",
    "load_checkpoint",
    "gather_replicated",
    "optimizer_state_dict",
    "restore_optimizer",
    "restore_into",
    "load_torch_file",
    "torch_to_state_dict",
    "import_torch_checkpoint",
    "OpCount",
    "count_ops",
    "cast_floats",
    "enable_compilation_cache",
    "compiled_stats",
    "trace",
    "loop_time",
]
