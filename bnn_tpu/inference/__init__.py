from .serving import Predictor
from .batching import BatcherStats, ContinuousBatcher
from .megablock import FusedBlock, default_fuse_predicate, fuse_blocks
from .optimize import fold_bn_after, fold_bn_before, optimize_deployed
from .compress import (
    QuantizedConv,
    QuantizedLinear,
    quantize_float_layers,
    state_bytes,
)
from .stem import FusedStem, SpaceToDepthConv, fuse_stem, space_to_depth_stem
from .stages import (FusedEntry, FusedStage, fuse_entry, fuse_head,
                     fuse_stages)
from .deploy import (
    DeployedConv,
    DeployedLinear,
    deploy,
    model_weight_bytes,
    packed_weight_bytes,
    set_gemm_impl,
)
from .export import ExportedServer, export_serving, load_serving
from .tp import shard_tp_state, tag_tensor_parallel, tp_state_specs
from .tp_packed import (
    PackedTPLayer,
    ici_bytes_per_layer,
    pack_chain_weights,
    packed_tp_chain,
)

__all__ = [
    "PackedTPLayer",
    "pack_chain_weights",
    "packed_tp_chain",
    "ici_bytes_per_layer",
    "Predictor",
    "ContinuousBatcher",
    "BatcherStats",
    "ExportedServer",
    "export_serving",
    "load_serving",
    "FusedStem",
    "fuse_stem",
    "SpaceToDepthConv",
    "space_to_depth_stem",
    "FusedBlock",
    "FusedStage",
    "FusedEntry",
    "fuse_entry",
    "default_fuse_predicate",
    "fuse_blocks",
    "fuse_stages",
    "fuse_head",
    "optimize_deployed",
    "fold_bn_after",
    "fold_bn_before",
    "QuantizedConv",
    "QuantizedLinear",
    "quantize_float_layers",
    "state_bytes",
    "DeployedConv",
    "DeployedLinear",
    "deploy",
    "model_weight_bytes",
    "packed_weight_bytes",
    "tag_tensor_parallel",
    "tp_state_specs",
    "shard_tp_state",
    "set_gemm_impl",
]
