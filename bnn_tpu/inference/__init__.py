from .deploy import (
    DeployedConv,
    DeployedLinear,
    deploy,
    model_weight_bytes,
    packed_weight_bytes,
)

__all__ = [
    "DeployedConv",
    "DeployedLinear",
    "deploy",
    "model_weight_bytes",
    "packed_weight_bytes",
]
