"""Deployment-time graph optimizations.

Inference-graph rewrites applied after :func:`~bnn_tpu.inference.deploy`,
eliminating whole elementwise passes over the activations (each saved pass
is a full HBM read+write of the feature map):

1. **BN-after fold** (post-activation nets: ``conv -> bn``): an eval-mode
   BatchNorm is a per-channel affine, so it composes into the deployed
   layer's ``(scale, add)`` epilogue; the BN module is replaced by Identity.
   Also applied to FLOAT convs (e.g. the fp32 stem): BN folds into the conv
   kernel and bias directly.

2. **BN-before threshold fold** (pre-activation nets: ``bn -> conv`` with a
   binarized input): ``sign(gamma * (x - mean)/sigma + beta)`` equals
   ``flip_c * (x_c >= tau_c ? 1 : -1)`` with per-channel threshold
   ``tau = mean - beta * sigma / gamma`` and ``flip = sign(gamma)``. The
   flip folds into the packed weights (multiply in-channel slices), the
   threshold becomes the deployed conv's sign threshold — the classic BNN
   deployment identity that removes BatchNorm from the binary path entirely.

Patterns are matched structurally: adjacent pairs inside
:class:`bnn_tpu.nn.Sequential` and the conv/bn attribute pairs of the zoo's
residual blocks.
"""
from __future__ import annotations


import jax.numpy as jnp
from flax import nnx

from .. import nn
from ..binarize import named_modules
from ..kernels.packing import pack_bits, unpack_bits
from ..models.layers import (
    BasicBlock,
    Bottleneck,
    PreBasicBlock,
    PreBottleneck,
)
from ..models.resnet import ResNet
from .deploy import DeployedConv, DeployedLinear

__all__ = ["optimize_deployed", "fold_bn_after", "fold_bn_before"]


def _bn_affine(bn: nn.BatchNorm2d):
    """Return (a, b) such that eval-mode bn(x) == a * x + b per channel."""
    mean = bn.mean[...]
    var = bn.var[...]
    inv = 1.0 / jnp.sqrt(var + bn.epsilon)
    gamma = bn.scale[...] if bn.use_scale else jnp.ones_like(mean)
    beta = bn.bias[...] if bn.use_bias else jnp.zeros_like(mean)
    return gamma * inv, beta - mean * gamma * inv


def fold_bn_after(layer, bn: nn.BatchNorm2d) -> bool:
    """Fold ``bn(layer(x))`` into ``layer``; returns True on success."""
    if not isinstance(bn, nn.BatchNorm2d) or not bn.use_running_average:
        return False
    a, b = _bn_affine(bn)
    if isinstance(layer, (DeployedConv, DeployedLinear)):
        if layer.spatial_post is not None:
            return False  # XNORScale between conv and bn: not affine-safe
        if a.shape[0] != layer.scale[...].shape[-1]:
            return False  # container adjacency != data-flow adjacency
        layer.scale[...] = layer.scale[...] * a
        layer.add[...] = layer.add[...] * a + b
        return True
    if isinstance(layer, (nn.Conv1d, nn.Conv2d, nn.Linear)) and \
            type(layer).__module__ == "bnn_tpu.nn":
        if a.shape[0] != layer.kernel[...].shape[-1]:
            return False  # container adjacency != data-flow adjacency
        # float layer: scale kernel out-channels, adjust bias
        layer.kernel[...] = layer.kernel[...] * a
        if layer.bias is not None:
            layer.bias[...] = layer.bias[...] * a + b
        else:
            # bias was None (a static attr); mark the new Param as data
            layer.bias = nnx.data(nnx.Param(b))
        return True
    return False


def fold_bn_before(bn: nn.BatchNorm2d, conv: "DeployedConv") -> bool:
    """Fold ``conv(sign(bn(x)))`` into a thresholded sign + weight flips."""
    if not isinstance(conv, DeployedConv) or not isinstance(bn, nn.BatchNorm2d):
        return False
    if not bn.use_running_average:
        return False
    if getattr(conv, "threshold", None) is not None:
        return False  # already folded
    if conv.spatial_post is not None:
        return False  # XNORScale reads the raw layer input; fold changes it
    a, b = _bn_affine(bn)
    if a.shape[0] != conv.in_channels:
        # container adjacency is not data-flow adjacency: e.g. a BATS cell
        # holds bn(C_cell) next to a conv that consumes a channel slice /
        # different width — folding would scale channels the conv never
        # sees. Only fold when the BN feeds the conv's full input.
        return False
    # sign(a x + b): threshold tau = -b / a, output flipped where a < 0.
    # Guard exact zeros in a (degenerate BN channel).
    a_safe = jnp.where(a == 0, 1e-12, a)
    tau = -b / a_safe
    flip = jnp.where(a >= 0, 1, -1).astype(jnp.int8)  # per in-channel

    def _conv_layout_flip(w, dtype):
        """Flip factor for (*spatial, I, O) kernels. groups==1: axis -2
        IS the in-channel axis. Grouped convs (BATS sep/dil convs): the
        kernel's I axis is C_in/groups wide and out-channel block g
        consumes input channels [g*I, (g+1)*I) — the flip is a 2D (I, O)
        map, flip[(o // (O/groups)) * I + i]."""
        if conv.groups == 1:
            return flip.astype(dtype)[:, None]
        I, O = w.shape[-2], w.shape[-1]
        per_g = O // conv.groups
        f = flip.reshape(conv.groups, I)            # (G, I)
        f = jnp.repeat(f[:, None, :], per_g, axis=1)  # (G, O/G, I)
        return f.reshape(O, I).T.astype(dtype)      # (I, O), o group-major

    if conv.mode in ("conv", "pallas-conv") and conv.weight_format == "int8":
        # only conv-layout int8 stores literal +/-1 weights; GEMM-mode
        # convs store bit-packed u32 REGARDLESS of weight_format
        # (deploy.py: "GEMM paths need the patch-extraction order") and
        # must take the unpack/repack path below
        w = conv.w_packed[...]
        conv.w_packed[...] = w * _conv_layout_flip(w, w.dtype)
    else:
        w = unpack_bits(conv.w_packed[...], conv.k, axis=-2, dtype=jnp.float32)
        w = w[..., : conv.k, :]
        if conv.mode in ("conv", "pallas-conv"):
            fk = _conv_layout_flip(w, jnp.float32)
        else:
            # GEMM/im2col layout: the K axis is channel-MAJOR (I, *taps)
            # — repeat each channel's flip across its filter positions.
            # Grouped convs never take this path (deploy.py forces
            # mode='conv' for groups != 1).
            fk = jnp.repeat(flip, conv.k // flip.shape[0]).astype(
                jnp.float32)[:, None]
        w = w * fk
        # repack: flipped zeros cannot appear (w is +/-1 here)
        conv.w_packed[...] = pack_bits(w, axis=-2)
    conv.threshold = nnx.data(nnx.Variable(tau.astype(jnp.float32)))
    return True


def _fold_in_sequential(seq: nn.Sequential) -> int:
    folded = 0
    n = len(seq)
    for i in range(n - 1):
        a, b = seq[i], seq[i + 1]
        if isinstance(b, nn.BatchNorm2d) and fold_bn_after(a, b):
            seq[i + 1] = nn.Identity()
            folded += 1
        elif isinstance(a, nn.BatchNorm2d) and isinstance(b, DeployedConv):
            if fold_bn_before(a, b):
                seq[i] = nn.Identity()
                folded += 1
    return folded


def _fold_in_postact_block(block) -> int:
    folded = 0
    for ci, bi in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
        conv = getattr(block, ci, None)
        bn = getattr(block, bi, None)
        if conv is not None and bn is not None and fold_bn_after(conv, bn):
            setattr(block, bi, nn.Identity())
            folded += 1
    return folded


def _fold_in_preact_block(block) -> int:
    folded = 0
    for bi, ci in (("bn1", "conv1"), ("bn2", "conv2"), ("bn3", "conv3")):
        bn = getattr(block, bi, None)
        conv = getattr(block, ci, None)
        if bn is not None and conv is not None and fold_bn_before(bn, conv):
            setattr(block, bi, nn.Identity())
            folded += 1
    return folded


def optimize_deployed(model: nnx.Module) -> int:
    """Apply all safe folds in place; returns the number of BNs eliminated."""
    folded = 0
    for _, m in named_modules(model):
        if isinstance(m, nn.Sequential):
            folded += _fold_in_sequential(m)
        elif isinstance(m, (BasicBlock, Bottleneck)):
            folded += _fold_in_postact_block(m)
        elif isinstance(m, (PreBasicBlock, PreBottleneck)):
            # NB: HBlock is excluded — it has an activation between bn and
            # conv, which breaks the threshold identity for non-monotone /
            # zero-clamping activations (ReLU)
            folded += _fold_in_preact_block(m)
        elif isinstance(m, ResNet) and m.stem_type == "basic":
            if isinstance(getattr(m, "bn1", None), nn.BatchNorm2d) \
                    and fold_bn_after(m.conv1, m.bn1):
                m.bn1 = nn.Identity()
                folded += 1
    return folded
