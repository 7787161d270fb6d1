"""Whole-stage fusion pass for small-batch serving.

Replaces a ResNet stage (``model.layerN``, an ``nn.Sequential`` of two
deployed BasicBlocks) with ONE Pallas megakernel dispatch
(kernels/model.py): a stride-1 pair (layer1) via :func:`fused_pair`, a
downsample + stride-1 pair (layer2/3/4) via :func:`fused_down_stage`.

Measured on v5e (B=1 binary ResNet-18, HONEST ternary config — early
round-3 policy numbers taken on the degenerate zero_to_one+ReLU model
are void, see megablock.py's measurement warning): fusing ALL stages
wins decisively — 62-63 us vs 159 with only the pair stage fused and
236 fully unfused — so ``Predictor`` applies ``fuse_stages()`` (all
kinds) before ``fuse_blocks``. Honest per-prefix decomposition of the
63 us: stem 18.8, layer1 +8.3, layer2 +12.2, layer3 +12.0, layer4 +9.2,
pool+fc +2.5. The remaining floor is structural: each stage kernel
carries ~5 us of fixed dispatch cost, and stages cannot merge further
because a mid-chain stride-2 block would need the in-kernel W-pair
lane merge Mosaic rejects in every formulation probed (2-D and 3-D
phase-slice concats both fail to compile).

Apply after :func:`~bnn_tpu.inference.deploy` +
:func:`~bnn_tpu.inference.optimize.optimize_deployed`, before
:func:`~bnn_tpu.inference.megablock.fuse_blocks` — stages this pass takes
are whole Sequentials, so the per-block pass never sees them. Each
:class:`FusedStage` keeps the original Sequential (same weight arrays)
for the large-batch fallback and checkpoint round-trips.
"""
from __future__ import annotations

from flax import nnx

from ..binarize import named_modules, set_module_by_name
from ..kernels.model import BlockParams, fused_chain, fused_stem_chain
from ..models.layers import BasicBlock, PreBasicBlock
from .. import nn
from .megablock import (
    _act_kind,
    _conv_weight_int8,
    _eligible,
    _eligible_down,
    _eligible_pre,
)

__all__ = ["FusedStage", "FusedEntry", "fuse_stages", "fuse_head",
           "fuse_entry"]


def _thr(conv):
    return conv.threshold[...] if conv.threshold is not None else None


def _slope(act):
    _, s = _act_kind(act)
    return s[...] if s is not None else None


def _basic_params(block) -> BlockParams:
    return BlockParams(
        "basic",
        _conv_weight_int8(block.conv1),
        _conv_weight_int8(block.conv2),
        scale1=block.conv1.scale[...], add1=block.conv1.add[...],
        prelu1=_slope(block.act1),
        scale2=block.conv2.scale[...], add2=block.conv2.add[...],
        prelu2=_slope(block.act2),
        threshold=_thr(block.conv1), threshold2=_thr(block.conv2))


def _down_params(block) -> BlockParams:
    dconv = block.downsample[1]
    return BlockParams(
        "down",
        _conv_weight_int8(block.conv1),
        _conv_weight_int8(block.conv2),
        wd=_conv_weight_int8(dconv).reshape(block.conv1.in_channels, -1),
        scale1=block.conv1.scale[...], add1=block.conv1.add[...],
        prelu1=_slope(block.act1),
        scale2=block.conv2.scale[...], add2=block.conv2.add[...],
        prelu2=_slope(block.act2),
        scaled=dconv.scale[...], addd=dconv.add[...],
        threshold=_thr(block.conv1), threshold2=_thr(block.conv2),
        thresholdd=_thr(dconv))


class FusedStage(nnx.Module):
    """One-kernel execution of a whole deployed ResNet stage (small batch;
    images unroll inside the kernel — measured ~10% over the per-block
    path at B=2-4 on v5e, honest config).

    The kernel-layout parameter arrays (tap-reordered weights, stacked
    epilogue rows) are PRECOMPUTED here and stored as Variables — building
    them per call would put ~15 XLA glue ops (including _transform_w1's
    6-D transpose) between the stage kernels on every forward. The
    original Sequential is kept (same underlying deployed arrays) for the
    large-batch fallback; note the precomputed copies are snapshots — re-
    deploy after mutating the underlying deployed layers.
    """

    def __init__(self, stage, *, kind: str, pre: bool = False,
                 max_fused_batch: int = 4, interpret: bool = False):
        assert kind in ("pair", "down")
        self.stage = stage  # original Sequential (same arrays; fallback)
        self.kind = kind
        self.pre = pre
        # the chain kernel unrolls images in-kernel and hard-caps at 8
        # (kernels/model.py fused_chain) — clamp so a larger requested cap
        # falls back instead of tripping the kernel's assert at trace time
        self.max_fused_batch = min(max_fused_batch, 8)
        self.interpret = interpret
        bps = [(_down_params if kind == "down" and i == 0 else
                _basic_params)(b) for i, b in enumerate(stage)]
        self._params_v = nnx.data([
            [nnx.Variable(a) for a in bp.arrays()] for bp in bps])
        self._metas = [(bp.kind, bp.ci, bp.co) for bp in bps]
        # capture act/sign metadata now: the fallback Sequential's blocks
        # may later be wrapped by fuse_blocks (per-block megakernels for
        # batches above this stage's cap), hiding the raw block attrs
        b0 = stage[0]
        self._acts = (_act_kind(b0.act1)[0], _act_kind(b0.act2)[0])
        self._z21 = getattr(b0.conv1, "zero_to_one", False)
        # optional fused classifier head (attach_head)
        self._head = nnx.data(None)
        self._wfc = nnx.data(None)
        self._bfc = nnx.data(None)

    def attach_head(self, avgpool, fc) -> None:
        """Fuse the trailing global-avgpool + float fc into this stage's
        kernel (the last residual stage of a classifier). The original
        modules are kept for the above-cap fallback path."""
        self._head = nnx.data([avgpool, fc])
        self._wfc = nnx.data(nnx.Variable(fc.kernel[...]))
        self._bfc = nnx.data(nnx.Variable(fc.bias[...])
                             if fc.bias is not None else None)

    def _params(self):
        return [BlockParams.from_arrays(meta, [v[...] for v in vs])
                for meta, vs in zip(self._metas, self._params_v)]

    def __call__(self, x):
        n, h, w, _ = x.shape
        if n > self.max_fused_batch or h % 2 or w % 2:
            # fallback Sequential: blocks may themselves be FusedBlock
            # megakernels (fuse_blocks runs after fuse_stages)
            y = self.stage(x)
            if self._head is not None:
                avgpool, fc = self._head
                y = fc(avgpool(y).reshape(y.shape[0], -1))
            return y
        if self._head is not None:
            return fused_chain(
                x, self._params(), self._wfc[...],
                self._bfc[...] if self._bfc is not None else None,
                act=self._acts, pre=self.pre, zero_to_one=self._z21,
                interpret=self.interpret)
        return fused_chain(
            x, self._params(),
            act=self._acts, pre=self.pre, zero_to_one=self._z21,
            out_dtype=x.dtype, interpret=self.interpret)


# all of a stage's weights must be VMEM-resident alongside its activations
# and patch buffers for the whole kernel (~16 MB/core). ResNet-18's layer4
# (8.4 MB + 7^2 activations) compiles and runs; a ResNet-34 layer4
# (~13 MB) does not fit and stays on the per-block path.
_MAX_STAGE_WEIGHT_BYTES = 10 << 20


def _stage_weight_bytes(seq) -> int:
    total = 0
    for b in seq:
        for conv in ([b.conv1, b.conv2]
                     + ([b.downsample[1]] if b.downsample is not None else [])):
            total += 9 * conv.in_channels * conv.out_channels  # int8 upper bd
    return total


def _stage_eligible(seq) -> str:
    """'' | 'pair' | 'down' (+ 'pre-' prefix) for a candidate Sequential.

    A stage is a leading (optionally downsample) block followed by any
    number of stride-1 blocks — ResNet-18's pairs and ResNet-34's 3-6
    block stages alike.
    """
    if not isinstance(seq, nn.Sequential) or len(seq) < 2:
        return ""
    blocks = list(seq)
    if not all(isinstance(b, (BasicBlock, PreBasicBlock)) for b in blocks):
        return ""
    if len({type(b) for b in blocks}) != 1:
        return ""
    pre = isinstance(blocks[0], PreBasicBlock)
    # the chain kernel applies BLOCK 0's act kinds and sign convention to
    # every block — a heterogeneous stage must not fuse (it would silently
    # compute wrong outputs, not error)
    sig0 = (_act_kind(blocks[0].act1)[0], _act_kind(blocks[0].act2)[0],
            getattr(blocks[0].conv1, "zero_to_one", False))
    for b in blocks[1:]:
        if b.downsample is not None:
            return ""
        if not (_eligible_pre(b) if pre else _eligible(b)):
            return ""
        sig = (_act_kind(b.act1)[0], _act_kind(b.act2)[0],
               getattr(b.conv1, "zero_to_one", False))
        if sig != sig0 or getattr(b.conv2, "zero_to_one", False) != sig0[2]:
            return ""
    if getattr(blocks[0].conv2, "zero_to_one", False) != sig0[2]:
        return ""
    if blocks[0].downsample is not None and getattr(
            blocks[0].downsample[1], "zero_to_one", None) not in (None,
                                                                  sig0[2]):
        return ""
    if _stage_weight_bytes(seq) > _MAX_STAGE_WEIGHT_BYTES:
        return ""
    b0 = blocks[0]
    if b0.downsample is None:
        ok0 = _eligible_pre(b0) if pre else _eligible(b0)
        return ("pre-pair" if pre else "pair") if ok0 else ""
    if _eligible_down(b0):
        return "pre-down" if pre else "down"
    return ""


def fuse_stages(model: nnx.Module, *, max_fused_batch: int = 4,
                kinds=("pair", "down"), interpret: bool = False) -> int:
    """Replace eligible whole stages with :class:`FusedStage` (in place).

    Returns the number of stages fused. Remaining individual blocks can
    still be taken by :func:`~bnn_tpu.inference.megablock.fuse_blocks`
    afterwards. ``kinds`` restricts which stage shapes fuse — e.g.
    ``("pair",)`` fuses only the stride-1 pair (layer1) and leaves the
    downsample stages to the per-block pass/XLA.
    """
    fused = 0
    done = []
    for name, m in list(named_modules(model)):
        if isinstance(m, FusedStage):
            done.append(name + ".")
            continue
        if any(name.startswith(p) for p in done):
            continue
        kind = _stage_eligible(m)
        if not kind or kind.replace("pre-", "") not in kinds:
            continue
        pre = kind.startswith("pre-")
        set_module_by_name(model, name, FusedStage(
            m, kind=kind.replace("pre-", ""), pre=pre,
            max_fused_batch=max_fused_batch, interpret=interpret))
        done.append(name + ".")
        fused += 1
    return fused


class FusedEntry(nnx.Module):
    """The network ENTRY — float stem AND the stride-1 layer1 stage — as
    ONE dispatch (:func:`~bnn_tpu.kernels.model.fused_stem_chain`).

    The stem→layer1 junction is the only one that can merge past the
    five-dispatch structure (every other boundary enters a stride-2 stage,
    whose W-pair merge Mosaic rejects in-kernel). Measured on v5e, binary
    R18, B=1: stem+pair in isolation 33.0us split → 31.5us merged, but at
    the WHOLE-MODEL level the difference is inside the run-to-run noise
    (~62us either way, 5 interleaved A/B rounds) — TPU dispatches have no
    launch overhead and the stem output's HBM round trip is <1us, so the
    five-dispatch pipeline was already at its floor. Hence this is an
    OPT-IN (``fuse_entry`` after the standard passes), not a Predictor
    default; it exists to settle the "merge further?" question with a
    measurement and to serve as the template if a bigger-VMEM part makes
    whole-trunk fusion viable. Bit-exact with the split pipeline: the
    kernel rounds the stem activation to the serving dtype at the same
    point the split kernel boundary would. Holds the original
    :class:`~bnn_tpu.inference.stem.FusedStem` and :class:`FusedStage`
    (same arrays) for the above-cap / odd-geometry fallback.
    """

    def __init__(self, stem, stage: FusedStage):
        self.stem = stem
        self.stage = stage

    def __call__(self, x):
        n, h, w, _ = x.shape
        if (n <= self.stage.max_fused_batch and h % 16 == 0 and w % 8 == 0):
            inner = self.stem._inner()
            bias = inner.bias[...] if inner.bias is not None else None
            return fused_stem_chain(
                x, inner.kernel[...], bias, self.stage._params(),
                act=self.stage._acts, pre=self.stage.pre,
                zero_to_one=self.stage._z21, out_dtype=x.dtype,
                interpret=self.stage.interpret)
        return self.stage(self.stem(x))


def fuse_entry(model: nnx.Module) -> int:
    """Merge a fused stem with the fused stride-1 layer1 that follows it
    (in place); apply AFTER :func:`~bnn_tpu.inference.stem.fuse_stem` and
    :func:`fuse_stages`. Returns the number of entries merged."""
    from ..models.resnet import ResNet
    from .stem import FusedStem

    fused = 0
    for _, m in named_modules(model):
        if not isinstance(m, ResNet):
            continue
        stem, stage = getattr(m, "conv1", None), getattr(m, "layer1", None)
        if not (isinstance(stem, FusedStem) and isinstance(stage, FusedStage)):
            continue  # also makes the pass idempotent: a merged entry is
            # a FusedEntry, not a FusedStem
        if stage.kind != "pair" or stage._head is not None:
            continue
        if stage._metas[0][1] != stem._inner().out_channels:
            continue
        m.conv1 = FusedEntry(stem, stage)
        m.layer1 = nn.Identity()
        fused += 1
    return fused


def fuse_head(model: nnx.Module) -> int:
    """Fuse a classifier's global-avgpool + float fc into the preceding
    :class:`FusedStage`'s kernel (in place).

    Applies to the ResNet-style tail ``layer4 -> AdaptiveAvgPool2d(1) ->
    Flatten-equivalent -> float Linear`` after :func:`fuse_stages`. The
    model's ``avgpool``/``fc`` are replaced with identities; the stage
    kernel emits logits directly (and its fallback applies the originals).
    Skipped when the head is not a plain float Linear (e.g. after
    ``quantize_float_layers``). Returns the number of heads fused.
    """
    from ..models.resnet import ResNet

    fused = 0
    for _, m in named_modules(model):
        if not isinstance(m, ResNet):
            continue
        stage = getattr(m, "layer4", None)
        if not isinstance(stage, FusedStage) or stage._head is not None:
            continue
        if not isinstance(m.avgpool, nn.AdaptiveAvgPool2d):
            continue
        out_size = getattr(m.avgpool, "output_size", 1)
        if out_size not in (1, (1, 1)):
            continue
        if type(m.fc) is not nn.Linear:
            continue
        stage.attach_head(m.avgpool, m.fc)
        m.avgpool = nn.Identity()
        m.fc = nn.Identity()
        fused += 1
    return fused
