"""Whole-stage megakernels for B=1 serving (Pallas TPU).

Round-2 measurements (ROADMAP round-3 #1) showed the remaining B=1 cost of
a deployed binary ResNet-18 is not any single op but the *boundary tax* of
chaining ~10 dispatches (stem kernel + 8 block kernels + pool/fc): chained
stages run up to 2x their isolated times as XLA loses VMEM pinning between
them. At B=1 each stage's intermediates fit VMEM simultaneously, so this
module fuses whole RESIDUAL STAGES into flat kernels:

- :func:`fused_pair`: two stride-1 blocks (layer1) in one kernel;
- :func:`fused_down_stage`: a stride-2 downsample block + the following
  stride-1 block (layer2/3/4) in one kernel, optionally with the global
  avgpool + float fc head fused in (layer4).

With the existing stem kernel (kernels/stem.py) a binary ResNet-18 is FIVE
dispatches (stem, layer1, layer2, layer3, layer4+head) instead of ~10.
A single whole-trunk kernel was tried and hit two hard walls: layer4's
8.4 MB of int8 weights cannot be VMEM-resident alongside layer1's wide
activations (~16 MB/core), and Mosaic rejects the in-kernel W-pair merge
a mid-kernel stride-2 stage needs (the phase-slice concat
``(H, W/2, 2, C) -> lanes`` interleaves inside vregs — "Invalid relayout";
with two trailing dims, as in the stem's H-merge, it is fine). So stage
inputs cross HBM once per stage (< 1 us total at these sizes) and each
stride-2 stage takes its input pre-W-merged (``(H, W/2, 2C)``, a free XLA
relayout), exactly like kernels/strided_block.py.

No fori wrappers — flat unrolled code (fori+pallas hangs the remote Mosaic
compiler, ROADMAP 2c). Numerics are identical to the unfused deployed
graph: signs with per-channel thresholds and either sign(0) convention,
exact int8 MXU accumulation, f32 epilogues.

The reference framework has no execution layer at all (reference
README.md:22); this is part of the serving runtime it lacks.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block import _ACTS, _apply_act
from .strided_block import _sign_i8, _transform_w1

__all__ = ["BlockParams", "fused_chain", "fused_pair", "fused_down_stage",
           "fused_stem_chain", "fused_pair_reference",
           "fused_down_stage_reference", "fused_chain_reference",
           "fused_stem_chain_reference"]



# ONE copy of the in-kernel sign (the most delicate invariant here —
# sign(0) convention): shared with the strided-block kernel
_sgn_i8 = _sign_i8


def _conv3x3(xs, w2d):
    """3x3/s1/p1 conv over a whole ``(H, W, C)`` +/-1 int8 image in VMEM.

    Full implicit GEMM: ONE dot of K = 9C over all shifted slabs
    concatenated on lanes (the taps_per_dot=9 configuration the per-block
    kernel measured fastest). Returns ``(H*W, Co)`` int32.
    """
    h, w, c = xs.shape
    xp = jnp.pad(xs, ((1, 1), (1, 1), (0, 0)))
    m = h * w
    slab = jnp.concatenate(
        [xp[dy:dy + h, dx:dx + w, :].reshape(m, c)
         for dy in range(3) for dx in range(3)], axis=-1)
    return lax.dot_general(slab, w2d,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def _basic_body(x, w1, w2, prm, *, act1, act2, pre, z21):
    """Whole-image stride-1 BasicBlock body: ``(H, W, C)`` f32 -> same."""
    h, w, c = x.shape
    s1, a1, p1 = prm[0:1], prm[1:2], prm[2:3]
    s2, a2, p2, thr, thr2 = prm[3:4], prm[4:5], prm[5:6], prm[6:7], prm[7:8]

    xs = _sgn_i8(x.reshape(h * w, c), thr, z21).reshape(h, w, c)
    y1 = _apply_act(_conv3x3(xs, w1).astype(jnp.float32) * s1 + a1, act1, p1)
    hs = _sgn_i8(y1, thr2, z21).reshape(h, w, c)
    y2 = _conv3x3(hs, w2).astype(jnp.float32) * s2 + a2
    xf = x.reshape(h * w, c)
    out = (_apply_act(y2, act2, p2) + xf) if pre else _apply_act(y2 + xf,
                                                                 act2, p2)
    return out.reshape(h, w, c)


def _down_body(xw, w1s, w2, wd, po, pi, *, act1, act2, pre, z21, ci):
    """Stride-2 BasicBlock body over a pre-W-merged ``(H, W/2, 2C)`` input.

    The H-pair merge happens here via a major-dim phase reshape + lane
    concat (two trailing dims — the layout Mosaic accepts, same as
    kernels/strided_block.py). Returns ``(H/2, W/2, Co)`` f32.
    """
    h, w2w, _ = xw.shape
    h2 = h // 2
    co = wd.shape[-1]
    s1, a1, p1 = po[0:1], po[1:2], po[2:3]
    s2, a2, p2 = po[3:4], po[4:5], po[5:6]
    sd, ad, thr2 = po[6:7], po[7:8], po[8:9]
    thr1 = pi[0:1]           # (1, 4*ci) tiled
    thrd = pi[1:2, :ci]      # (1, ci)

    # H-pair merge: (H, W/2, 2C) -> (H/2, W/2, 4C), lane order (di, dj, c)
    v = xw.reshape(h2, 2, w2w, 2 * ci)
    xm = jnp.concatenate([v[:, 0], v[:, 1]], axis=-1)

    xs = _sgn_i8(xm.reshape(h2 * w2w, 4 * ci), thr1, z21).reshape(
        h2, w2w, 4 * ci)
    # conv1 (s2d 2x2, pad (1, 0) both dims): tap (ki, kj) reads s2d
    # position (i - 1 + ki, j - 1 + kj)
    xsp = jnp.pad(xs, ((1, 0), (1, 0), (0, 0)))
    m1 = h2 * w2w
    slabs = [xsp[ki:ki + h2, kj:kj + w2w, :].reshape(m1, 4 * ci)
             for ki in range(2) for kj in range(2)]
    acc1 = lax.dot_general(jnp.concatenate(slabs, axis=-1), w1s,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)
    y1 = _apply_act(acc1.astype(jnp.float32) * s1 + a1, act1, p1)
    hs = _sgn_i8(y1, thr2, z21).reshape(h2, w2w, co)
    y2 = _conv3x3(hs, w2).astype(jnp.float32) * s2 + a2

    # shortcut: avgpool2x2/s2 = mean of the 4 s2d phase groups.
    # Boundary caveat: this left-associated f32 sum can round differently
    # than XLA's reduce_window on the unfused path; when the pooled value
    # sits EXACTLY on the following sign threshold (possible on
    # mixed-sign activations, e.g. PReLU nets — binary activations have
    # 0-atoms) the sign may differ. Bit-exactness vs the unfused graph
    # holds away from those measure-atoms; the standard ReLU configs the
    # suite pins bit-exactly never produce them here.
    avg = 0.25 * (xm[:, :, :ci] + xm[:, :, ci:2 * ci]
                  + xm[:, :, 2 * ci:3 * ci] + xm[:, :, 3 * ci:])
    dsig = _sgn_i8(avg.reshape(m1, ci), thrd, z21)
    accd = lax.dot_general(dsig, wd,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)
    ds = accd.astype(jnp.float32) * sd + ad

    out = (_apply_act(y2, act2, p2) + ds) if pre else _apply_act(y2 + ds,
                                                                 act2, p2)
    return out.reshape(h2, w2w, co)


def _rows(vals, widths):
    out = []
    for v, (default, width) in zip(vals, widths):
        v = jnp.asarray(default if v is None else v, jnp.float32).reshape(-1)
        out.append(jnp.broadcast_to(v, (width,)))
    return jnp.stack(out)


class BlockParams:
    """Folded parameters of one deployed block, kernel-layout-ready.

    ``kind='basic'``: w1/w2 ``(3, 3, C, C)``; ``kind='down'``: w1
    ``(3, 3, C, Co)`` stride 2, w2 ``(3, 3, Co, Co)``, wd ``(C, Co)``.
    Weights +/-1 int8; scales/adds/thresholds as in the block kernels
    (inference.deploy / inference.optimize folds).
    """

    def __init__(self, kind, w1, w2, wd=None, scale1=None, add1=None,
                 prelu1=None, scale2=None, add2=None, prelu2=None,
                 scaled=None, addd=None, threshold=None, threshold2=None,
                 thresholdd=None):
        self.kind = kind
        ci = w1.shape[2]
        co = w1.shape[3]
        if kind == "basic":
            self.w1 = w1.astype(jnp.int8).reshape(9 * ci, co)
            self.w2 = w2.astype(jnp.int8).reshape(9 * ci, co)
            self.prm = _rows(
                [scale1, add1, prelu1, scale2, add2, prelu2, threshold,
                 threshold2],
                [(1.0, co), (0.0, co), (0.25, co)] * 2
                + [(0.0, co), (0.0, co)])
        else:
            self.w1 = _transform_w1(w1.astype(jnp.int8))        # (16ci, co)
            self.w2 = w2.astype(jnp.int8).reshape(9 * co, co)
            self.wd = wd.astype(jnp.int8).reshape(ci, co)
            self.po = _rows(
                [scale1, add1, prelu1, scale2, add2, prelu2, scaled, addd,
                 threshold2],
                [(1.0, co), (0.0, co), (0.25, co)] * 2
                + [(1.0, co), (0.0, co), (0.0, co)])
            t1 = jnp.broadcast_to(jnp.asarray(
                0.0 if threshold is None else threshold,
                jnp.float32).reshape(-1), (ci,))
            td = jnp.broadcast_to(jnp.asarray(
                0.0 if thresholdd is None else thresholdd,
                jnp.float32).reshape(-1), (ci,))
            self.pi = jnp.stack([jnp.tile(t1, 4), jnp.tile(td, 4)])
        self.ci, self.co = ci, co

    def arrays(self):
        """Kernel-layout arrays in a fixed order (for caching/transfer)."""
        if self.kind == "basic":
            return [self.w1, self.w2, self.prm]
        return [self.w1, self.w2, self.wd, self.po, self.pi]

    @classmethod
    def from_arrays(cls, meta, arrays) -> "BlockParams":
        """Rebuild from ``(kind, ci, co)`` + :meth:`arrays` output without
        re-running the layout transforms."""
        kind, ci, co = meta
        bp = cls.__new__(cls)
        bp.kind, bp.ci, bp.co = kind, ci, co
        if kind == "basic":
            bp.w1, bp.w2, bp.prm = arrays
        else:
            bp.w1, bp.w2, bp.wd, bp.po, bp.pi = arrays
        return bp


_VM = pl.BlockSpec(memory_space=pltpu.VMEM)


def _chain_kernel(*refs, plan, acts, pre, z21, ci, with_head):
    """Run a block chain (plan of 'basic'/'down') + optional pool/fc head.

    ``refs``: x, then per-block param refs in plan order (3 per basic,
    5 per down), then (wfc, bfc) if ``with_head``, then the output ref.
    Small batches are unrolled per image (sequential bodies keep the
    per-image VMEM peak; the weights load once for all images).
    """
    x_ref, all_refs = refs[0], list(refs[1:])
    out_ref = all_refs.pop()
    n = x_ref.shape[0]
    for b in range(n):
        refs = list(all_refs)
        a = x_ref[...][b].astype(jnp.float32)
        cin = ci
        for kind in plan:
            if kind == "basic":
                w1, w2, prm = refs[:3]
                refs = refs[3:]
                a = _basic_body(a, w1[...], w2[...], prm[...],
                                act1=acts[0], act2=acts[1], pre=pre,
                                z21=z21)
            else:
                w1, w2, wd, po, pi = refs[:5]
                refs = refs[5:]
                a = _down_body(a, w1[...], w2[...], wd[...], po[...],
                               pi[...], act1=acts[0], act2=acts[1],
                               pre=pre, z21=z21, ci=cin)
                cin = wd.shape[-1]
        if not with_head:
            out_ref[b] = a.astype(out_ref.dtype)
            continue
        wfc, bfc = refs
        h, w, c = a.shape
        pooled = jnp.mean(a.reshape(h * w, c), axis=0, keepdims=True)
        logits = lax.dot_general(pooled, wfc[...].astype(jnp.float32),
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out_ref[b] = (logits + bfc[...]).astype(out_ref.dtype)[0]


def fused_chain(
    x: jax.Array,
    blocks: Sequence[BlockParams],
    wfc: Optional[jax.Array] = None,
    bfc: Optional[jax.Array] = None,
    *,
    act: str = "relu",
    pre: bool = False,
    zero_to_one: bool = True,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """A whole residual stage — any chain of [down?] + basic* blocks — in
    ONE kernel; optionally with the global avgpool + float fc head.

    ``x``: ``(1, H, W, C)`` raw stage input. A leading 'down' block W-pair
    merges the input via a free XLA reshape outside the kernel (a 'down'
    elsewhere in the chain would need the Mosaic-rejected in-kernel
    W-merge — only position 0 is supported). ``wfc``: ``(Cout, classes)``
    float head; the result is then ``(1, classes)`` logits.
    """
    plan = tuple(b.kind for b in blocks)
    assert all(k == "basic" for k in plan[1:]), (
        "only a LEADING down block is supported (in-kernel W-merge is not)")
    n, h, w, ci = x.shape
    assert n <= 8, ("stage megakernels unroll images in-kernel; "
                    f"batch {n} > 8 should use the per-block/XLA paths")
    act1, act2 = (act, act) if isinstance(act, str) else act
    assert act1 in _ACTS and act2 in _ACTS

    args = [x]
    if plan[0] == "down":
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        args = [x.reshape(n, h, w // 2, 2 * ci)]  # W-pair merge (free)
        oh, ow = h // 2, w // 2
    else:
        oh, ow = h, w
    co = blocks[-1].co
    flops = 0
    for b in blocks:
        args += b.arrays()
        flops += 2 * 2 * oh * ow * b.co * (9 * b.ci * (4 if b.kind == "down"
                                                       else 1) + b.ci)
    with_head = wfc is not None
    if with_head:
        classes = wfc.shape[-1]
        bfc = (jnp.zeros((classes,), jnp.float32) if bfc is None
               else bfc).astype(jnp.float32).reshape(1, classes)
        args += [wfc, bfc]
        out_shape = (n, classes)
        out_dtype = jnp.float32 if out_dtype is None else out_dtype
    else:
        out_shape = (n, oh, ow, co)
        out_dtype = x.dtype if out_dtype is None else out_dtype

    return pl.pallas_call(
        functools.partial(_chain_kernel, plan=plan, acts=(act1, act2),
                          pre=pre, z21=zero_to_one, ci=ci,
                          with_head=with_head),
        in_specs=[_VM] * len(args),
        out_specs=_VM,
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=h * w * ci * 4, transcendentals=0),
        interpret=interpret,
    )(*args)


def fused_pair(x, blocks, **kw):
    """Two+ stride-1 blocks (a whole layer1) in ONE kernel — see
    :func:`fused_chain`."""
    assert all(b.kind == "basic" for b in blocks)
    return fused_chain(x, blocks, **kw)


def _stem_chain_kernel(x_ref, *refs, plan, acts, pre, z21, o):
    from .stem import _stem_v3_body

    stem_w, b_ref = refs[:8], refs[8]
    blk_refs, out_ref = list(refs[9:-1]), refs[-1]
    a = _stem_v3_body(x_ref[...], [w[...] for w in stem_w], b_ref[...], o)
    # round the stem activation to the serving IO dtype exactly as the
    # split (FusedStem -> FusedStage) pipeline does at its kernel
    # boundary: keeping it f32 here would be *more* precise but would
    # break bit-parity with the QAT forward at matched precision (sign
    # thresholds see differently-rounded values)
    a = a.astype(out_ref.dtype).astype(jnp.float32)
    for _ in plan:  # all 'basic'
        w1, w2, prm = blk_refs[:3]
        blk_refs = blk_refs[3:]
        a = _basic_body(a, w1[...], w2[...], prm[...],
                        act1=acts[0], act2=acts[1], pre=pre, z21=z21)
    out_ref[...] = a[None].astype(out_ref.dtype)


def fused_stem_chain(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array],
    blocks: Sequence[BlockParams],
    *,
    act: str = "relu",
    pre: bool = False,
    zero_to_one: bool = True,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """The whole network ENTRY — float stem (conv7x7/s2 + bias + ReLU +
    maxpool3x3/s2) AND the first stride-1 residual stage (layer1) — in ONE
    kernel.

    This is the only stage junction that can merge beyond the five-dispatch
    structure: every other boundary enters a stride-2 stage, whose W-pair
    lane merge Mosaic rejects in-kernel (module docstring). The stem's
    post-maxpool tile feeds :func:`_basic_body` directly in VMEM (rounded
    to the IO dtype first, so the result is bit-exact with the split
    stem->pair pipeline). Measured on v5e B=1: ~1.5us faster than the two
    kernels in isolation, but a WASH at whole-model level (dispatches have
    no launch overhead; the avoided HBM round trip is <1us) — so serving
    keeps this as an opt-in (inference.fuse_entry), not a default. Stem
    math is :func:`~bnn_tpu.kernels.stem._stem_v3_body` (H-oct x W-quad
    phases); batches run as a grid over images.

    ``x``: ``(N, H, W, C<=4)`` raw input, ``H % 16 == 0``, ``W % 8 == 0``;
    ``blocks``: layer1's stride-1 BlockParams (``ci == stem out``).
    """
    from .stem import _stem_v3_prepare

    n, h, ws, c = x.shape
    assert n <= 8, f"batch {n}: above the megakernel cap, use XLA paths"
    plan = tuple(b.kind for b in blocks)
    assert all(k == "basic" for k in plan), plan
    o = w.shape[-1]
    assert blocks[0].ci == o, (blocks[0].ci, o)
    act1, act2 = (act, act) if isinstance(act, str) else act
    assert act1 in _ACTS and act2 in _ACTS
    hp, wp = h // 4, ws // 4
    co = blocks[-1].co
    out_dtype = x.dtype if out_dtype is None else out_dtype

    xwr, was, bf = _stem_v3_prepare(x, w, bias)
    args = [xwr] + was + [bf]
    for b in blocks:
        args += b.arrays()

    def idx_x(b):
        return (b, 0, 0, 0)

    def idx_c(b):  # weights: same block every grid step
        return (0, 0)

    flops = 2 * (h // 2) * (ws // 2) * 256 * o
    for b in blocks:
        flops += 2 * 2 * hp * wp * b.co * (9 * b.ci + b.ci)

    return pl.pallas_call(
        functools.partial(_stem_chain_kernel, plan=plan, acts=(act1, act2),
                          pre=pre, z21=zero_to_one, o=o),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, ws // 4, 16), idx_x,
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, idx_c, memory_space=pltpu.VMEM)
           for a in args[1:]],
        out_specs=pl.BlockSpec((1, hp, wp, co), idx_x,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, co), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops * n,
            bytes_accessed=n * (h * ws * 4 * x.dtype.itemsize
                                + hp * wp * co * 2),
            transcendentals=0),
        interpret=interpret,
    )(*args)


def fused_stem_chain_reference(x, w, bias, blocks, *, act="relu", pre=False,
                               zero_to_one=True, out_dtype=None):
    """jnp oracle: the standalone stem reference feeding the chain
    reference, with the stem activation rounded to the IO dtype at the
    same point the kernel rounds it (sign thresholds in block 1 must see
    identically-rounded values)."""
    from .stem import fused_stem_reference

    io_dtype = out_dtype or x.dtype
    y = fused_stem_reference(x, w, bias, out_dtype=io_dtype)
    return fused_chain_reference(y.astype(jnp.float32), blocks, act=act,
                                 pre=pre, zero_to_one=zero_to_one,
                                 out_dtype=io_dtype)


def fused_down_stage(x, blocks, wfc=None, bfc=None, **kw):
    """A stride-2 stage (down + stride-1 blocks) in ONE kernel — see
    :func:`fused_chain`."""
    assert blocks[0].kind == "down"
    return fused_chain(x, blocks, wfc, bfc, **kw)


# ---------------------------------------------------------------------------
# jnp oracles (built on the already-golden block references)


def _basic_ref(x, bp, act, pre, z21):
    from .block import fused_basic_block_reference

    c = bp.ci
    prm = bp.prm
    return fused_basic_block_reference(
        x, bp.w1.reshape(3, 3, c, c), bp.w2.reshape(3, 3, c, c),
        prm[0], prm[1], prm[3], prm[4], act=act,
        prelu1=prm[2], prelu2=prm[5], threshold=prm[6], threshold2=prm[7],
        pre=pre, zero_to_one=z21, out_dtype=jnp.float32)


def _down_ref(x, bp, act, pre, z21):
    from .strided_block import fused_downsample_block_reference

    ci, co = bp.ci, bp.co
    # invert _transform_w1: (16ci, co) order (ki, kj, di, dj, c) ->
    # (4, 4, ci, co) -> strip the (1, 0) zero pad
    t = bp.w1.reshape(2, 2, 2, 2, ci, co)          # (ki, kj, di, dj, c, o)
    w1 = jnp.transpose(t, (0, 2, 1, 3, 4, 5)).reshape(4, 4, ci, co)[1:, 1:]
    po, pi = bp.po, bp.pi
    return fused_downsample_block_reference(
        x, w1, bp.w2.reshape(3, 3, co, co), bp.wd,
        po[0], po[1], po[3], po[4], po[6], po[7], act=act,
        prelu1=po[2], prelu2=po[5], threshold1=pi[0, :ci],
        threshold2=po[8], thresholdd=pi[1, :ci],
        pre=pre, zero_to_one=z21, out_dtype=jnp.float32)


def fused_pair_reference(x, blocks, *, act="relu", pre=False,
                         zero_to_one=True, out_dtype=None):
    """Pure-jnp oracle for :func:`fused_pair` (CPU-runnable)."""
    out_dtype = x.dtype if out_dtype is None else out_dtype
    a = x.astype(jnp.float32)
    for bp in blocks:
        a = _basic_ref(a, bp, act, pre, zero_to_one)
    return a.astype(out_dtype)


def fused_chain_reference(x, blocks, wfc=None, bfc=None, *, act="relu",
                          pre=False, zero_to_one=True, out_dtype=None):
    """Pure-jnp oracle for :func:`fused_chain` (CPU-runnable)."""
    a = x.astype(jnp.float32)
    for b in blocks:
        ref = _down_ref if b.kind == "down" else _basic_ref
        a = ref(a, b, act, pre, zero_to_one)
    if wfc is None:
        return a.astype(x.dtype if out_dtype is None else out_dtype)
    pooled = jnp.mean(a, axis=(1, 2))
    logits = pooled.astype(jnp.float32) @ wfc.astype(jnp.float32)
    if bfc is not None:
        logits = logits + bfc.astype(jnp.float32).reshape(1, -1)
    return logits.astype(jnp.float32 if out_dtype is None else out_dtype)


fused_down_stage_reference = fused_chain_reference
