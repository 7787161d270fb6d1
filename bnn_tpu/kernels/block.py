"""Fused residual-block megakernel (Pallas TPU).

Executes an entire post-activation binary BasicBlock in ONE kernel:

    xs  = sign(x - threshold)                 # +/-1 int8, in VMEM
    y1  = conv3x3(xs, w1) * scale1 + add1     # int8 MXU, exact int32 accum
    h   = act(y1)                             # relu / prelu / identity
    y2  = conv3x3(sign(h), w2) * scale2 + add2
    out = act(y2 + x)                         # residual add on the raw input

i.e. the whole of ``BasicBlock.__call__`` (models/layers/res_block.py:41-47)
after deployment (BN folded into the ``scale/add`` epilogues by
``inference.optimize``). The reference executes this as ~8 separate torch
ops with the feature map bouncing through HBM between each (reference
bnn/layers/conv.py:90-97 per conv, plus BN/act/residual passes); here the
feature map goes HBM -> VMEM once and every intermediate lives in VMEM, so
HBM traffic is one read of ``x`` plus one write of ``out`` (plus a 2/R-row
halo).

When to use: small-batch serving. Isolated, this kernel beats XLA's
unfused op sequence only at the shape extremes — measured on v5e (B=1,
PReLU): 1.3x at 56x56x64 and 3.6x at 7x7x512 (XLA's conv drops to ~10
TOP/s at M=49) but slower at 28x28x128 / 14x14x256 where XLA needs only
4-5us. End to end, however, fusing EVERY eligible block wins (binary
ResNet-18 B=1: 398us -> 285us) because chained deployed stages carry a
whole-graph scheduling tax that fusion removes (see inference.megablock).
At batch >= ~8 XLA runs the sequence at 120-330 TOP/s — near the int8
roofline, above this kernel's ~50-110 TOP/s — so large batches should stay
on the unfused ops (``inference.fuse_blocks`` handles the dispatch).

Tiling: the grid runs over (batch groups, row blocks). Each step fetches a
disjoint ``R``-row slab of the input plus 2-row top/bottom halos (separate
row-aligned BlockSpecs over the same array — no manual DMA). conv1 computes
``R + 2`` rows so conv2 can consume its one-row halo entirely in VMEM;
boundary halos are zeroed to reproduce conv zero-padding exactly.

The 3x3 convs run as implicit GEMM: spatially-shifted views of the
zero-padded +/-1 activations are concatenated along the reduction axis in
VMEM (``taps_per_dot`` taps per contraction) and hit the MXU in int8 mode,
K up to ``9 * C`` deep — which matters exactly where C is small (layer1's
C=64 would otherwise contract at K=64).

Scope: stride 1, 3x3, pad 1, groups=1. Zero-padding contributes exactly 0
(pad applied AFTER the sign), matching ``conv(sign(x), w)`` semantics of the
unfused deployed path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_basic_block", "fused_basic_block_reference"]

_ACTS = ("relu", "prelu", "identity")


def _apply_act(y, act: str, slope):
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "prelu":
        return jnp.where(y >= 0, y, y * slope)
    return y


def _conv3x3_rows(xs4, w2d, taps_per_dot: int):
    """Valid-rows conv: (nb, r+2, w, c) +/-1 int8 -> (nb*r*w, c) int32.

    Rows carry their own halo (one extra row each side); W is zero-padded
    in place. Implicit GEMM: shifted views concatenated along K.
    """
    nb, rh, w, c = xs4.shape
    r = rh - 2
    m = nb * r * w
    xp = jnp.pad(xs4, ((0, 0), (0, 0), (1, 1), (0, 0)))
    taps = [(dy, dx) for dy in range(3) for dx in range(3)]
    acc = None
    for i in range(0, 9, taps_per_dot):
        group = taps[i:i + taps_per_dot]
        slabs = [xp[:, dy:dy + r, dx:dx + w, :].reshape(m, c)
                 for dy, dx in group]
        lhs = slabs[0] if len(slabs) == 1 else jnp.concatenate(slabs, axis=-1)
        rhs = w2d[i * c:(i + len(group)) * c]
        d = lax.dot_general(lhs, rhs,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    return acc


def _kernel(x_ref, top_ref, bot_ref, w1_ref, w2_ref, prm_ref, out_ref, *,
            act1: str, act2: str, taps_per_dot: int, zero_to_one: bool,
            pre: bool):
    nb, r, w, c = x_ref.shape
    ri = pl.program_id(1)
    nr = pl.num_programs(1)
    prm = prm_ref[...]  # (8, c) f32
    s1, a1, p1 = prm[0:1], prm[1:2], prm[2:3]
    s2, a2, p2, thr = prm[3:4], prm[4:5], prm[5:6], prm[6:7]
    thr2 = prm[7:8]

    def sign_of(v4, t):
        n_, h_, w_, c_ = v4.shape
        v = v4.reshape(n_ * h_ * w_, c_).astype(jnp.float32)
        if zero_to_one:
            s = jnp.where(v >= t, 1, -1)
        else:  # torch-parity sign(0) == 0: ternary, exact in int8
            s = jnp.where(v > t, 1, jnp.where(v < t, -1, 0))
        return s.astype(jnp.int8).reshape(v4.shape)

    xs_mid = sign_of(x_ref[...], thr)
    # boundary halos are zero — exactly the conv's zero padding
    xs_top = jnp.where(ri > 0, sign_of(top_ref[...], thr), 0)
    xs_bot = jnp.where(ri < nr - 1, sign_of(bot_ref[...], thr), 0)
    xs = jnp.concatenate([xs_top, xs_mid, xs_bot], axis=1)  # (nb, r+4, w, c)

    # conv1 over r+2 output rows (the halo conv2 needs), epilogue + act
    acc1 = _conv3x3_rows(xs, w1_ref[...], taps_per_dot)  # (nb*(r+2)*w, c)
    y1 = _apply_act(acc1.astype(jnp.float32) * s1 + a1, act1, p1)
    hs = (jnp.where(y1 >= thr2, 1, -1) if zero_to_one else
          jnp.where(y1 > thr2, 1, jnp.where(y1 < thr2, -1, 0)))
    hs = hs.astype(jnp.int8).reshape(nb, r + 2, w, c)
    # at the image's top/bottom edge the halo row is conv2's zero padding,
    # not a computable conv1 row — zero it (interior block edges keep it)
    rid = lax.broadcasted_iota(jnp.int32, (1, r + 2, 1, 1), 1)
    keep = ((rid > 0) | (ri > 0)) & ((rid < r + 1) | (ri < nr - 1))
    hs = jnp.where(keep, hs, 0)

    # conv2 over the r valid rows, epilogue + residual + act
    acc2 = _conv3x3_rows(hs, w2_ref[...], taps_per_dot)  # (nb*r*w, c)
    y2 = acc2.astype(jnp.float32) * s2 + a2
    xf = x_ref[...].reshape(nb * r * w, c).astype(jnp.float32)
    if pre:  # pre-activation ordering: act BEFORE the residual add
        out = _apply_act(y2, act2, p2) + xf
    else:
        out = _apply_act(y2 + xf, act2, p2)
    out_ref[...] = out.reshape(nb, r, w, c).astype(out_ref.dtype)


def _pick_tiling(n: int, h: int, w: int, c: int, itemsize: int,
                 taps_per_dot: int) -> tuple:
    """(images per step, rows per step) under a ~16 MB/core VMEM budget."""
    # bytes per output position: float in/out copies, int8 signed/patch
    # buffers (taps_per_dot * c wide), int32/f32 accumulator+epilogue pairs.
    # Lane padding doubles everything narrower than 128 lanes.
    lp = max(1, 128 // c)
    per_pos = c * (3 * itemsize + 9 + taps_per_dot + 17 * lp)
    budget = (6 << 20) - 2 * 9 * c * c  # weights resident twice
    cap = max(budget, 1 << 20) // per_pos  # positions per step
    # prefer whole images (no halo recompute); otherwise split rows evenly
    per_img = h * w
    if cap >= per_img:
        nb = max(1, min(n, cap // per_img))
        while n % nb:
            nb -= 1
        return nb, h
    rows = max(2, cap // w)
    # largest even divisor of h that is <= rows
    best = None
    for r in range(2, h, 2):
        if h % r == 0 and r <= rows:
            best = r
    if best is None:
        best = 2 if h % 2 == 0 else h  # odd h: cannot split evenly
    return 1, best


def fused_basic_block(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    scale1: jax.Array,
    add1: jax.Array,
    scale2: jax.Array,
    add2: jax.Array,
    *,
    act: str = "relu",
    prelu1: Optional[jax.Array] = None,
    prelu2: Optional[jax.Array] = None,
    threshold: Optional[jax.Array] = None,
    threshold2: Optional[jax.Array] = None,
    pre: bool = False,
    zero_to_one: bool = True,
    out_dtype=None,
    taps_per_dot: int = 9,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """One-kernel post-activation binary BasicBlock (see module docstring).

    Args:
        x: ``(N, H, W, C)`` raw block input (float; sign applied in-kernel,
            ``sign(0) == +1``; the residual add uses these raw values).
        w1, w2: ``(3, 3, C, C)`` int8 ``+/-1`` conv kernels (HWIO).
        scale1/add1, scale2/add2: ``(C,)`` f32 folded epilogues
            (``alpha_w * alpha_post`` and bias/BN terms, see inference.deploy).
        act: ``'relu' | 'prelu' | 'identity'`` — applied after conv1's
            epilogue and after the residual add (the block's act1/act2);
            a ``(act1, act2)`` tuple selects them independently.
        prelu1/prelu2: ``(C,)`` or scalar slopes when ``act == 'prelu'``.
        threshold: optional ``(C,)`` per-channel input sign threshold
            (from a BN-before fold).
        threshold2: optional ``(C,)`` per-channel threshold for conv2's
            input sign (pre-activation blocks fold bn2 here); default 0.
        pre: pre-activation residual ordering — ``act2(y2) + x`` instead
            of the post-activation ``act2(y2 + x)`` (reference
            bnn/models/layers/res_block.py:152-167 vs :41-47).
        zero_to_one: sign(0) convention for BOTH in-kernel signs — True
            maps exact zeros to +1; False is torch parity (``sign(0) == 0``,
            ternary activations — what QAT's default binarizer computes;
            systematic after ReLU).
        taps_per_dot: 1, 3 or 9 filter taps merged per MXU contraction
            (9 = full implicit GEMM, K = 9C).
        rows_per_step: override the auto row tiling (must divide H, even).
    """
    n, h, w, c = x.shape
    assert w1.shape == (3, 3, c, c) and w2.shape == (3, 3, c, c), \
        (w1.shape, w2.shape, c)
    act1, act2 = (act, act) if isinstance(act, str) else act
    assert act1 in _ACTS and act2 in _ACTS, (act1, act2)
    assert 9 % taps_per_dot == 0, taps_per_dot
    out_dtype = x.dtype if out_dtype is None else out_dtype

    def _row(v, default):
        if v is None:
            v = default
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.broadcast_to(v, (c,))

    prm = jnp.stack([
        _row(scale1, 1.0), _row(add1, 0.0), _row(prelu1, 0.25),
        _row(scale2, 1.0), _row(add2, 0.0), _row(prelu2, 0.25),
        _row(threshold, 0.0), _row(threshold2, 0.0),
    ])  # (8, c)

    w1f = w1.astype(jnp.int8).reshape(9 * c, c)
    w2f = w2.astype(jnp.int8).reshape(9 * c, c)

    if rows_per_step is None:
        nb, r = _pick_tiling(n, h, w, c, x.dtype.itemsize, taps_per_dot)
    else:
        nb, r = 1, rows_per_step
        assert h % r == 0 and (r == h or r % 2 == 0), (r, h)
    nr = h // r

    # top/bottom 2-row halo views of the same array, expressed as 2-row
    # blocks (requires even row offsets -> even r whenever nr > 1)
    def idx_mid(b, ri):
        return (b, ri, 0, 0)

    def idx_top(b, ri):
        return (b, jnp.maximum(ri * r - 2, 0) // 2, 0, 0)

    def idx_bot(b, ri):
        return (b, jnp.minimum(ri * r + r, h - 2) // 2, 0, 0)

    grid = (n // nb, nr)
    return pl.pallas_call(
        functools.partial(_kernel, act1=act1, act2=act2,
                          taps_per_dot=taps_per_dot, zero_to_one=zero_to_one,
                          pre=pre),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, r, w, c), idx_mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 2, w, c), idx_top, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 2, w, c), idx_bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, r, w, c), idx_mid,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * h * w * c * c * 9,
            bytes_accessed=(n * h * w * c * (x.dtype.itemsize
                                             + jnp.dtype(out_dtype).itemsize)
                            + 2 * 9 * c * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, w1f, w2f, prm)


def fused_basic_block_reference(
    x, w1, w2, scale1, add1, scale2, add2, *, act="relu", prelu1=None,
    prelu2=None, threshold=None, threshold2=None, pre=False,
    zero_to_one=True, out_dtype=None,
) -> jax.Array:
    """Pure-jnp oracle for :func:`fused_basic_block` (f32, CPU-runnable)."""
    n, h, w, c = x.shape
    out_dtype = x.dtype if out_dtype is None else out_dtype
    act1, act2 = (act, act) if isinstance(act, str) else act
    thr = jnp.zeros((c,), jnp.float32) if threshold is None else threshold
    thr2 = jnp.zeros((c,), jnp.float32) if threshold2 is None else threshold2
    p1 = jnp.asarray(0.25 if prelu1 is None else prelu1, jnp.float32)
    p2 = jnp.asarray(0.25 if prelu2 is None else prelu2, jnp.float32)

    def conv(s, wk):
        return lax.conv_general_dilated(
            s, wk.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def sgn(v, t):
        if zero_to_one:
            return jnp.where(v >= t, 1.0, -1.0)
        return jnp.where(v > t, 1.0, jnp.where(v < t, -1.0, 0.0))

    xf = x.astype(jnp.float32)
    xs = sgn(xf, thr)
    y1 = conv(xs, w1) * scale1 + add1
    y1 = _apply_act(y1, act1, p1)
    hs = sgn(y1, thr2)
    y2 = conv(hs, w2) * scale2 + add2
    if pre:
        return (_apply_act(y2, act2, p2) + xf).astype(out_dtype)
    return _apply_act(y2 + xf, act2, p2).astype(out_dtype)
