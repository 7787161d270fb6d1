"""Fused strided (downsample) residual-block megakernel (Pallas TPU).

Executes an entire stride-2 post-activation binary BasicBlock in ONE
kernel — the three blocks (layer2.0/3.0/4.0 in a binary ResNet-18) that
:func:`bnn_tpu.kernels.block.fused_basic_block` cannot cover:

    xs  = sign(x - thr1)                          # +/-1 int8 (C_in)
    y1  = conv3x3_s2(xs, w1) * scale1 + add1      # int8 MXU, C_in -> C_out
    h   = act1(y1)
    y2  = conv3x3_s1(sign(h), w2) * scale2 + add2 # C_out -> C_out
    ds  = conv1x1(sign(avgpool2x2_s2(x) - thrd), wd) * scaled + addd
    out = act2(y2 + ds)

i.e. ``BasicBlock.__call__`` with its AvgPool->1x1->BN shortcut
(models/layers/res_block.py:41-47, the BNN downsample of
models/resnet.py) after deployment (BNs folded into the epilogues).

The strided conv uses the same space-to-depth identity as the stem kernel
(kernels/stem.py): a 3x3/s2/p1 conv equals a 2x2/s1/p(1,0) conv over the
2x2 space-to-depth input, so conv1 is ONE K=16*C_in MXU contraction. The
s2d split follows the hardware rules learned there: the W-pair merge
happens OUTSIDE the kernel (``(N,H,W,C) -> (N,H,W/2,2C)``, a cheap
lane-aligned relayout for C >= 64), the H-pair merge IN-KERNEL via a
major-dim phase reshape (Mosaic rejects minor-dim reshapes / strided
slices). The shortcut's 2x2/s2 avgpool is free in this form: it is the
mean of the four s2d phase channel groups.

Tiling: grid over (batch, output-row blocks). Each step loads a ``2R``-row
W-merged slab plus 4-row halos, computes ``R+2`` conv1 rows (conv2's
halo), and writes ``R`` output rows. Boundary halo rows are zeroed (=
conv1's zero padding); conv1 rows outside the image are zeroed after the
sign (= conv2's zero padding), exactly as in ``kernels/block.py``.

Scope: 3x3/s2/p1 conv1, 3x3/s1/p1 conv2, 2x2/s2 avgpool + 1x1 shortcut,
groups=1, even H/W. The reference framework has no execution layer at all
(reference README.md:22).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block import _ACTS, _apply_act

__all__ = ["fused_downsample_block", "fused_downsample_block_reference"]



def _transform_w1(w1: jax.Array) -> jax.Array:
    """(3, 3, C_in, C_out) stride-2 kernel -> (16*C_in, C_out) s2d form."""
    ci, co = w1.shape[2], w1.shape[3]
    w4 = jnp.pad(w1, ((1, 0), (1, 0), (0, 0), (0, 0)))
    t = w4.reshape(2, 2, 2, 2, ci, co)        # (ki, di, kj, dj, c, o)
    t = t.transpose(0, 2, 1, 3, 4, 5)         # (ki, kj, di, dj, c, o)
    return t.reshape(16 * ci, co)


def _sign_i8(v, thr, zero_to_one: bool):
    if zero_to_one:
        s = jnp.where(v >= thr, 1, -1)
    else:  # torch parity: sign(0) == 0 (ternary)
        s = jnp.where(v > thr, 1, jnp.where(v < thr, -1, 0))
    return s.astype(jnp.int8)


def _kernel(x_ref, top_ref, bot_ref, w1_ref, w2_ref, wd_ref, po_ref, pi_ref,
            out_ref, *, act1: str, act2: str, zero_to_one: bool, ci: int,
            pre: bool):
    ri = pl.program_id(1)
    nr = pl.num_programs(1)
    _, rows2, w2w, c2 = x_ref.shape  # (1, 2R, W2, 2*C_in)
    R = rows2 // 2
    co = out_ref.shape[-1]

    po = po_ref[...]  # (9, co) f32
    s1, a1, p1 = po[0:1], po[1:2], po[2:3]
    s2, a2, p2 = po[3:4], po[4:5], po[5:6]
    sd, ad, thr2 = po[6:7], po[7:8], po[8:9]
    pi = pi_ref[...]  # (2, 4*C_in) f32: tiled thr1, tiled thrd
    thr1 = pi[0:1]
    thrd = pi[1:2, :ci]

    def merge(u):
        """In-kernel H-merge: s2d row g = W-merged rows (2g, 2g+1)."""
        n_, r_, _, _ = u.shape
        up = u.reshape(n_, r_ // 2, 2, w2w, c2)
        m = jnp.concatenate([up[:, :, 0], up[:, :, 1]], axis=-1)
        return m.reshape(r_ // 2, w2w, 4 * ci).astype(jnp.float32)

    # sign BEFORE zeroing the out-of-image halos: the zeroed halo rows are
    # the conv's zero padding, which must stay 0 — not become sign(0)
    xs_mid = _sign_i8(merge(x_ref[...]), thr1, zero_to_one)  # (R, W2, 4C)
    xs_top = jnp.where(ri > 0,
                       _sign_i8(merge(top_ref[...]), thr1, zero_to_one), 0)
    xs_bot = jnp.where(ri < nr - 1,
                       _sign_i8(merge(bot_ref[...]), thr1, zero_to_one), 0)
    xs = jnp.concatenate([xs_top, xs_mid, xs_bot], axis=0)  # (R+4, W2, 4C)
    xsp = jnp.pad(xs, ((0, 0), (1, 0), (0, 0)))  # conv1 W left pad

    # conv1 (s2d 2x2, pad (1,0)): out rows o = 0..R+1 <-> global r0-1+o,
    # tap (ki, kj) reads s2d local row o+ki, col j+kj (after left pad)
    m1 = (R + 2) * w2w
    slabs = [xsp[ki: ki + R + 2, kj: kj + w2w, :].reshape(m1, 4 * ci)
             for ki in range(2) for kj in range(2)]
    acc1 = lax.dot_general(jnp.concatenate(slabs, axis=-1), w1_ref[...],
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)
    y1 = _apply_act(acc1.astype(jnp.float32) * s1 + a1, act1, p1)
    hs = _sign_i8(y1, thr2, zero_to_one).reshape(R + 2, w2w, co)
    # conv1 rows outside [0, H2) are conv2's zero padding
    rid = lax.broadcasted_iota(jnp.int32, (R + 2, 1, 1), 0)
    keep = ((rid > 0) | (ri > 0)) & ((rid < R + 1) | (ri < nr - 1))
    hs = jnp.where(keep, hs, 0)

    # conv2 (3x3, s1, p1) over the R valid rows
    hsp = jnp.pad(hs, ((0, 0), (1, 1), (0, 0)))
    m2 = R * w2w
    acc2 = None
    for dy in range(3):
        slab = jnp.concatenate(
            [hsp[dy: dy + R, dx: dx + w2w, :].reshape(m2, co)
             for dx in range(3)], axis=-1)
        rhs = w2_ref[3 * dy * co: 3 * (dy + 1) * co]
        d = lax.dot_general(slab, rhs,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        acc2 = d if acc2 is None else acc2 + d
    y2 = acc2.astype(jnp.float32) * s2 + a2

    # shortcut: avgpool2x2/s2 = mean of the 4 s2d phases (float), then
    # sign -> 1x1 binary conv; pooled rows are exactly the mid s2d rows
    xm = merge(x_ref[...])  # (R, W2, 4C)
    avg = 0.25 * (xm[:, :, :ci] + xm[:, :, ci: 2 * ci]
                  + xm[:, :, 2 * ci: 3 * ci] + xm[:, :, 3 * ci:])
    dsig = _sign_i8(avg, thrd, zero_to_one).reshape(m2, ci)
    accd = lax.dot_general(dsig, wd_ref[...],
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)
    ds = accd.astype(jnp.float32) * sd + ad

    if pre:  # pre-activation ordering: act BEFORE the residual add
        out = _apply_act(y2, act2, p2) + ds
    else:
        out = _apply_act(y2 + ds, act2, p2)
    out_ref[...] = out.reshape(1, R, w2w, co).astype(out_ref.dtype)


def _pick_rows(h2: int, w2: int, ci: int, co: int) -> int:
    """Largest even divisor of H2 fitting a ~5MB budget (whole H2 if odd-
    only); single-step grids need no halo alignment so odd H2 is allowed."""
    best = None
    for r in range(2, h2 + 1, 2):
        if h2 % r:
            continue
        patches = (r + 2) * w2 * 16 * ci + r * w2 * 9 * co  # int8
        accs = ((r + 2) + 2 * r) * w2 * co * 4
        if patches + accs <= (5 << 20):
            best = r
    return best if best is not None else h2


def fused_downsample_block(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    wd: jax.Array,
    scale1, add1, scale2, add2, scaled, addd,
    *,
    act: str = "relu",
    prelu1: Optional[jax.Array] = None,
    prelu2: Optional[jax.Array] = None,
    threshold1: Optional[jax.Array] = None,
    threshold2: Optional[jax.Array] = None,
    thresholdd: Optional[jax.Array] = None,
    pre: bool = False,
    zero_to_one: bool = True,
    out_dtype=None,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """One-kernel stride-2 binary BasicBlock (see module docstring).

    Args:
        x: ``(N, H, W, C_in)`` raw block input (float), H and W even.
        w1: ``(3, 3, C_in, C_out)`` int8 ``+/-1`` stride-2 conv kernel.
        w2: ``(3, 3, C_out, C_out)`` int8 ``+/-1`` conv kernel.
        wd: ``(C_in, C_out)`` (or ``(1, 1, C_in, C_out)``) int8 shortcut
            1x1 kernel.
        scale*/add*: ``(C_out,)`` f32 folded epilogues for conv1 / conv2 /
            the shortcut conv (see inference.deploy).
        threshold1 / thresholdd: optional per-in-channel sign thresholds
            for conv1's input sign and the shortcut's post-avgpool sign.
        threshold2: optional ``(C_out,)`` threshold for conv2's input sign
            (pre-activation blocks fold bn2 here).
        pre: pre-activation residual ordering — ``act2(y2) + ds`` instead
            of the post-activation ``act2(y2 + ds)``.
    Returns:
        ``(N, H/2, W/2, C_out)``.
    """
    n, h, ws, ci = x.shape
    assert h % 2 == 0 and ws % 2 == 0, (h, ws)
    co = w1.shape[-1]
    assert w1.shape == (3, 3, ci, co), w1.shape
    assert w2.shape == (3, 3, co, co), w2.shape
    wd = wd.reshape(ci, co)
    act1, act2 = (act, act) if isinstance(act, str) else act
    assert act1 in _ACTS and act2 in _ACTS, (act1, act2)
    h2, w2w = h // 2, ws // 2
    out_dtype = x.dtype if out_dtype is None else out_dtype

    r = rows_per_step or _pick_rows(h2, w2w, ci, co)
    assert h2 % r == 0 and (r % 2 == 0 or h2 == r), (r, h2)
    nr = h2 // r

    def _row(v, default, width):
        v = jnp.asarray(default if v is None else v, jnp.float32).reshape(-1)
        return jnp.broadcast_to(v, (width,))

    po = jnp.stack([
        _row(scale1, 1.0, co), _row(add1, 0.0, co), _row(prelu1, 0.25, co),
        _row(scale2, 1.0, co), _row(add2, 0.0, co), _row(prelu2, 0.25, co),
        _row(scaled, 1.0, co), _row(addd, 0.0, co),
        _row(threshold2, 0.0, co),
    ])  # (9, co)
    pi = jnp.stack([
        jnp.tile(_row(threshold1, 0.0, ci), 4),
        jnp.tile(_row(thresholdd, 0.0, ci), 4),
    ])  # (2, 4*ci)

    w1f = _transform_w1(w1.astype(jnp.int8))
    w2f = w2.astype(jnp.int8).reshape(9 * co, co)
    wdf = wd.astype(jnp.int8)

    xw = x.reshape(n, h, w2w, 2 * ci)  # W-pair merge (outside the kernel)

    def idx_mid(b, ri):
        return (b, ri, 0, 0)

    def idx_top(b, ri):
        return (b, jnp.maximum(ri * 2 * r - 4, 0) // 4, 0, 0)

    def idx_bot(b, ri):
        return (b, jnp.minimum(ri * 2 * r + 2 * r, h - 4) // 4, 0, 0)

    return pl.pallas_call(
        functools.partial(_kernel, act1=act1, act2=act2,
                          zero_to_one=zero_to_one, ci=ci, pre=pre),
        grid=(n, nr),
        in_specs=[
            pl.BlockSpec((1, 2 * r, w2w, 2 * ci), idx_mid,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, w2w, 2 * ci), idx_top,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, w2w, 2 * ci), idx_bot,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * ci, co), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * co, co), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, co), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * ci), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, w2w, co), idx_mid,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2w, co), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * h2 * w2w * co * (9 * ci + 9 * co + ci),
            bytes_accessed=(n * h * ws * ci * x.dtype.itemsize
                            + n * h2 * w2w * co
                            * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xw, xw, xw, w1f, w2f, wdf, po, pi)


def fused_downsample_block_reference(
    x, w1, w2, wd, scale1, add1, scale2, add2, scaled, addd, *,
    act="relu", prelu1=None, prelu2=None, threshold1=None, threshold2=None,
    thresholdd=None, pre=False, zero_to_one=True, out_dtype=None,
) -> jax.Array:
    """Pure-jnp oracle for :func:`fused_downsample_block` (CPU-runnable)."""
    from .. import functional as F

    n, h, ws, ci = x.shape
    co = w1.shape[-1]
    out_dtype = x.dtype if out_dtype is None else out_dtype
    act1, act2 = (act, act) if isinstance(act, str) else act
    p1 = jnp.asarray(0.25 if prelu1 is None else prelu1, jnp.float32)
    p2 = jnp.asarray(0.25 if prelu2 is None else prelu2, jnp.float32)
    t1 = jnp.zeros((ci,)) if threshold1 is None else threshold1
    t2 = jnp.zeros((co,)) if threshold2 is None else threshold2
    td = jnp.zeros((ci,)) if thresholdd is None else thresholdd

    def sgn(v, t):
        if zero_to_one:
            return jnp.where(v >= t, 1.0, -1.0)
        return jnp.where(v > t, 1.0, jnp.where(v < t, -1.0, 0.0))

    def conv(s, wk, stride):
        return lax.conv_general_dilated(
            s, wk.astype(jnp.float32), (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    xf = x.astype(jnp.float32)
    y1 = conv(sgn(xf, t1), w1, 2) * scale1 + add1
    hs = sgn(_apply_act(y1, act1, p1), t2)
    y2 = conv(hs, w2, 1) * scale2 + add2
    avg = F.avg_pool(xf, 2, 2, 0)
    dsig = sgn(avg, td)
    ds = jnp.einsum("nhwc,co->nhwo", dsig,
                    wd.reshape(ci, co).astype(jnp.float32)) * scaled + addd
    if pre:
        return (_apply_act(y2, act2, p2) + ds).astype(out_dtype)
    return _apply_act(y2 + ds, act2, p2).astype(out_dtype)
