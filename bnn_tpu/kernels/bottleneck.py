"""Fused binary Bottleneck megakernel (Pallas TPU).

Executes an entire stride-1 identity-shortcut Bottleneck (ResNet-50's
block, reference bnn/models/layers/res_block.py:59-118) in ONE kernel:

    xs  = sign(x - thr1)                           # (C,)   int8
    y1  = act1(conv1x1(xs, w1) * s1 + a1)          # C -> width: ONE dot
    y2  = act2(conv3x3(sign(y1 - thr2), w2)*s2+a2) # width -> width
    y3  = conv1x1(sign(y2 - thr3), w3) * s3 + a3   # width -> C: ONE dot
    out = act3(y3 + x)

All BNs are folded into the ``(scale, add)`` epilogues (post-activation)
or the sign thresholds (per-channel, from a BN-before fold) by the
deployment passes. The two 1x1 convs are single MXU dots with no patch
assembly at all; the 3x3 uses the same implicit-GEMM row-slab scheme as
:func:`bnn_tpu.kernels.block.fused_basic_block` (shared helper). The
feature map makes one HBM round trip for the whole block instead of ~12
op boundaries.

Tiling: grid over (batch, row blocks). conv1 is computed on ``R+2`` rows
(conv2's halo) from a 2-row-halo'd input slab; rows outside the image are
zeroed after the sign (conv2's zero padding), exactly as in block.py.

Scope: stride 1, identity OR 1x1-projection shortcut, groups=1 (13 of
ResNet-50's 16 blocks: 12 identity + layer1.0's stride-1 projection; the
3 strided bottlenecks stay on XLA). Measured on v5e (round 4, HONEST
ternary config — the earlier "230->144us" here was taken before the
degenerate-benchmark retraction): binary ResNet-50 B=1 845us unfused ->
700us stem-fused -> ~220us with the full pipeline (stem + these
bottleneck kernels), a 3.9x fusion win.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block import _ACTS, _apply_act, _conv3x3_rows
# ONE copy of the in-kernel sign (sign(0) convention — the most delicate
# invariant here; same rule as model.py's import)
from .strided_block import _sign_i8

__all__ = ["fused_bottleneck", "fused_bottleneck_reference"]


def _kernel(x_ref, top_ref, bot_ref, w1_ref, w2_ref, w3_ref, wd_ref, pc_ref,
            pw_ref, po_ref, out_ref, *, act1: str, act2: str, act3: str,
            zero_to_one: bool, taps_per_dot: int, projection: bool):
    ri = pl.program_id(1)
    nr = pl.num_programs(1)
    _, r, w, c = x_ref.shape
    width = w2_ref.shape[-1]

    pc = pc_ref[...]  # (2, C_in): thr1, thrd
    thr1, thrd = pc[0:1], pc[1:2]
    po = po_ref[...]  # (5, C_out): s3, a3, p3, sd, ad
    s3, a3, p3, sd, ad = po[0:1], po[1:2], po[2:3], po[3:4], po[4:5]
    pw = pw_ref[...]  # (8, width): s1, a1, p1, thr2, s2, a2, p2, thr3
    s1, a1, p1, thr2 = pw[0:1], pw[1:2], pw[2:3], pw[3:4]
    s2, a2, p2, thr3 = pw[4:5], pw[5:6], pw[6:7], pw[7:8]

    def sgn_rows(v4, thr):
        n_, h_, w_, c_ = v4.shape
        v = v4.reshape(n_ * h_ * w_, c_).astype(jnp.float32)
        return _sign_i8(v, thr, zero_to_one).reshape(n_ * h_ * w_, c_)

    # conv1 rows r0-1 .. r0+R (R+2): mid + 1 row from each 2-row halo.
    # Halo signs are computed then zeroed out of image — but for a 1x1
    # conv the zeroing happens on y1's sign (below), so halo CONTENT only
    # needs to be finite; out-of-image halos are zeroed anyway for parity.
    xs_mid = sgn_rows(x_ref[...], thr1)                     # (R*W, C)
    xs_top = jnp.where(ri > 0, sgn_rows(top_ref[...], thr1), 0)[w:]
    xs_bot = jnp.where(ri < nr - 1, sgn_rows(bot_ref[...], thr1), 0)[:w]
    xs = jnp.concatenate([xs_top, xs_mid, xs_bot], axis=0)  # ((R+2)*W, C)

    acc1 = lax.dot_general(xs, w1_ref[...],
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)
    y1 = _apply_act(acc1.astype(jnp.float32) * s1 + a1, act1, p1)
    hs = _sign_i8(y1, thr2, zero_to_one).reshape(1, r + 2, w, width)
    # conv1 rows outside [0, H) are conv2's zero padding
    rid = lax.broadcasted_iota(jnp.int32, (1, r + 2, 1, 1), 1)
    keep = ((rid > 0) | (ri > 0)) & ((rid < r + 1) | (ri < nr - 1))
    hs = jnp.where(keep, hs, 0)

    acc2 = _conv3x3_rows(hs, w2_ref[...], taps_per_dot)     # (R*W, width)
    y2 = _apply_act(acc2.astype(jnp.float32) * s2 + a2, act2, p2)
    hs2 = _sign_i8(y2, thr3, zero_to_one)

    acc3 = lax.dot_general(hs2, w3_ref[...],
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)
    y3 = acc3.astype(jnp.float32) * s3 + a3

    if projection:  # 1x1 shortcut conv on sign(x - thrd) (stride 1)
        dsig = _sign_i8(x_ref[...].reshape(r * w, c).astype(jnp.float32),
                        thrd, zero_to_one)
        accd = lax.dot_general(dsig, wd_ref[...],
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
        identity = accd.astype(jnp.float32) * sd + ad
    else:
        identity = x_ref[...].reshape(r * w, c).astype(jnp.float32)
    out = _apply_act(y3 + identity, act3, p3)
    out_ref[...] = out.reshape(1, r, w, out_ref.shape[-1]) \
        .astype(out_ref.dtype)


def _pick_rows(h: int, w: int, c: int, width: int) -> int:
    best = 2 if h % 2 == 0 else h
    for r in range(2, h + 1, 2):
        if h % r:
            continue
        # int8 activations + f32 accumulators for the three stages
        i8 = (r + 2) * w * (c + width + 9 * width) + r * w * width
        f32 = ((r + 2) * w * width * 2 + r * w * (width + 2 * c)) * 4
        if i8 + f32 <= (6 << 20):
            best = r
    return best


def fused_bottleneck(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    w3: jax.Array,
    scale1, add1, scale2, add2, scale3, add3,
    *,
    wd: Optional[jax.Array] = None,
    scaled=None,
    addd=None,
    act: str = "relu",
    prelu1: Optional[jax.Array] = None,
    prelu2: Optional[jax.Array] = None,
    prelu3: Optional[jax.Array] = None,
    threshold1: Optional[jax.Array] = None,
    threshold2: Optional[jax.Array] = None,
    threshold3: Optional[jax.Array] = None,
    thresholdd: Optional[jax.Array] = None,
    zero_to_one: bool = True,
    out_dtype=None,
    taps_per_dot: int = 9,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """One-kernel stride-1 binary Bottleneck (see module docstring).

    Args:
        x: ``(N, H, W, C)`` raw block input (float; residual uses it).
        w1: ``(C, width)`` (or ``(1, 1, C, width)``) int8 ``+/-1``.
        w2: ``(3, 3, width, width)`` int8 ``+/-1``.
        w3: ``(width, C_out)`` (or 4-D) int8 ``+/-1``.
        wd: optional ``(C, C_out)`` int8 1x1 projection-shortcut kernel
            (ResNet-50's layer1.0: stride 1, channels change). With
            ``wd=None`` the shortcut is the identity and ``C_out == C``.
        scale*/add*, scaled/addd: folded per-out-channel epilogues.
        act: one kind or an ``(act1, act2, act3)`` tuple.
        threshold*: optional per-channel sign thresholds; ``thresholdd``
            applies to the projection's input sign.
    """
    n, h, w, c = x.shape
    w1 = w1.reshape(c, -1)
    width = w1.shape[-1]
    assert w2.shape == (3, 3, width, width), w2.shape
    w3 = w3.reshape(width, -1)
    cout = w3.shape[-1]
    projection = wd is not None
    if projection:
        wd = wd.reshape(c, cout)
    else:
        assert cout == c, (cout, c)
        wd = jnp.zeros((c, cout), jnp.int8)
    acts = (act,) * 3 if isinstance(act, str) else tuple(act)
    assert len(acts) == 3 and all(a in _ACTS for a in acts), acts
    out_dtype = x.dtype if out_dtype is None else out_dtype

    r = rows_per_step or _pick_rows(h, w, max(c, cout), width)
    assert h % r == 0 and (r % 2 == 0 or h == r), (r, h)
    nr = h // r

    def _row(v, default, wide):
        v = jnp.asarray(default if v is None else v, jnp.float32).reshape(-1)
        return jnp.broadcast_to(v, (wide,))

    pc = jnp.stack([
        _row(threshold1, 0.0, c), _row(thresholdd, 0.0, c),
    ])  # (2, C)
    pw = jnp.stack([
        _row(scale1, 1.0, width), _row(add1, 0.0, width),
        _row(prelu1, 0.25, width), _row(threshold2, 0.0, width),
        _row(scale2, 1.0, width), _row(add2, 0.0, width),
        _row(prelu2, 0.25, width), _row(threshold3, 0.0, width),
    ])  # (8, width)
    po = jnp.stack([
        _row(scale3, 1.0, cout), _row(add3, 0.0, cout),
        _row(prelu3, 0.25, cout), _row(scaled, 1.0, cout),
        _row(addd, 0.0, cout),
    ])  # (5, C_out)

    w1f = w1.astype(jnp.int8)
    w2f = w2.astype(jnp.int8).reshape(9 * width, width)
    w3f = w3.astype(jnp.int8)
    wdf = wd.astype(jnp.int8)

    def idx_mid(b, ri):
        return (b, ri, 0, 0)

    def idx_top(b, ri):
        return (b, jnp.maximum(ri * r - 2, 0) // 2, 0, 0)

    def idx_bot(b, ri):
        return (b, jnp.minimum(ri * r + r, h - 2) // 2, 0, 0)

    return pl.pallas_call(
        functools.partial(_kernel, act1=acts[0], act2=acts[1], act3=acts[2],
                          zero_to_one=zero_to_one,
                          taps_per_dot=taps_per_dot, projection=projection),
        grid=(n, nr),
        in_specs=[
            pl.BlockSpec((1, r, w, c), idx_mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, w, c), idx_top, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, w, c), idx_bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, width), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * width, width), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, cout), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cout), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, width), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, cout), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, w, cout), idx_mid,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * h * w * width * (c + 9 * width + cout),
            bytes_accessed=n * h * w * (c + cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, w1f, w2f, w3f, wdf, pc, pw, po)


def fused_bottleneck_reference(
    x, w1, w2, w3, scale1, add1, scale2, add2, scale3, add3, *, wd=None,
    scaled=None, addd=None, act="relu", prelu1=None, prelu2=None,
    prelu3=None, threshold1=None, threshold2=None, threshold3=None,
    thresholdd=None, zero_to_one=True, out_dtype=None,
) -> jax.Array:
    """Pure-jnp oracle for :func:`fused_bottleneck` (CPU-runnable)."""
    n, h, w, c = x.shape
    w1 = w1.reshape(c, -1)
    width = w1.shape[-1]
    w3 = w3.reshape(width, -1)
    cout = w3.shape[-1]
    out_dtype = x.dtype if out_dtype is None else out_dtype
    acts = (act,) * 3 if isinstance(act, str) else tuple(act)
    p1 = jnp.asarray(0.25 if prelu1 is None else prelu1, jnp.float32)
    p2 = jnp.asarray(0.25 if prelu2 is None else prelu2, jnp.float32)
    p3 = jnp.asarray(0.25 if prelu3 is None else prelu3, jnp.float32)
    t1 = jnp.zeros((c,)) if threshold1 is None else threshold1
    t2 = jnp.zeros((width,)) if threshold2 is None else threshold2
    t3 = jnp.zeros((width,)) if threshold3 is None else threshold3
    td = jnp.zeros((c,)) if thresholdd is None else thresholdd
    scale1 = 1.0 if scale1 is None else scale1
    scale2 = 1.0 if scale2 is None else scale2
    scale3 = 1.0 if scale3 is None else scale3
    add1 = 0.0 if add1 is None else add1
    add2 = 0.0 if add2 is None else add2
    add3 = 0.0 if add3 is None else add3

    def sgn(v, t):
        if zero_to_one:
            return jnp.where(v >= t, 1.0, -1.0)
        return jnp.where(v > t, 1.0, jnp.where(v < t, -1.0, 0.0))

    xf = x.astype(jnp.float32)
    y1 = jnp.einsum("nhwc,ck->nhwk", sgn(xf, t1),
                    w1.astype(jnp.float32)) * scale1 + add1
    y1 = _apply_act(y1, acts[0], p1)
    y2 = lax.conv_general_dilated(
        sgn(y1, t2), w2.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) * scale2 + add2
    y2 = _apply_act(y2, acts[1], p2)
    y3 = jnp.einsum("nhwk,kc->nhwc", sgn(y2, t3),
                    w3.astype(jnp.float32)) * scale3 + add3
    if wd is not None:
        identity = jnp.einsum(
            "nhwc,co->nhwo", sgn(xf, td),
            wd.reshape(c, cout).astype(jnp.float32))
        identity = identity * (1.0 if scaled is None else scaled) \
            + (0.0 if addd is None else addd)
    else:
        identity = xf
    return _apply_act(y3 + identity, acts[2], p3).astype(out_dtype)
