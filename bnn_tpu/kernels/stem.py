"""Fused ResNet-stem megakernel (Pallas TPU): conv7x7/s2 + bias + ReLU + maxpool.

The deployed binary ResNet's last large float stage is the stem:
``conv7x7/s2(C_in=3) -> (folded BN) -> ReLU -> maxpool3x3/s2``. Measured on
v5e at B=1 it costs ~120us — more than all the binary layers combined
(~25us) — because every piece is hostile to XLA at small batch: the conv
contracts over 3 of 128 lanes per tap (~2 TFLOP/s), ``reduce_window``
schedules poorly, and each stage is a full HBM round trip of a 112x112x64
map. This kernel runs the whole stem in ONE pass (measured 31us end to end
at B=1, 3.8x) with every intermediate resident in VMEM.

Approach — space-to-depth implicit GEMM (the exact identity derived in
``inference.stem``): a 7x7/s2/p3 conv equals a 4x4/s1/p(2,1) conv over the
2x2 space-to-depth input, so the whole conv becomes ONE
``(rows*112, 256) @ (256, 64)`` MXU contraction per grid step. The s2d
rearrangement itself is split to fit the hardware:

- channels are zero-padded 3->4 and the W-pairs merged OUTSIDE the kernel
  (``(N,H,W,4) -> (N,H,W/2,8)``, one cheap XLA relayout — materializing the
  full s2d array instead costs ~40us because a 12..16-lane transpose is
  itself lane-starved);
- the H-pair merge (rows 2g, 2g+1 -> lane groups) happens IN-KERNEL via an
  even/odd row phase reshape + lane concat (Mosaic rejects general
  minor-dim reshapes, but splitting a *major* dim is free).

The 3x3/s2/p1 maxpool runs in-kernel on the conv result via the same
even/odd phase trick (contiguous slices only, no reduce_window, no strided
VMEM access); the conv row above the image is masked to -inf to reproduce
the pool's padding.

Tiling: grid over (batch, pooled-row blocks). Each step loads ``4P`` raw
rows plus 8-row top/bottom halos (row-aligned BlockSpecs over the same
array), computes the ``2P+1`` conv rows its ``P`` pooled rows need, and
writes only the pooled block: HBM traffic is one read of the input + one
write of the 4x-smaller output.

Scope: the basic-stem geometry — odd k, stride 2, pad (k-1)//2 == 3 (i.e.
7x7), pool 3x3/s2/p1, even H/W. The reference framework has no execution
layer at all (reference README.md:22); this kernel is part of the serving
runtime it lacks.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_stem", "fused_stem_v2", "fused_stem_v3",
           "fused_stem_reference", "transform_stem_kernel"]

_NEG = -1e30  # -inf stand-in that survives bf16/f32 casts


def transform_stem_kernel(w: jax.Array) -> jax.Array:
    """``(7, 7, C<=4, O)`` HWIO stride-2 kernel -> ``(4, 4, 16, O)`` s2d form.

    Zero-pads the kernel extent 7->8 (front) and the in-channels to 4, then
    rearranges so tap ``(ki, kj)`` of the s2d conv reads lane group
    ``(di, dj, c)`` — matching the kernel's in-VMEM channel order
    (W-merge ``dj`` outside, H-merge ``di`` in-kernel => ``di*8 + dj*4 + c``).
    """
    kh, kw, cin, cout = w.shape
    assert kh == 7 and kw == 7 and cin <= 4, w.shape
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 4 - cin), (0, 0)))
    t = w8.reshape(4, 2, 4, 2, 4, cout)          # (ki, di, kj, dj, c, o)
    t = t.transpose(0, 2, 1, 3, 4, 5)            # (ki, kj, di, dj, c, o)
    return t.reshape(4, 4, 16, cout)


def _kernel(x_ref, top_ref, bot_ref, w_ref, b_ref, out_ref, *, p_rows: int):
    ri = pl.program_id(1)
    nr = pl.num_programs(1)
    P = p_rows
    o = out_ref.shape[-1]

    # raw W-merged rows: halo rows outside the image are zero (= the conv's
    # zero row padding; rows -4..-3 are only read by the masked-out conv
    # row -1, so zeros are safe there too)
    top = jnp.where(ri > 0, top_ref[...], 0)
    bot = jnp.where(ri < nr - 1, bot_ref[...], 0)
    v = jnp.concatenate([top, x_ref[...], bot], axis=1)  # (1, 4P+16, W/2, 8)

    # H-merge: s2d row g = raw rows (2g, 2g+1) -> lanes (di major)
    n_, r_, wm, c_ = v.shape
    vp = v.reshape(n_, r_ // 2, 2, wm, c_)
    xs = jnp.concatenate([vp[:, :, 0], vp[:, :, 1]], axis=-1)  # (1,2P+8,W/2,16)
    w = wm
    c4 = 2 * c_
    xs = jnp.pad(xs, ((0, 0), (0, 0), (2, 1), (0, 0)))  # conv W padding

    # conv rows r = 2p0-1 .. 2p0+2P-1 (local cr = 0..2P); tap (dy, dx) of
    # the 4x4 s2d kernel reads s2d rows (r-2)+dy -> local slab row cr+1+dy
    n_conv = 2 * P + 1
    m = n_conv * w
    slabs = [
        xs[:, 1 + dy: 1 + dy + n_conv, dx: dx + w, :].reshape(m, c4)
        for dy in range(4) for dx in range(4)
    ]
    patches = jnp.concatenate(slabs, axis=-1)  # (M, 256)
    acc = lax.dot_general(patches, w_ref[...],
                          dimension_numbers=(((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + b_ref[...], 0.0).reshape(n_conv, w, o)

    # conv row -1 (only present in the first block) is the pool's -inf pad
    rid = lax.broadcasted_iota(jnp.int32, (n_conv, 1, 1), 0)
    y = jnp.where((rid > 0) | (ri > 0), y, _NEG)

    # maxpool rows: pooled q needs conv local rows 2q, 2q+1, 2q+2.
    # Append one -inf row -> (2P+2) rows -> phase reshape (P+1, 2, ...):
    # A[q] = row 2q, B[q] = row 2q+1; pooled = max(A[q], B[q], A[q+1]).
    yp = jnp.concatenate([y, jnp.full((1, w, o), _NEG, y.dtype)], axis=0)
    ab = yp.reshape(P + 1, 2, w, o)
    a, b = ab[:, 0], ab[:, 1]
    rm = jnp.maximum(jnp.maximum(a[:P], b[:P]), a[1:])  # (P, W/2, O)

    # maxpool cols: pad one -inf col each side -> phase reshape:
    # E[j] = col 2j-1, F[j] = col 2j; pooled c = max(E[c], F[c], E[c+1]).
    wp = w // 2
    rmp = jnp.concatenate(
        [jnp.full((P, 1, o), _NEG, rm.dtype), rm,
         jnp.full((P, 1, o), _NEG, rm.dtype)], axis=1)
    ef = rmp.reshape(P, wp + 1, 2, o)
    e, f = ef[:, :, 0], ef[:, :, 1]
    out = jnp.maximum(jnp.maximum(e[:, :wp], f[:, :wp]), e[:, 1:])
    out_ref[...] = out.reshape(1, P, wp, o).astype(out_ref.dtype)


def _pick_rows(hp: int, w2: int, o: int) -> int:
    """Largest even divisor of Hp whose buffers fit a ~4MB budget."""
    best = 2
    for p in range(2, hp + 1, 2):
        if hp % p:
            continue
        patches = (2 * p + 1) * w2 * 256 * 2  # bf16
        acc = (2 * p + 1) * w2 * o * 4
        if patches + 2 * acc <= (4 << 20):
            best = p
    return best


def fused_stem(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    out_dtype=None,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """``maxpool3x3/s2/p1(relu(conv7x7/s2/p3(x, w) + bias))`` in one kernel.

    Args:
        x: ``(N, H, W, C)`` input, ``C <= 4``, H % 8 == 0, W % 4 == 0.
        w: ``(7, 7, C, O)`` HWIO conv kernel (BN already folded by the
            deployment pass).
        bias: ``(O,)`` folded conv+BN bias, or None.
    Returns:
        ``(N, H/4, W/4, O)`` pooled stem output.
    """
    n, h, ws, c = x.shape
    assert c <= 4 and h % 8 == 0 and ws % 4 == 0, x.shape
    o = w.shape[-1]
    hp, wp = h // 4, ws // 4
    out_dtype = x.dtype if out_dtype is None else out_dtype

    p = rows_per_step or _pick_rows(hp, ws // 2, o)
    assert hp % p == 0 and p % 2 == 0, (p, hp)
    nr = hp // p

    # outside-the-kernel rearrangement: channel pad to 4 + W-pair merge
    x4 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 4 - c))) if c < 4 else x
    xwr = x4.reshape(n, h, ws // 2, 8)

    wf = transform_stem_kernel(w).reshape(256, o).astype(x.dtype)
    bf = (jnp.zeros((o,), jnp.float32) if bias is None
          else bias.astype(jnp.float32)).reshape(1, o)

    def idx_mid(b, ri):
        return (b, ri, 0, 0)

    def idx_top(b, ri):
        return (b, jnp.maximum(ri * 4 * p - 8, 0) // 8, 0, 0)

    def idx_bot(b, ri):
        return (b, jnp.minimum(ri * 4 * p + 4 * p, h - 8) // 8, 0, 0)

    return pl.pallas_call(
        functools.partial(_kernel, p_rows=p),
        grid=(n, nr),
        in_specs=[
            pl.BlockSpec((1, 4 * p, ws // 2, 8), idx_mid,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, ws // 2, 8), idx_top,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, ws // 2, 8), idx_bot,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, o), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda b, ri: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, wp, o), idx_mid,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, o), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (h // 2) * (ws // 2) * 256 * o,
            bytes_accessed=(n * h * ws * 4 * x.dtype.itemsize
                            + n * hp * wp * o
                            * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xwr, xwr, xwr, wf, bf)


def fused_stem_reference(x, w, bias=None, *, out_dtype=None) -> jax.Array:
    """Pure-jnp oracle for :func:`fused_stem` (f32, CPU-runnable)."""
    from .. import functional as F

    out_dtype = x.dtype if out_dtype is None else out_dtype
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (2, 2),
        ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    return F.max_pool(y, 3, 2, 1).astype(out_dtype)


# ---------------------------------------------------------------------------
# v2: H-oct lane merge + row-phase decomposition (B=1)


def _phase_selectors():
    """Per-phase tap-selection matrices S_a (K_a, 256).

    Phase ``a = conv_row % 4``. The s2d input is lane-merged by raw-row
    OCTS (8 raw rows = 4 s2d rows -> lane order (qi, dj, c), 64 lanes), so
    one slab per (oct offset, dx) carries FOUR s2d rows. A conv row r=4p+a
    reads s2d rows r-2..r+1, which span the oct offsets ``_DELTAS[a]``;
    lane (qi, dj, c) of oct p+d is s2d row 4(p+d)+qi//2, i.e. tap
    ``dy = 4d + qi//2 - a + 2`` (zero weight when outside 0..3).
    ``W_a = S_a @ w2d`` with ``w2d`` the (256, O) s2d kernel of
    :func:`transform_stem_kernel` (row order (ki, kj, di, dj, c)).
    """
    import numpy as np

    sels = []
    for a in range(4):
        deltas = _DELTAS[a]
        k_a = len(deltas) * 4 * 64
        s = np.zeros((k_a, 256), np.float32)
        for di_idx, d in enumerate(deltas):
            for dx in range(4):
                for qi in range(8):
                    dy = 4 * d + qi // 2 - a + 2
                    if not 0 <= dy < 4:
                        continue
                    for dj in range(2):
                        for c in range(4):
                            row = (di_idx * 4 + dx) * 64 + qi * 8 + dj * 4 + c
                            src = (dy * 4 + dx) * 16 + (qi % 2) * 8 + dj * 4 + c
                            s[row, src] = 1.0
        sels.append(s)
    return sels


_DELTAS = {0: (-1, 0), 1: (-1, 0), 2: (0,), 3: (0, 1)}
_SELS_CACHE = {}


def _stem_v2_kernel(x_ref, w0_ref, w1_ref, w2_ref, w3_ref, b_ref, out_ref):
    v = x_ref[...]  # (1, H, W/2, 8) bf16, W-pairs on lanes
    _, h, wm, c8 = v.shape
    no = h // 8          # octs
    ncr = h // 2         # conv rows (112)
    p_rows = ncr // 4    # rows per phase (28)
    o = out_ref.shape[-1]

    # H-oct merge: raw rows 8G..8G+7 -> lanes (qi, dj, c)
    vp = v.reshape(no, 8, wm, c8)
    s8 = jnp.concatenate([vp[:, i] for i in range(8)], axis=-1)  # (no,wm,64)
    # conv W padding (2, 1) in s2d cols == lane-group cols
    s8 = jnp.pad(s8, ((1, 1), (0, 0), (0, 0)))      # zero octs top/bottom
    s8 = jnp.pad(s8, ((0, 0), (2, 1), (0, 0)))      # W pad

    w_refs = (w0_ref, w1_ref, w2_ref, w3_ref)
    ys = []
    m = p_rows * wm
    for a in range(4):
        slabs = [
            s8[1 + d: 1 + d + p_rows, dx: dx + wm, :].reshape(m, 64)
            for d in _DELTAS[a] for dx in range(4)
        ]
        patches = jnp.concatenate(slabs, axis=-1) if len(slabs) > 1 else slabs[0]
        acc = lax.dot_general(patches, w_refs[a][...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + b_ref[...], 0.0).reshape(p_rows, wm, o)
        ys.append(y)

    # maxpool W (3/s2/p1) inside each row phase: pooled col t = max of conv
    # cols 2t-1, 2t, 2t+1 via the E/F phase trick
    wp = wm // 2
    pooled_w = []
    for y in ys:
        yp = jnp.concatenate(
            [jnp.full((p_rows, 1, o), _NEG, y.dtype), y,
             jnp.full((p_rows, 1, o), _NEG, y.dtype)], axis=1)
        ef = yp.reshape(p_rows, wp + 1, 2, o)
        e, f = ef[:, :, 0], ef[:, :, 1]
        pooled_w.append(jnp.maximum(jnp.maximum(e[:, :wp], f[:, :wp]),
                                    e[:, 1:]))
    a0, a1, a2, a3 = pooled_w

    # maxpool H across row phases: pooled row s needs conv rows 2s-1..2s+1.
    # s = 2u:   rows 4u-1 (a3, p=u-1), 4u (a0), 4u+1 (a1)
    # s = 2u+1: rows 4u+1 (a1), 4u+2 (a2), 4u+3 (a3)
    a3_up = jnp.concatenate(
        [jnp.full((1, wp, o), _NEG, a3.dtype), a3[:-1]], axis=0)
    p_even = jnp.maximum(jnp.maximum(a3_up, a0), a1)
    p_odd = jnp.maximum(jnp.maximum(a1, a2), a3)
    out = jnp.concatenate([p_even[:, None], p_odd[:, None]], axis=1)
    out_ref[...] = out.reshape(1, 2 * p_rows, wp, o).astype(out_ref.dtype)


def fused_stem_v2(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """B=1 stem megakernel, phase-decomposed (see :func:`fused_stem`).

    Same math as v1 but the H-pair lane merge becomes an H-OCT merge
    (64-lane slabs instead of 16-lane), splitting conv rows into 4
    ``r % 4`` phases whose taps align with oct boundaries. Slab assembly —
    v1's dominant cost (VPU copy time scales with slab ROWS touched, not
    lanes used, so 16-lane slabs waste 7/8 of each vreg) — drops from
    16 row-passes to 7, and the maxpool runs entirely in phase space.
    Measured v5e B=1: see module docstring. Scope: batch 1 (grid-free
    whole-image kernel), H % 16 == 0, W % 4 == 0.
    """
    n, h, ws, c = x.shape
    assert n == 1, "fused_stem_v2 is a B=1 kernel (use fused_stem beyond)"
    assert c <= 4 and h % 16 == 0 and ws % 4 == 0, x.shape
    o = w.shape[-1]
    hp, wp = h // 4, ws // 4
    out_dtype = x.dtype if out_dtype is None else out_dtype

    x4 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 4 - c))) if c < 4 else x
    xwr = x4.reshape(n, h, ws // 2, 8)

    w2d = transform_stem_kernel(w).reshape(256, o).astype(x.dtype)
    if "sels" not in _SELS_CACHE:  # o-independent tap-selection matrices
        _SELS_CACHE["sels"] = _phase_selectors()
    was = [jnp.asarray(s, x.dtype) @ w2d for s in _SELS_CACHE["sels"]]
    bf = (jnp.zeros((o,), jnp.float32) if bias is None
          else bias.astype(jnp.float32)).reshape(1, o)

    return pl.pallas_call(
        _stem_v2_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, hp, wp, o), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (h // 2) * (ws // 2) * (512 * 3 + 256) // 4 * o // 64,
            bytes_accessed=h * ws * 4 * x.dtype.itemsize + hp * wp * o * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xwr, *was, bf)


# ---------------------------------------------------------------------------
# v3: H-oct x W-quad lane merge, 8 (row, col) phases (B=1)

_DELTAS_W = {0: (-1, 0), 1: (-1, 0, 1)}


def _phase_selectors_v3():
    """Tap selectors S_(a,b) ((len(DH)*len(DW))*128, 256) for v3.

    Lanes hold (qi, wq, c) — raw-row-in-oct, raw-col-in-quad, channel. A
    conv position (r=4p+a, j=2q+b) reads oct offsets DH[a] and W-quad
    offsets DW[b]; lane (qi, wq, c) of (oct p+dh, quad q+dw) is tap
    ``dy = 4dh + qi//2 - a + 2``, ``dx = 2dw + wq//2 - b + 2`` (zero
    weight outside 0..3).
    """
    import numpy as np

    sels = {}
    for a in range(4):
        for b in range(2):
            dhs, dws = _DELTAS[a], _DELTAS_W[b]
            k = len(dhs) * len(dws) * 128
            s = np.zeros((k, 256), np.float32)
            for hi, dh in enumerate(dhs):
                for wi, dw in enumerate(dws):
                    base = (hi * len(dws) + wi) * 128
                    for qi in range(8):
                        dy = 4 * dh + qi // 2 - a + 2
                        if not 0 <= dy < 4:
                            continue
                        for wq in range(4):
                            dx = 2 * dw + wq // 2 - b + 2
                            if not 0 <= dx < 4:
                                continue
                            for c in range(4):
                                row = base + qi * 16 + wq * 4 + c
                                src = ((dy * 4 + dx) * 16
                                       + (qi % 2) * 8 + (wq % 2) * 4 + c)
                                s[row, src] = 1.0
            sels[(a, b)] = s
    return sels


_SELS_V3_CACHE = {}


def _stem_v3_prepare(x, w, bias):
    """Host-side v3 prep: W-quad input slab + per-phase weight matrices.

    Returns ``(xwr, was, bf)``: the ``(N, H, W/4, 16)`` input, the 8 phase
    weights ``S_(a,b) @ w2d``, and the ``(1, O)`` f32 bias."""
    n, h, ws, c = x.shape
    assert c <= 4 and h % 16 == 0 and ws % 8 == 0, x.shape
    o = w.shape[-1]
    x4 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 4 - c))) if c < 4 else x
    xwr = x4.reshape(n, h, ws // 4, 16)
    w2d = transform_stem_kernel(w).reshape(256, o).astype(x.dtype)
    if "sels" not in _SELS_V3_CACHE:
        _SELS_V3_CACHE["sels"] = _phase_selectors_v3()
    sels = _SELS_V3_CACHE["sels"]
    was = [jnp.asarray(sels[(a, b)], x.dtype) @ w2d
           for a in range(4) for b in range(2)]
    bf = (jnp.zeros((o,), jnp.float32) if bias is None
          else bias.astype(jnp.float32)).reshape(1, o)
    return xwr, was, bf


def _stem_v3_body(v, w_vals, b_val, o):
    """The v3 stem math on one image's W-quad slab.

    ``v``: ``(1, H, W/4, 16)`` input slab (values, not refs); ``w_vals``:
    the 8 phase weight matrices; ``b_val``: ``(1, o)`` bias. Returns the
    post-maxpool stem output ``(H/4, W/4, o)`` in f32 — shared by the
    standalone stem kernel and the stem+stage chain kernel
    (kernels/model.py :func:`fused_stem_chain`)."""
    _, h, wq_n, c16 = v.shape
    no = h // 8            # octs
    pr = (h // 2) // 4     # conv rows per phase
    pc = wq_n              # conv cols per phase == W-quad count (W/4)

    # H-oct merge: raw rows 8G..8G+7 -> lanes (qi, wq, c)
    vp = v.reshape(no, 8, wq_n, c16)
    s8 = jnp.concatenate([vp[:, i] for i in range(8)], axis=-1)  # (no,wq_n,128)
    s8 = jnp.pad(s8, ((1, 1), (1, 1), (0, 0)))  # zero octs / zero quads

    ys = {}
    m = pr * pc
    for a in range(4):
        for b in range(2):
            dhs, dws = _DELTAS[a], _DELTAS_W[b]
            slabs = [
                s8[1 + dh: 1 + dh + pr, 1 + dw: 1 + dw + pc, :].reshape(m, 128)
                for dh in dhs for dw in dws
            ]
            patches = (jnp.concatenate(slabs, axis=-1)
                       if len(slabs) > 1 else slabs[0])
            acc = lax.dot_general(patches, w_vals[a * 2 + b],
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            ys[(a, b)] = jnp.maximum(acc + b_val, 0.0).reshape(pr, pc, o)

    # maxpool W across col phases: pooled col t = max(conv 2t-1, 2t, 2t+1)
    #   = max(b1[t-1], b0[t], b1[t]); pad b1 left with -inf
    rms = []
    for a in range(4):
        b0, b1 = ys[(a, 0)], ys[(a, 1)]
        b1s = jnp.concatenate(
            [jnp.full((pr, 1, o), _NEG, b1.dtype), b1[:, :-1]], axis=1)
        rms.append(jnp.maximum(jnp.maximum(b1s, b0), b1))
    a0, a1, a2, a3 = rms

    # maxpool H across row phases (as v2)
    a3_up = jnp.concatenate(
        [jnp.full((1, pc, o), _NEG, a3.dtype), a3[:-1]], axis=0)
    p_even = jnp.maximum(jnp.maximum(a3_up, a0), a1)
    p_odd = jnp.maximum(jnp.maximum(a1, a2), a3)
    out = jnp.concatenate([p_even[:, None], p_odd[:, None]], axis=1)
    return out.reshape(2 * pr, pc, o)


def _stem_v3_kernel(x_ref, *refs):
    w_refs, b_ref, out_ref = refs[:8], refs[8], refs[9]
    o = out_ref.shape[-1]
    out = _stem_v3_body(x_ref[...], [w[...] for w in w_refs], b_ref[...], o)
    out_ref[...] = out[None].astype(out_ref.dtype)


def fused_stem_v3(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Phase-decomposed stem megakernel (H-oct x W-quad), any batch.

    On top of :func:`fused_stem_v2`'s H-oct merge, W-QUADS also merge into
    lanes (a free outside reshape), making every slab a FULL 128-lane
    vreg: slab assembly drops another ~1.6x (35 slabs of 1/8-size phases
    vs 28 of 1/4-size) and the oct merge halves. Conv cols split into
    j % 2 phases; the maxpool's W step becomes a cross-phase max.
    Batches run as a grid over images (one image's working set per step —
    round 2's B=64 Pallas-stem failure was the 1/8-lane slab copies of
    the pair-merge form, which this layout removes). Scope: H % 16 == 0,
    W % 8 == 0.
    """
    n, h, ws, c = x.shape
    o = w.shape[-1]
    hp, wp = h // 4, ws // 4
    out_dtype = x.dtype if out_dtype is None else out_dtype
    xwr, was, bf = _stem_v3_prepare(x, w, bias)

    def idx_x(b):
        return (b, 0, 0, 0)

    def idx_w(b):
        return (0, 0)

    return pl.pallas_call(
        _stem_v3_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, ws // 4, 16), idx_x,
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(wa.shape, idx_w, memory_space=pltpu.VMEM)
           for wa in was]
        + [pl.BlockSpec((1, o), idx_w, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hp, wp, o), idx_x,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, o), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (h // 2) * (ws // 2) * 256 * o,
            bytes_accessed=h * ws * 4 * x.dtype.itemsize + hp * wp * o * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xwr, *was, bf)
