"""Fused Pallas binary convolution.

One kernel per (batch-element, out-channel-tile) grid step:

    sign(x) -> int8  ->  sum over filter taps of (shifted x-slab @ W[tap])
    on the MXU's int8 mode  ->  exact int32 accumulation  ->  f32 dequant
    epilogue (per-channel scale + add)

vs the XLA path (sign pass + conv + scale), this fuses the activation sign
and the dequant into the conv and keeps the +/-1 int8 activations entirely in
VMEM — no intermediate HBM materialization. Weights arrive as +/-1 int8
(unpacked in-graph from packed storage by the caller; they are tiny next to
activations).

Scope: stride 1, square odd kernels, symmetric padding, groups=1, NHWC.
Other geometries fall back to the XLA path in the deployment layer.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["binary_conv2d_s1", "supports"]


def supports(kernel_size, stride, padding, dilation, groups) -> bool:
    kh, kw = kernel_size
    return (
        kh == kw and kh % 2 == 1
        and tuple(stride) == (1, 1)
        and tuple(dilation) == (1, 1)
        and groups == 1
        and not isinstance(padding, str)
        and tuple(padding) == (kh // 2, kh // 2)
    )


def _kernel(x_ref, w_ref, scale_ref, add_ref, out_ref, *, kh: int, kw: int,
            pad: int):
    x = x_ref[...]  # (NB, H, W, C) float — NB batch elements per grid step
    xs = jnp.where(x >= 0, 1, -1).astype(jnp.int8)
    if pad:
        xs = jnp.pad(xs, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    _, h, w_sp, _ = x.shape
    oh, ow = h, w_sp  # stride 1, SAME-style padding

    acc = None
    for dy in range(kh):
        for dx in range(kw):
            slab = xs[:, dy:dy + oh, dx:dx + ow, :]
            tap = w_ref[dy, dx]  # (C, O) int8
            contrib = lax.dot_general(
                slab, tap,
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = contrib if acc is None else acc + contrib
    out_ref[...] = acc.astype(jnp.float32) * scale_ref[0][None, None, :] \
        + add_ref[0][None, None, :]


def binary_conv2d_s1(
    x: jax.Array,
    w_int8: jax.Array,
    scale: Optional[jax.Array] = None,
    add: Optional[jax.Array] = None,
    *,
    block_o: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``conv(sign(x), w) * scale + add`` for stride-1 odd kernels.

    Args:
        x: ``(N, H, W, C)`` raw activations (sign applied in-kernel,
            ``sign(0) == +1``).
        w_int8: ``(kh, kw, C, O)`` int8 ``+/-1`` weights.
        scale/add: ``(O,)`` f32 epilogue (defaults 1 / 0).
    """
    n, h, w_sp, c = x.shape
    kh, kw, c_in, o = w_int8.shape
    assert c_in == c
    pad = kh // 2

    scale = jnp.ones((o,), jnp.float32) if scale is None else scale
    add = jnp.zeros((o,), jnp.float32) if add is None else add

    bo = min(block_o, -(-o // 128) * 128)
    op_ = -(-o // bo) * bo
    if op_ != o:
        w_int8 = jnp.pad(w_int8, ((0, 0), (0, 0), (0, 0), (0, op_ - o)))
        scale = jnp.pad(scale, (0, op_ - o))
        add = jnp.pad(add, (0, op_ - o))

    # batch elements per grid step: grow the per-tap matmul M while keeping
    # x + acc + out comfortably inside VMEM (4 MB per-step working set;
    # the rest of the 16 MB budget covers double-buffering + weights)
    # per-element VMEM: x (f32) + signed copy (int8) + padded copy (int8)
    # + int32 acc + f32 out block, with headroom for Mosaic's own buffers
    per_elem = h * w_sp * (c * (x.dtype.itemsize + 2) + bo * 8)
    nb = max(1, min(n, (4 << 20) // max(per_elem, 1)))
    while n % nb:
        nb -= 1

    grid = (n // nb, op_ // bo)
    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, pad=pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, h, w_sp, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, c, bo), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bo), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bo), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h, w_sp, bo), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w_sp, op_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_sp * o * c * kh * kw,
            bytes_accessed=(n * h * w_sp * c * x.dtype.itemsize
                            + kh * kw * c * o + n * h * w_sp * o * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_int8, scale.reshape(1, -1), add.reshape(1, -1))
    return out[..., :o]
