"""Binary GEMM kernels over bitpacked weights.

The inference hot path. Two executions of the same math:

- :func:`binary_gemm` — Pallas TPU kernel. Weights live in HBM as packed
  int32 lanes (32x smaller than fp32, 16x smaller than bf16 — this is the
  HBM-bandwidth win). Each grid step DMAs a packed tile into VMEM, expands it
  to ``+/-1`` int8 *in VMEM* (VPU shifts — never materialized in HBM),
  signs the activation tile to int8, and feeds the MXU in its int8 mode
  (2x the bf16 rate on TPU v5e: +/-1 operands are exactly representable, so
  binary nets get the int8 speed tier "for free"), accumulating exactly in
  int32. The per-out-channel ``alpha`` scale and bias fold into the fp32
  epilogue of the last K step, so binarize + matmul + dequant + bias is ONE
  kernel with packed-weight HBM traffic.

- :func:`binary_gemm_reference` — pure-jnp reference used for testing and as
  a CPU fallback.

- :func:`popcount_gemm` — the classical XNOR/popcount formulation
  (``dot = K - 2 * popcount(a XOR w)``) as a Pallas kernel over packed
  activations AND packed weights (both stream from HBM at 1 bit/element).
  Compute runs on the VPU: measured ~29-51 TOP/s-equivalent on v5e vs ~96+
  for the MXU path, so this is the bandwidth-optimal variant for HBM-bound
  shapes, not the default. :func:`popcount_gemm_reference` is the jnp
  oracle for both.

Math contract (matches the QAT fake path, reference bnn/layers/linear.py:22-27):
    ``out = sign(x) @ (alpha_w * sign(W)) * alpha_post + bias * alpha_post``
expressed here as ``out = (sign(x) @ sign(W)) * scale + add`` with
``scale = alpha_w * alpha_post`` and ``add = bias * alpha_post`` precomputed
at deploy time. ``sign(0) == +1`` on the deployed path (see packing.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import pack_bits, packed_words, unpack_bits

__all__ = ["binary_gemm", "binary_gemm_reference", "popcount_gemm",
           "popcount_gemm_reference"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bin_gemm_kernel(x_ref, wp_ref, scale_ref, add_ref, out_ref, acc_ref, *,
                     k_true: int, block_k: int, sign_inputs: bool):
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # sign the activation tile (sign(0) == +1 deployment convention);
    # with sign_inputs=False the caller pre-signed (e.g. before zero-padded
    # patch extraction, where padding must contribute exactly 0) and values
    # are in {-1, 0, +1} — exact in int8
    x = x_ref[...]
    if sign_inputs:
        xs = jnp.where(x >= 0, 1, -1).astype(jnp.int8)
    else:
        xs = x.astype(jnp.int8)

    # expand packed weight tile (block_k//32, bn) -> (+/-1 int8, block_k, bn):
    # word r//32 bit r%32 lands on row r, matching pack_bits' layout
    wp = wp_ref[...]  # uint32
    bkw, bn = wp.shape
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (bkw, 32, bn), 1)
    bits = (wp[:, None, :] >> shifts) & jnp.uint32(1)
    w = (2 * bits.astype(jnp.int32) - 1).reshape(block_k, bn)
    # mask K padding rows to 0 so they contribute nothing
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_k, bn), 0)
    w = jnp.where(rows + k_idx * block_k < k_true, w, jnp.zeros_like(w))

    # int8 x int8 -> int32 on the MXU: exact, and 2x the bf16 rate on v5e
    acc_ref[...] += jax.lax.dot_general(
        xs, w.astype(jnp.int8),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k_idx == nk - 1)
    def _epilogue():
        out_ref[...] = (acc_ref[...].astype(jnp.float32) * scale_ref[...]
                        + add_ref[...])


def binary_gemm(
    x: jax.Array,
    w_packed: jax.Array,
    k: int,
    scale: Optional[jax.Array] = None,
    add: Optional[jax.Array] = None,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    sign_inputs: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """``sign(x) @ unpack(w_packed) * scale + add`` as one Pallas kernel.

    Args:
        x: ``(M, K)`` raw (pre-sign) activations, any float dtype.
        w_packed: ``(ceil(K/32), N)`` uint32 packed weights
            (:func:`pack_bits` of the ``(K, N)`` kernel along axis -2).
        k: the true reduction length K (padding is masked exactly).
        scale: ``(N,)`` per-out-channel multiplier (default 1).
        add: ``(N,)`` per-out-channel addend applied after scaling (default 0).
    """
    m, k_in = x.shape
    kw, n = w_packed.shape
    assert kw == packed_words(k), (kw, k)
    assert k_in == k, (k_in, k)

    scale = jnp.ones((n,), jnp.float32) if scale is None else scale
    add = jnp.zeros((n,), jnp.float32) if add is None else add

    bm = min(block_m, _round_up(m, 32))  # int8 sublane tile is 32
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 256))
    assert bk % 32 == 0
    if sign_inputs and bm < 128:
        # Mosaic (jax 0.9) rejects the in-kernel sign's i1 mask relayout on
        # short row blocks ("Invalid relayout ... vector<64x512xi1>"); the
        # sign is a single cheap XLA pass at these sizes, so hoist it
        x = jnp.where(x >= 0, 1, -1).astype(jnp.int8)
        sign_inputs = False

    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    xq = jnp.pad(x, ((0, mp - m), (0, kp - k))) if (mp != m or kp != k) else x
    wq = w_packed
    if kp // 32 != kw or np_ != n:
        wq = jnp.pad(w_packed, ((0, kp // 32 - kw), (0, np_ - n)))
    sq = jnp.pad(scale.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)
    aq = jnp.pad(add.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)

    grid = (mp // bm, np_ // bn, kp // bk)
    out = pl.pallas_call(
        functools.partial(_bin_gemm_kernel, k_true=k, block_k=bk,
                          sign_inputs=sign_inputs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 32, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * x.dtype.itemsize + kp // 32 * np_ * 4
            + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, wq, sq, aq)
    return out[:m, :n]


def binary_gemm_reference(
    x: jax.Array,
    w_packed: jax.Array,
    k: int,
    scale: Optional[jax.Array] = None,
    add: Optional[jax.Array] = None,
    sign_inputs: bool = True,
) -> jax.Array:
    """jnp reference of :func:`binary_gemm` (also the CPU fallback)."""
    xs = (jnp.where(x >= 0, 1.0, -1.0).astype(jnp.float32) if sign_inputs
          else x.astype(jnp.float32))
    w = unpack_bits(w_packed, k, axis=-2, dtype=jnp.float32)[:k]  # pad rows dropped
    out = xs @ w
    if scale is not None:
        out = out * scale
    if add is not None:
        out = out + add
    return out


def _popcount_gemm_kernel(xp_ref, wp_ref, scale_ref, add_ref, out_ref,
                          acc_ref, *, k_true: int):
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xp = xp_ref[...]  # (bkw, bm) uint32 packed activations, word-major
    wp = wp_ref[...]  # (bkw, bn) uint32 packed weights
    # mismatch counts: popcount(x XOR w) summed over the word axis (axis 0 —
    # the word axis sits on sublanes so both operands meet Mosaic's
    # (8, 128)-tile rule). Padding words are 0 in BOTH operands, so they
    # contribute 0 mismatches and the true-K constant below needs no
    # correction.
    x3 = xp[:, :, None] ^ wp[:, None, :]
    acc_ref[...] += jnp.sum(lax.population_count(x3).astype(jnp.int32),
                            axis=0)

    @pl.when(k_idx == nk - 1)
    def _epilogue():
        dot = k_true - 2 * acc_ref[...]
        out_ref[...] = (dot.astype(jnp.float32) * scale_ref[...]
                        + add_ref[...])


def popcount_gemm(
    x_packed: jax.Array,
    w_packed: jax.Array,
    k: int,
    scale: Optional[jax.Array] = None,
    add: Optional[jax.Array] = None,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_kw: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """XNOR/popcount GEMM over packed activations AND packed weights.

    ``out = (k - 2 * popcount(x_packed XOR w_packed)) * scale + add`` — the
    classical BNN formulation, as a Pallas TPU kernel. Both operands stream
    from HBM at 1 bit/element (activations 32x smaller than f32, 16x smaller
    than bf16), so this is the bandwidth-optimal execution; compute runs on
    the VPU (xor + population_count), which peaks well below the MXU's int8
    rate, so :func:`binary_gemm` remains the default for compute-bound
    shapes (ROADMAP item 5). Use this variant when the GEMM is HBM-bound:
    very large K with small M, serving regimes where activations must stay
    packed between layers, or ICI-sharded layers where the collective moves
    packed lanes.

    Args:
        x_packed: ``(M, ceil(K/32))`` uint32 — :func:`pack_bits` of the
            signed activations along the last axis.
        w_packed: ``(ceil(K/32), N)`` uint32 packed weights.
        k: true reduction length K.
        scale/add: per-out-channel epilogue, as in :func:`binary_gemm`.
    """
    m, kw_in = x_packed.shape
    kw, n = w_packed.shape
    assert kw == packed_words(k), (kw, k)
    assert kw_in == kw, (kw_in, kw)
    scale = jnp.ones((n,), jnp.float32) if scale is None else scale
    add = jnp.zeros((n,), jnp.float32) if add is None else add

    bm = min(block_m, _round_up(m, 128))
    bn = min(block_n, _round_up(n, 128))
    bkw = min(block_kw, _round_up(kw, 8))

    mp, np_, kwp = _round_up(m, bm), _round_up(n, bn), _round_up(kw, bkw)
    # word-major activations: the packed word axis lands on sublanes
    xq = jnp.swapaxes(x_packed, 0, 1)  # (kw, m) — 1/32 of the f32 bytes
    if mp != m or kwp != kw:
        xq = jnp.pad(xq, ((0, kwp - kw), (0, mp - m)))
    wq = w_packed
    if kwp != kw or np_ != n:
        wq = jnp.pad(w_packed, ((0, kwp - kw), (0, np_ - n)))
    sq = jnp.pad(scale.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)
    aq = jnp.pad(add.astype(jnp.float32), (0, np_ - n)).reshape(1, np_)

    grid = (mp // bm, np_ // bn, kwp // bkw)
    out = pl.pallas_call(
        functools.partial(_popcount_gemm_kernel, k_true=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bkw, bm), lambda i, j, kk: (kk, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkw, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kwp,  # xor+popcount per word pair
            bytes_accessed=mp * kwp * 4 + kwp * np_ * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, wq, sq, aq)
    return out[:m, :n]


def popcount_gemm_reference(
    x: jax.Array,
    w_packed: jax.Array,
    k: int,
    scale: Optional[jax.Array] = None,
    add: Optional[jax.Array] = None,
) -> jax.Array:
    """XNOR/popcount formulation over packed operands.

    Packs the activations on the fly, then
    ``dot = K - 2 * sum_words popcount(a XOR w)``. Padding lanes hold 0-bits
    in both operands, so they cancel in the XOR and need no correction.
    """
    xp = pack_bits(x, axis=-1)  # (M, Kw)
    # (M, Kw) x (Kw, N) -> mismatch counts via popcount of XOR
    mism = jnp.sum(
        lax.population_count(xp[:, :, None] ^ w_packed[None, :, :]),
        axis=1,
    ).astype(jnp.int32)
    out = (k - 2 * mism).astype(jnp.float32)
    if scale is not None:
        out = out * scale
    if add is not None:
        out = out + add
    return out
