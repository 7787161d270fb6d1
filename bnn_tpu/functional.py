"""Functional NN ops with torch-like geometry on channels-last layouts.

TPU-first conventions used across the framework:

- Activations are channels-LAST (``N, L, C`` / ``N, H, W, C``) so the channel
  axis maps onto the TPU lane dimension (128 lanes) — this is both what XLA
  prefers for convolutions and what the bitpacked inference engine needs (the
  packed axis must be the innermost one).
- Conv kernels are ``HWIO`` (``(W, I, O)`` for 1-D), linear kernels are
  ``(in, out)`` — out-channel is always the LAST kernel axis.

The reference delegates all of this to torch/cuDNN (bnn/layers/conv.py:37,92,
bnn/layers/linear.py:25); here it is explicit ``lax`` so every op lowers to a
single fused XLA HLO.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Size = Union[int, Sequence[int]]


def _ntuple(x: Size, n: int) -> Tuple[int, ...]:
    if isinstance(x, (tuple, list)):
        if len(x) == 1:
            return tuple(x) * n
        assert len(x) == n, f"expected {n}-tuple, got {x}"
        return tuple(x)
    return (x,) * n


def to_lax_padding(padding: Union[str, Size], nd: int):
    """Normalize torch-style padding (int / tuple / 'same' / 'valid') to lax form."""
    if isinstance(padding, str):
        return padding.upper()
    pads = _ntuple(padding, nd)
    return [(p, p) for p in pads]


def conv(
    x: jax.Array,
    kernel: jax.Array,
    stride: Size = 1,
    padding: Union[str, Size] = 0,
    dilation: Size = 1,
    groups: int = 1,
    preferred_element_type=None,
) -> jax.Array:
    """N-D convolution, channels-last activations, ``(*spatial, I, O)`` kernel.

    Equivalent of ``F.conv1d/conv2d`` (reference bnn/layers/conv.py:37,92) for
    ``x`` of rank 3 (NLC) or 4 (NHWC).
    """
    nd = x.ndim - 2
    dn = lax.conv_dimension_numbers(
        x.shape,
        kernel.shape,
        ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NWC", "WIO", "NWC"),
    )
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=_ntuple(stride, nd),
        padding=to_lax_padding(padding, nd),
        rhs_dilation=_ntuple(dilation, nd),
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=preferred_element_type,
    )


def linear(x: jax.Array, kernel: jax.Array, bias: jax.Array = None) -> jax.Array:
    """``x @ kernel (+ bias)`` with kernel shape ``(in, out)``."""
    y = jnp.matmul(x, kernel)
    if bias is not None:
        y = y + bias
    return y


def _pool_dims(x_ndim: int, k: Size, s: Size):
    nd = x_ndim - 2
    window = (1,) + _ntuple(k, nd) + (1,)
    strides = (1,) + _ntuple(s if s is not None else k, nd) + (1,)
    return nd, window, strides


def _pool_padding(nd: int, window, strides, spatial, padding: Size, ceil_mode: bool):
    pads = _ntuple(padding, nd)
    out = [(0, 0)]
    for i in range(nd):
        lo = hi = pads[i]
        if ceil_mode:
            size, w, st = spatial[i], window[i + 1], strides[i + 1]
            out_ceil = math.ceil((size + 2 * pads[i] - w) / st) + 1
            # torch: last window must start inside the (left-padded) input
            if (out_ceil - 1) * st >= size + pads[i]:
                out_ceil -= 1
            needed = (out_ceil - 1) * st + w - size - pads[i]
            hi = max(needed, pads[i])
        out.append((lo, hi))
    out.append((0, 0))
    return out


# Gradient routing through max_pool ties. 'exact' = XLA select_and_scatter
# (first-argmax, torch-identical — the default and the parity oracle).
# 'index' = the SAME first-argmax routing, computed without
# select_and_scatter: the backward derives an int8 per-window argmax map
# (reverse-order strided compares) and assembles the input gradient from
# interior-dilated lax.pad placements of each slot's claimed cotangent.
# Two reasons it exists despite measuring SLOWER in-context on v5e (23.4
# vs 12.9 ms/step at B=64 — XLA materializes each dilated pad as a full
# input-sized array instead of fusing them; an earlier phase-interleave
# formulation lost on relayout copies, 16.3 ms — see
# benchmarks/artifacts/profile_train_b64_poolindex.json):
# (a) it is MORE torch-accurate than 'exact': when (H + 2p - k) % s != 0
#     leaves trailing input rows uncovered by any window, JAX's
#     reduce_window transpose scatters gradient into them while torch
#     (and this mode) gives them exactly zero
#     (tests/test_ops.py::test_index_mode_beats_exact_on_uncovered_tail);
# (b) its residual is analysis groundwork for a Pallas pool-backward
#     kernel (the remaining 883us select_and_scatter sink).
# 'all_ties' = every tied maximum receives the full window gradient: a
# symmetric backward built from strided slices + scatter-adds. Differs
# from torch ONLY when a window holds exact duplicates of its max —
# common post-ReLU, so this is an opt-in semantics knob
# (benchmarks/train_sweep.py measures it), never a silent default.
_POOL_GRAD_MODE = "exact"


def set_pool_grad_mode(mode: str) -> str:
    """Set max_pool's gradient tie routing; returns the previous mode.

    TRACE-TIME knob: the mode is read when ``max_pool`` is traced, so it
    must be set BEFORE ``jit``/``grad`` tracing. Already-compiled
    functions keep whatever mode they were traced with (jit caches are
    keyed on shapes/dtypes, not on this global) — re-jit (or call with
    new shapes) after switching to actually change routing. Non-default
    modes apply to 2-D floating max_pool only; 1-D (``NLC``) pooling
    always uses the 'exact' select_and_scatter gradient.
    """
    global _POOL_GRAD_MODE
    if mode not in ("exact", "index", "all_ties"):
        # must raise, not assert: under ``python -O`` a typo'd mode would
        # be stored and max_pool would silently fall through to 'exact'
        raise ValueError(f"unknown pool grad mode {mode!r}; "
                         "expected 'exact', 'index' or 'all_ties'")
    prev, _POOL_GRAD_MODE = _POOL_GRAD_MODE, mode
    return prev


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_all_ties(x, window, strides, pad):
    neg_inf = -jnp.inf
    return lax.reduce_window(x, neg_inf, lax.max, window, strides, pad)


def _mp_at_fwd(x, window, strides, pad):
    out = _max_pool_all_ties(x, window, strides, pad)
    return out, (x, out)


def _mp_at_bwd(window, strides, pad, res, g):
    x, out = res
    _, kh, kw, _ = window
    _, sh, sw, _ = strides
    (_, _), (ph_lo, _), (pw_lo, _), (_, _) = pad
    H, W = x.shape[1], x.shape[2]
    oH, oW = out.shape[1], out.shape[2]
    grad = jnp.zeros_like(x)
    for ki in range(kh):
        for kj in range(kw):
            # window w covers input p = w*s + k - pad_lo; keep valid w
            wi0 = max(0, -(-(0 - ki + ph_lo) // sh))
            wj0 = max(0, -(-(0 - kj + pw_lo) // sw))
            wi1 = min(oH, (H - 1 - ki + ph_lo) // sh + 1)
            wj1 = min(oW, (W - 1 - kj + pw_lo) // sw + 1)
            if wi1 <= wi0 or wj1 <= wj0:
                continue
            i0, j0 = wi0 * sh + ki - ph_lo, wj0 * sw + kj - pw_lo
            i1, j1 = (wi1 - 1) * sh + ki - ph_lo + 1, \
                (wj1 - 1) * sw + kj - pw_lo + 1
            xs = x[:, i0:i1:sh, j0:j1:sw, :]
            os_ = out[:, wi0:wi1, wj0:wj1, :]
            c = jnp.where(xs == os_, g[:, wi0:wi1, wj0:wj1, :], 0)
            # future JAX errors on implicit down-cast scatter values
            grad = grad.at[:, i0:i1:sh, j0:j1:sw, :].add(
                c.astype(grad.dtype))
    return (grad,)


_max_pool_all_ties.defvjp(_mp_at_fwd, _mp_at_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_index(x, window, strides, pad):
    neg_inf = -jnp.inf
    return lax.reduce_window(x, neg_inf, lax.max, window, strides, pad)


def _window_slices(xp, window, strides, out_shape):
    """Strided slices of the padded input, one per window slot, each shaped
    like the pool output (scan order: row-major over the window)."""
    _, kh, kw, _ = window
    _, sh, sw, _ = strides
    N, oH, oW, C = out_shape
    for ki in range(kh):
        for kj in range(kw):
            yield ki * kw + kj, lax.slice(
                xp,
                (0, ki, kj, 0),
                (N, ki + (oH - 1) * sh + 1, kj + (oW - 1) * sw + 1, C),
                (1, sh, sw, 1),
            )


def _mp_idx_fwd(x, window, strides, pad):
    out = _max_pool_index(x, window, strides, pad)
    return out, (x, out)


def _mp_idx_bwd(window, strides, pad, res, g):
    x, out = res
    _, kh, kw, _ = window
    _, sh, sw, _ = strides
    (_, _), (ph_lo, _), (pw_lo, _), (_, _) = pad
    N, oH, oW, C = out.shape
    _, H, W, _ = x.shape
    # first-tie argmax map: scan window slots in REVERSE so the earliest
    # match survives — identical routing to select_and_scatter. One small
    # (out-shaped, int8) intermediate; XLA fuses the compares into a
    # single pass over the window slices.
    xp = jnp.pad(x, pad, constant_values=-jnp.inf)
    idx = jnp.zeros(out.shape, jnp.int8)
    for kpos, xs in sorted(
            _window_slices(xp, window, strides, out.shape), reverse=True):
        idx = jnp.where(xs == out, jnp.int8(kpos), idx)
    # scatter-free assembly: each window slot's claimed gradient is an
    # out-shaped plane placed on the input grid by an interior-dilated
    # lax.pad (the conv-gradient idiom XLA fuses into one output pass);
    # negative edge pads crop the contributions that landed in padding
    acc = None
    for kpos in range(kh * kw):
        ki, kj = divmod(kpos, kw)
        term = jnp.where(idx == jnp.int8(kpos), g, 0)
        lo_i, lo_j = ki - ph_lo, kj - pw_lo
        hi_i = H - ((oH - 1) * sh + ki - ph_lo) - 1
        hi_j = W - ((oW - 1) * sw + kj - pw_lo) - 1
        placed = lax.pad(term, jnp.zeros((), g.dtype), [
            (0, 0, 0), (lo_i, hi_i, sh - 1), (lo_j, hi_j, sw - 1), (0, 0, 0),
        ])
        acc = placed if acc is None else acc + placed
    return (acc,)


_max_pool_index.defvjp(_mp_idx_fwd, _mp_idx_bwd)


def max_pool(x: jax.Array, kernel_size: Size, stride: Size = None, padding: Size = 0,
             ceil_mode: bool = False) -> jax.Array:
    """Max pooling over channels-last input (torch ``nn.MaxPool1d/2d`` semantics)."""
    nd, window, strides = _pool_dims(x.ndim, kernel_size, stride)
    pad = _pool_padding(nd, window, strides, x.shape[1:-1], padding, ceil_mode)
    if (_POOL_GRAD_MODE == "all_ties" and x.ndim == 4
            and jnp.issubdtype(x.dtype, jnp.floating)):
        return _max_pool_all_ties(x, window, strides, tuple(pad))
    if (_POOL_GRAD_MODE == "index" and x.ndim == 4
            and jnp.issubdtype(x.dtype, jnp.floating)):
        return _max_pool_index(x, window, strides, tuple(pad))
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, neg_inf, lax.max, window, strides, pad)


def avg_pool(x: jax.Array, kernel_size: Size, stride: Size = None, padding: Size = 0,
             ceil_mode: bool = False, count_include_pad: bool = True) -> jax.Array:
    """Average pooling with torch semantics incl. ``ceil_mode`` and
    ``count_include_pad`` (needed for the BNN downsample path, reference
    bnn/models/resnet.py:130)."""
    nd, window, strides = _pool_dims(x.ndim, kernel_size, stride)
    pad = _pool_padding(nd, window, strides, x.shape[1:-1], padding, ceil_mode)
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pad)
    if count_include_pad and not ceil_mode:
        return summed / math.prod(window)
    # Count, per output position, how many window slots are "countable":
    # real input elements always count; explicitly-padded slots count iff
    # count_include_pad; the ceil_mode extension region never counts (torch
    # semantics).
    pads = _ntuple(padding, nd)
    pad_value = 1.0 if count_include_pad else 0.0
    ones = jnp.ones((1,) + x.shape[1:-1] + (1,), dtype=x.dtype)
    ones = jnp.pad(
        ones, [(0, 0)] + [(p, p) for p in pads] + [(0, 0)],
        constant_values=pad_value,
    )
    # remaining (ceil-extension) padding relative to the explicitly-padded array
    extra = [(0, 0)] + [
        (pad[i + 1][0] - pads[i], pad[i + 1][1] - pads[i]) for i in range(nd)
    ] + [(0, 0)]
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, extra)
    return summed / counts


def adaptive_avg_pool(x: jax.Array, output_size: Size = 1) -> jax.Array:
    """Adaptive average pool with torch's variable-window semantics:
    output bin ``i`` averages rows ``[floor(i*S/o), ceil((i+1)*S/o))``.

    The divisible case reduces to a plain strided pool; the non-divisible
    case unrolls the (static, small) output grid — a fixed-kernel
    approximation here would be silently numerically wrong vs torch
    (reference models pool to (1, 1), bnn/models/resnet.py:100, but the
    API accepts any size)."""
    nd = x.ndim - 2
    out = _ntuple(output_size, nd)
    if all(o == 1 for o in out):
        return jnp.mean(x, axis=tuple(range(1, 1 + nd)), keepdims=True)
    spatial = x.shape[1:-1]
    if all(s % o == 0 for s, o in zip(spatial, out)):
        ks = tuple(s // o for s, o in zip(spatial, out))
        return avg_pool(x, ks, stride=ks)

    def _pool_axis(v, axis, size, o):
        bins = []
        for i in range(o):
            lo, hi = (i * size) // o, ((i + 1) * size + o - 1) // o
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(lo, hi)
            bins.append(jnp.mean(v[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(bins, axis=axis)

    for d in range(nd):
        x = _pool_axis(x, 1 + d, spatial[d], out[d])
    return x


def flatten(x: jax.Array, start_axis: int = 1) -> jax.Array:
    return x.reshape(x.shape[:start_axis] + (-1,))
