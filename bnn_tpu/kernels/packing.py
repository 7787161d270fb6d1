"""Bitpacking: fp32/bf16 sign bits -> int32 lanes (32x compression).

The execution layer the reference explicitly does not include (reference
README.md:22: a hardware-friendly implementation "the current repo doesn't
include"). Sign convention for the deployed path: ``bit = (x >= 0)``, i.e.
``sign(0) == +1`` — the standard BNN deployment convention. (The QAT path
keeps torch-compatible ``sign(0) == 0``; exact zeros are the only divergence
and padding is masked exactly, see :func:`unpack_bits`.)

Packing is done along the LAST axis — the channel axis in this framework's
channels-last layout — so packed lanes sit on the TPU lane dimension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pack_bits", "unpack_bits", "packed_words"]


def packed_words(k: int) -> int:
    """Number of int32 words needed to pack ``k`` bits."""
    return -(-k // 32)


def pack_bits(x: jax.Array, axis: int = -2) -> jax.Array:
    """Pack the sign bits of ``x`` along ``axis`` into uint32 words.

    ``axis`` defaults to -2: for a kernel of shape ``(..., K, N)`` (in-features
    second-to-last, out-features last) the reduction axis is packed, keeping
    out-channels on the lane dimension. The packed axis is padded to a
    multiple of 32 with 0-bits; consumers mask them out using the true K.

    Returns an array with ``shape[axis] == ceil(K / 32)`` and dtype uint32,
    bit ``j`` of word ``w`` holding the sign of element ``w * 32 + j``.
    """
    axis = axis % x.ndim
    k = x.shape[axis]
    kp = packed_words(k) * 32
    if kp != k:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, kp - k)
        # pad with -1.0 so the padded sign bit is 0
        x = jnp.pad(x, pad, constant_values=-1.0)
    bits = (x >= 0).astype(jnp.uint32)
    # split axis into (words, 32)
    new_shape = x.shape[:axis] + (kp // 32, 32) + x.shape[axis + 1:]
    bits = bits.reshape(new_shape)
    shifts = jnp.arange(32, dtype=jnp.uint32).reshape(
        (1,) * (axis + 1) + (32,) + (1,) * (x.ndim - axis - 1)
    )
    return jnp.sum(bits << shifts, axis=axis + 1, dtype=jnp.uint32)


def unpack_bits(packed: jax.Array, k: int, axis: int = -2,
                dtype=jnp.float32) -> jax.Array:
    """Inverse of :func:`pack_bits`: expand words back to ``+/-1`` values,
    with the ``k``-tail padding masked to exactly ``0`` (so a padded lane
    contributes nothing to a dot product)."""
    axis = axis % packed.ndim
    words = packed.shape[axis]
    shifts = jnp.arange(32, dtype=jnp.uint32).reshape(
        (1,) * (axis + 1) + (32,) + (1,) * (packed.ndim - axis - 1)
    )
    expanded = jnp.expand_dims(packed, axis + 1)
    bits = (expanded >> shifts) & jnp.uint32(1)
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        values = (2 * bits.astype(jnp.int32) - 1).astype(dtype)
    else:
        values = (2.0 * bits.astype(dtype) - 1.0)
    new_shape = packed.shape[:axis] + (words * 32,) + packed.shape[axis + 1:]
    values = values.reshape(new_shape)
    if words * 32 != k:
        idx = jnp.arange(words * 32).reshape(
            (1,) * axis + (-1,) + (1,) * (packed.ndim - axis - 1)
        )
        values = jnp.where(idx < k, values, jnp.zeros_like(values))
    return values
