"""Packed-activation tensor-parallel serving with overlapped transport.

The last north-star clause (BASELINE.json: "psum/all-gather collectives
overlapped with popcount compute"): binary activations cross chips as
uint32 bit lanes — 1 bit/element, 32x less ICI traffic than f32 — and the
transport is a ppermute RING whose hops interleave with the popcount/MXU
partial products, so XLA's latency-hiding scheduler overlaps communication
with compute instead of serializing a blocking all-gather before each
layer.

Topology (P chips on the ``model`` axis), for a chain of binary layers:

- every layer's packed weights are OUT-CHANNEL sharded: chip p holds all
  ``Kw`` packed rows of its ``N/P`` columns (+ the matching scale/add
  epilogue slice);
- activations live as packed bit-chunks: after layer ``l``, chip p holds
  exactly the sign bits of ITS OWN out-shard — which is chunk p of layer
  ``l+1``'s reduction axis. No gather materializes the full activation;
- each layer runs a K-chunk ring: at step s, chip p computes the partial
  XNOR/popcount product of the bit-chunk it currently holds (origin chip
  ``(p - s) mod P``) against the corresponding Kw/P weight rows, then
  ppermutes the chunk to its ring neighbour. After P steps every chip has
  accumulated the full-K mismatch count for its out-shard:
  ``dot = K - 2 * mismatches``, epilogue applies, sign+pack produces the
  next chunk in place. Only the final layer's float output is
  all-gathered.

Per layer the ring moves ``(P-1)/P * M * K/8`` bytes vs the float
all-gather's ``(P-1)/P * M * K * 4``: exactly 1/32
(:func:`ici_bytes_per_layer` computes both; the test also greps the
compiled HLO to prove the only inter-chip traffic is u32).

Deployment convention: packed bits encode ``sign(0) == +1``
(``zero_to_one``), the same constraint as every packed-activation path
(kernels/gemm.py popcount_gemm). Bit-exact vs replicated serving by
construction — the mismatch counts are integers.

The reference has no tensor parallelism at all (SURVEY.md §2.3); this is
the TPU-native scaling form its README's "up to x64 CPU speed-up" bitpack
claim implies but never builds (reference README.md:22).
"""
from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.packing import pack_bits, packed_words

__all__ = ["PackedTPLayer", "pack_chain_weights", "packed_tp_chain",
           "ici_bytes_per_layer", "reference_chain"]


class PackedTPLayer(NamedTuple):
    """One binary dense layer of a packed-TP chain (global arrays; shard
    with :func:`chain_specs` / ``jax.device_put``)."""

    w_packed: jax.Array   # (Kw, N) uint32 — pack_bits(W, axis=-2)
    scale: jax.Array      # (N,) f32 epilogue multiplier
    add: jax.Array        # (N,) f32 epilogue addend
    k: int                # true reduction length


def pack_chain_weights(weights: Sequence[np.ndarray],
                       scales: Optional[Sequence[np.ndarray]] = None,
                       adds: Optional[Sequence[np.ndarray]] = None
                       ) -> List[PackedTPLayer]:
    """Pack a chain of float (K, N) weight matrices into TP layers."""
    out = []
    for i, w in enumerate(weights):
        k, n = w.shape
        out.append(PackedTPLayer(
            w_packed=pack_bits(jnp.asarray(w), axis=-2),
            scale=jnp.asarray(scales[i] if scales is not None
                              else np.ones(n), jnp.float32),
            add=jnp.asarray(adds[i] if adds is not None
                            else np.zeros(n), jnp.float32),
            k=k,
        ))
    return out


def _check_chain(layers: Sequence[PackedTPLayer], p: int) -> None:
    # real raises, not asserts: under ``python -O`` a mis-sized chain
    # would otherwise slice 0 weight rows per chip and return silently
    # WRONG numerics (dot == K everywhere) with consistent shapes
    for i, l in enumerate(layers):
        kw, n = l.w_packed.shape
        if kw != packed_words(l.k):
            raise ValueError(
                f"layer {i}: packed rows {kw} != packed_words(K={l.k})")
        if l.k % (32 * p) != 0:
            raise ValueError(
                f"layer {i}: K={l.k} must split into {p} whole-word "
                f"chunks (multiple of {32 * p})")
        if i + 1 < len(layers):
            if n != layers[i + 1].k:
                raise ValueError(
                    f"layer {i} out {n} != layer {i + 1} K "
                    f"{layers[i + 1].k}")
            if n % (32 * p) != 0:
                raise ValueError(
                    f"layer {i}: out {n} must be a multiple of {32 * p} "
                    f"to repack into {p} whole-word chunks")
        elif n % p != 0:
            raise ValueError(
                f"final layer out {n} must divide over {p} chips")


def _mismatch_chunk(xbits: jax.Array, wbits: jax.Array) -> jax.Array:
    """(M, Kw') x (Kw', N') -> int32 mismatch counts via popcount(XOR).

    The jnp form — exact, runs anywhere (the CPU-mesh dryrun included).
    On TPU, XLA maps population_count to the VPU; the Pallas
    ``popcount_gemm`` kernel is the tuned single-chip form of the same
    contraction (kernels/gemm.py:196)."""
    return jnp.sum(
        lax.population_count(xbits[:, :, None] ^ wbits[None, :, :]),
        axis=1).astype(jnp.int32)


def ici_bytes_per_layer(m: int, k: int, p: int) -> dict:
    """Analytic ICI bytes moved for one layer's activation transport:
    the packed ring vs a float all-gather of the same activation.

    Only defined for chain-legal geometry (``k`` a multiple of
    ``32 * p`` — the same constraint ``packed_tp_chain`` enforces);
    flooring the per-chip word count for other inputs would fabricate
    ICI savings."""
    if k % (32 * p) != 0:
        raise ValueError(
            f"K={k} is not packed-TP-legal for p={p} (needs a multiple "
            f"of {32 * p}; the chain itself would reject it)")
    packed = (p - 1) * m * (packed_words(k) // p) * 4  # u32 words
    f32_gather = (p - 1) * m * (k // p) * 4
    return {"packed_ring": packed, "f32_all_gather": f32_gather,
            "ratio": f32_gather / packed}


def packed_tp_chain(layers: Sequence[PackedTPLayer], mesh: Mesh,
                    axis: str = "model"):
    """Compile a packed-activation TP forward for a binary dense chain.

    Returns ``fn(x) -> logits`` where ``x`` is the float input
    ``(M, K0)``; the chain signs/packs it, runs every layer with
    out-channel-sharded packed weights and ring-transported packed
    activations, and all-gathers only the final float output.
    """
    p = mesh.shape[axis]
    _check_chain(layers, p)
    n_layers = len(layers)

    # shard every layer's weights/epilogue out-channel (last axis) over the
    # model axis; scalars (k) stay host-side constants
    sharded = [
        PackedTPLayer(
            w_packed=jax.device_put(
                l.w_packed, NamedSharding(mesh, P(None, axis))),
            scale=jax.device_put(l.scale, NamedSharding(mesh, P(axis))),
            add=jax.device_put(l.add, NamedSharding(mesh, P(axis))),
            k=l.k,
        )
        for l in layers
    ]
    ks = [l.k for l in layers]

    def _local(xbits_local, *flat_params):
        # xbits_local: (M, Kw0/P) — this chip's chunk of the input bits
        me = lax.axis_index(axis)
        perm = [(i, (i + 1) % p) for i in range(p)]
        params = [flat_params[3 * i:3 * i + 3] for i in range(n_layers)]

        for li, (wp, scale, add) in enumerate(params):
            kw = packed_words(ks[li])
            chunk = kw // p
            m = xbits_local.shape[0]
            n_local = wp.shape[1]
            mism = jnp.zeros((m, n_local), jnp.int32)
            # K-chunk ring: partial popcount on the chunk in hand while the
            # next hop's ppermute is in flight (unrolled — XLA's
            # latency-hiding scheduler interleaves the collective-permute
            # with the next partial product; a blocking all_gather would
            # serialize transport before any compute)
            for s in range(p):
                src = (me - s) % p  # origin chip of the chunk we hold
                w_rows = lax.dynamic_slice(
                    wp, (src * chunk, 0), (chunk, n_local))
                if s + 1 < p:  # prefetch the next chunk around the ring
                    nxt = lax.ppermute(xbits_local, axis, perm)
                mism = mism + _mismatch_chunk(xbits_local, w_rows)
                if s + 1 < p:
                    xbits_local = nxt
            dot = (ks[li] - 2 * mism).astype(jnp.float32)
            y_local = dot * scale[None, :] + add[None, :]
            if li + 1 < n_layers:
                # sign+pack THIS chip's out-shard: it IS chunk `me` of the
                # next layer's reduction axis — no gather materializes the
                # full activation
                xbits_local = pack_bits(y_local, axis=-1)
            else:
                # only the final float output is gathered
                return lax.all_gather(y_local, axis, axis=1, tiled=True)

    def forward(x: jax.Array) -> jax.Array:
        xbits = pack_bits(x, axis=-1)  # (M, Kw0)
        flat = [a for l in sharded for a in (l.w_packed, l.scale, l.add)]
        in_specs = tuple([P(None, axis)] + [
            spec for _ in sharded
            for spec in (P(None, axis), P(axis), P(axis))])
        return jax.shard_map(
            _local, mesh=mesh, in_specs=in_specs, out_specs=P(None, None),
            check_vma=False,
        )(xbits, *flat)

    return jax.jit(forward)


def reference_chain(layers: Sequence[PackedTPLayer]):
    """Replicated (single-device) oracle: identical math, no sharding.

    Uses the same integer mismatch formulation, so :func:`packed_tp_chain`
    must match it BIT-exactly."""

    def forward(x: jax.Array) -> jax.Array:
        xbits = pack_bits(x, axis=-1)
        for li, l in enumerate(layers):
            mism = _mismatch_chunk(xbits, l.w_packed)
            y = (l.k - 2 * mism).astype(jnp.float32) \
                * l.scale[None, :] + l.add[None, :]
            if li + 1 < len(layers):
                xbits = pack_bits(y, axis=-1)
            else:
                return y

    return jax.jit(forward)
