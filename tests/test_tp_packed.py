"""Packed-activation tensor-parallel serving (inference/tp_packed.py).

The north-star clause "psum/all-gather collectives overlapped with popcount
compute" (BASELINE.json): activations cross the model axis as uint32 bit
lanes on a ppermute ring interleaved with the partial popcount products.
Verified on the virtual 8-device CPU mesh:

- BIT-exact vs the replicated oracle (integer mismatch math);
- the compiled HLO's only inter-layer transport is u32 collective-permute
  (no f32 all-gather except the single final-output gather);
- analytic ICI bytes: exactly 1/32 of the float-gather transport.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnn_tpu.inference import (
    ici_bytes_per_layer,
    pack_chain_weights,
    packed_tp_chain,
)
from bnn_tpu.inference.tp_packed import reference_chain
from bnn_tpu.parallel import make_mesh


def make_chain(sizes, seed=0, scaled=True):
    rng = np.random.default_rng(seed)
    ws = [np.sign(rng.standard_normal((k, n))).astype(np.float32)
          for k, n in zip(sizes[:-1], sizes[1:])]
    scales = [rng.uniform(0.5, 1.5, n).astype(np.float32)
              for n in sizes[1:]] if scaled else None
    adds = [rng.standard_normal(n).astype(np.float32)
            for n in sizes[1:]] if scaled else None
    return pack_chain_weights(ws, scales, adds)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
class TestPackedTPChain:
    def test_bit_exact_vs_replicated(self):
        mesh = make_mesh(data=1, model=8)
        layers = make_chain((512, 768, 512, 256))
        x = jax.random.normal(jax.random.key(0), (16, 512))
        y_tp = packed_tp_chain(layers, mesh)(x)
        y_ref = reference_chain(layers)(x)
        # integer mismatch math on both sides -> identical floats
        np.testing.assert_array_equal(np.asarray(y_tp), np.asarray(y_ref))

    def test_matches_dense_binary_math(self):
        """The packed chain computes the same function as dense sign
        arithmetic: y = (sign(x) @ sign(W)) * scale + add, with
        sign(0) == +1 (the packed-lane deployment convention)."""
        mesh = make_mesh(data=1, model=8)
        layers = make_chain((256, 512, 256), seed=3)
        x = jax.random.normal(jax.random.key(1), (8, 256))
        y_tp = np.asarray(packed_tp_chain(layers, mesh)(x))

        from bnn_tpu.kernels.packing import unpack_bits

        h = np.where(np.asarray(x) >= 0, 1.0, -1.0)
        for l in layers:
            w = np.asarray(unpack_bits(l.w_packed, l.k, axis=-2))
            y = h @ w * np.asarray(l.scale) + np.asarray(l.add)
            h = np.where(y >= 0, 1.0, -1.0)
        np.testing.assert_allclose(y_tp, y, rtol=1e-5, atol=1e-4)

    def test_transport_is_packed_u32_only(self):
        """Compiled-HLO audit: between layers the ONLY collectives are
        u32 collective-permutes (the packed ring); the one f32 all-gather
        is the final output. No f32/bf16 activation gather exists."""
        mesh = make_mesh(data=1, model=8)
        layers = make_chain((512, 512, 512))
        x = jax.random.normal(jax.random.key(0), (16, 512))
        fn = packed_tp_chain(layers, mesh)
        hlo = fn.lower(x).compile().as_text()
        perms = re.findall(r"u32\[[^\]]*\][^\n]*collective-permute", hlo)
        assert perms, "packed ring ppermutes missing from compiled HLO"
        f32_collectives = [
            ln for ln in hlo.splitlines()
            if re.search(r"f32\[[^\]]*\][^\n]*(all-gather|collective-permute"
                         r"|all-reduce)", ln)
        ]
        # the single final-output all-gather is allowed; nothing else
        assert len([ln for ln in f32_collectives if "all-gather" in ln]) <= 1, \
            f32_collectives
        assert not [ln for ln in f32_collectives
                    if "collective-permute" in ln], f32_collectives

    def test_ici_bytes_ratio_is_32x(self):
        for m, k in ((16, 512), (64, 4096), (1, 2048)):
            r = ici_bytes_per_layer(m, k, p=8)
            assert r["ratio"] == 32.0, r

    def test_rejects_non_divisible_chain(self):
        mesh = make_mesh(data=1, model=8)
        layers = make_chain((96, 96))  # 96 bits < 8 whole words per chunk
        with pytest.raises(ValueError, match="whole-word"):
            packed_tp_chain(layers, mesh)

    def test_ici_bytes_rejects_illegal_geometry(self):
        """The analytic helper must not fabricate savings for inputs the
        chain itself would reject (flooring words//p to 0 used to report
        packed_ring=0 and a nonsense ratio)."""
        from bnn_tpu.inference import ici_bytes_per_layer

        with pytest.raises(ValueError, match="packed-TP-legal"):
            ici_bytes_per_layer(m=16, k=100, p=8)

    def test_composes_with_identity_epilogue(self):
        mesh = make_mesh(data=1, model=8)
        layers = make_chain((256, 256), scaled=False)
        x = jax.random.normal(jax.random.key(5), (4, 256))
        y_tp = packed_tp_chain(layers, mesh)(x)
        y_ref = reference_chain(layers)(x)
        np.testing.assert_array_equal(np.asarray(y_tp), np.asarray(y_ref))
