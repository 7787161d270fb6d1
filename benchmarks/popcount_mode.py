"""Measure the packed-activation popcount serving mode vs the int8-MXU
default on deployed pointwise layers (TPU).

The popcount form streams activations at 1 bit/element — the bandwidth
variant (kernels/gemm.py popcount_gemm). This script times both impls on
the same DeployedConv/DeployedLinear modules at serving-relevant shapes
(ResNet-50-style 1x1 bottleneck convs, classifier heads) and reports
us/call + the effective TOP/s. Run on a real chip:

    python benchmarks/popcount_mode.py

Measured (TPU v5e, round 3): popcount loses 4-12x at EVERY shape —
  conv1x1 512->512  B64 14^2: mxu  84.0us ( 78 TOP/s)  popcount 773us (0.11x)
  conv1x1 1024->256 B64 14^2: mxu 117.6us ( 56 TOP/s)  popcount 967us (0.12x)
  conv1x1 2048->512 B64 7^2:  mxu  96.4us ( 68 TOP/s)  popcount 505us (0.19x)
  dense 4096->4096  B64:      mxu  14.3us (150 TOP/s)  popcount 180us (0.08x)
  dense 16384->4096 B8:       mxu 174.6us              popcount 666us (0.26x)
The round-2 kernel-only numbers (29-51 TOP/s-eq) excluded the in-graph
pack_bits pass; end to end it dominates. Conclusion: on-chip, the int8 MXU
path is always faster on v5e; 'popcount' remains the form whose
activations cross ICI/HBM packed (32x smaller), not a speed mode.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bnn_tpu import BConfig
from bnn_tpu import layers as blayers
from bnn_tpu.inference import deploy, set_gemm_impl
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.utils.timing import loop_time

Z1 = BConfig(
    activation_pre_process=BasicInputBinarizer.with_args(zero_to_one=True),
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def bench_layer(name, layer_fn, x, iters=30, rounds=2):
    dep = deploy(layer_fn(), use_pallas=True)
    g, s = nnx.split(dep)
    t_mxu = loop_time(lambda v: nnx.merge(g, s)(v), x, iters=iters,
                      rounds=rounds)
    switched = set_gemm_impl(dep)
    assert switched, f"{name}: not popcount-eligible"
    g, s = nnx.split(dep)
    t_pop = loop_time(lambda v: nnx.merge(g, s)(v), x, iters=iters,
                      rounds=rounds)
    flops = 2 * (x.size // x.shape[-1]) * dep.k * (
        dep.out_features if hasattr(dep, "out_features") else dep.out_channels)
    print(f"{name}: mxu {t_mxu*1e6:8.1f} us ({flops/t_mxu/1e12:6.1f} TOP/s)  "
          f"popcount {t_pop*1e6:8.1f} us ({flops/t_pop/1e12:6.1f} TOP/s)  "
          f"ratio {t_mxu/t_pop:.2f}x", flush=True)
    return {"shape": name, "mxu_us": round(t_mxu * 1e6, 1),
            "popcount_us": round(t_pop * 1e6, 1),
            "mxu_tops": round(flops / t_mxu / 1e12, 1),
            "ratio_mxu_over_popcount": round(t_mxu / t_pop, 3)}


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    cpu = jax.devices("cpu")[0]
    key = jax.random.key(0)

    shapes = [
        # (tag, M-shape builder, layer builder)
        ("conv1x1 512->512 B64 14^2",
         (64, 14, 14, 512),
         lambda: blayers.Conv2d(512, 512, 1, bconfig=Z1, rngs=nnx.Rngs(0))),
        ("conv1x1 1024->256 B64 14^2",
         (64, 14, 14, 1024),
         lambda: blayers.Conv2d(1024, 256, 1, bconfig=Z1, rngs=nnx.Rngs(0))),
        ("conv1x1 2048->512 B64 7^2",
         (64, 7, 7, 2048),
         lambda: blayers.Conv2d(2048, 512, 1, bconfig=Z1, rngs=nnx.Rngs(0))),
        ("dense 4096->4096 B64",
         (64, 4096),
         lambda: blayers.Linear(4096, 4096, bconfig=Z1, rngs=nnx.Rngs(0))),
        ("dense 16384->4096 B8 (HBM-bound)",
         (8, 16384),
         lambda: blayers.Linear(16384, 4096, bconfig=Z1, rngs=nnx.Rngs(0))),
    ]
    rows = []
    for tag, xshape, fn in shapes:
        # build the layer on CPU (init is hundreds of tiny ops — each a
        # round trip over a tunneled TPU) and bulk-transfer once
        with jax.default_device(cpu):
            layer = fn()
        x = jax.random.normal(key, xshape, jnp.bfloat16)
        t0 = time.time()
        rows.append(bench_layer(tag, lambda: layer, x))
        print(f"  [{time.time()-t0:.0f}s]", flush=True)

    from benchmarks._artifacts import write_artifact
    write_artifact("popcount_mode", {
        "config": {"sign": "zero_to_one packed lanes",
                   "float_dtype": "bfloat16"},
        "rows": rows,
    })


if __name__ == "__main__":
    main()
