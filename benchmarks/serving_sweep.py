"""Serving latency/throughput sweep across batch sizes (TPU).

One deployed binary ResNet-18 through the full Predictor pipeline (BN
folds + stem/stage/block megakernels under their batch caps + bf16), timed
at each batch size with the device-loop harness. Shows where each
execution regime lives: phase-decomposed megakernels at B<=8, XLA int8
convs above.

    python benchmarks/serving_sweep.py [--pre]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bnn_tpu import BConfig, models, nn, prepare_binary_model
from bnn_tpu.inference import (deploy, fuse_blocks, fuse_stages, fuse_stem,
                               optimize_deployed)
from bnn_tpu.models.layers import PreBasicBlock
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.utils import cast_floats, enable_compilation_cache
from bnn_tpu.utils.timing import loop_time

# torch-parity TERNARY sign: the honest default. zero_to_one + post-act
# ReLU is a DEGENERATE model (sign(relu(x)) == +1; XLA folds the whole
# binary body) — see inference/megablock.py's measurement warning.
BC = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre", action="store_true",
                    help="pre-activation PReLU config (the reference's "
                         "ImageNet recipe)")
    ap.add_argument("--arch", default="resnet18",
                    choices=["resnet18", "resnet34", "resnet50"])
    ap.add_argument("--stem", default="basic", choices=["basic", "dabnn"])
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16, 32, 64])
    args = ap.parse_args()

    enable_compilation_cache()
    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"device: {dev}", flush=True)

    with jax.default_device(cpu):
        kw = (dict(block_type=PreBasicBlock, activation=nn.PReLU)
              if args.pre else {})
        build = getattr(models, args.arch)
        m = build(num_classes=1000, stem_type=args.stem,
                  rngs=nnx.Rngs(0), **kw)
        m = prepare_binary_model(m, bconfig=BC,
                                 ignore_layers_name=["_first_", "_last_"])
        m.eval()
        m = deploy(m, use_pallas=True, weight_format="int8")
        optimize_deployed(m)
        fuse_stem(m)
        fuse_stages(m)
        fuse_blocks(m, max_fused_batch=4, strided=True)
        cast_floats(m, jnp.bfloat16)
    nnx.update(m, jax.device_put(nnx.state(m), dev))
    g, s = nnx.split(m)

    def fn(v):
        return nnx.merge(g, s)(v)

    rng = np.random.RandomState(0)
    print(f"{'batch':>6} {'latency':>12} {'per-img':>10} {'img/s':>9}",
          flush=True)
    for b in args.batches:
        with jax.default_device(cpu):
            x = jnp.asarray(rng.randn(b, args.size, args.size, 3),
                            jnp.bfloat16)
        xd = jax.device_put(x, dev)
        iters = max(400 // b, 30)
        t0 = time.time()
        t = loop_time(fn, xd, iters=iters, rounds=4)
        print(f"{b:>6} {t*1e6:>10.1f}us {t/b*1e6:>8.1f}us {b/t:>9.0f}"
              f"   [{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
