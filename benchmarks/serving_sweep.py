"""Serving latency/throughput sweep across batch sizes (TPU).

One deployed binary model through the full Predictor pipeline (BN folds +
stem/stage/block megakernels under their batch caps + bf16), timed at each
batch size with the device-loop harness. Shows where each execution regime
lives: phase-decomposed megakernels at B<=8, XLA int8 convs above.

Every run writes a machine-readable artifact to
``benchmarks/artifacts/serving_sweep_<config>.json`` (see _artifacts.py);
the zoo tables in ROADMAP/docs are generated from those files via
``python benchmarks/gen_tables.py`` — never hand-typed.

    python benchmarks/serving_sweep.py [--pre] [--arch ...] [--stem dabnn]
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

from benchmarks._artifacts import write_artifact
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


def build_model(args, cpu):
    """Deployed + fully optimized model on the CPU host; returns
    (model, default_image_size, fusion_notes)."""
    notes = []
    with jax.default_device(cpu):
        if args.arch == "bats_cifar":
            # BATS NAS CIFAR net (ref bnn/models/bats.py:108-151): grouped
            # binary sep/dil convs inside searched cells. No resnet-style
            # stem/stage/block megakernels apply — fusion passes no-op and
            # the net serves through per-layer bitpacked kernels.
            m = models.BATSNetworkCIFAR(
                C=36, num_classes=10, layers=20, auxiliary=False,
                genotype=models.BATS_EXAMPLE, groups=4, rngs=nnx.Rngs(0))
            size = 32
        else:
            kw = (dict(block_type=PreBasicBlock, activation=nn.PReLU)
                  if args.pre else {})
            m = getattr(models, args.arch)(
                num_classes=1000, stem_type=args.stem, rngs=nnx.Rngs(0),
                **kw)
            size = 224
        m = prepare_binary_model(m, bconfig=BC,
                                 ignore_layers_name=["_first_", "_last_"])
        m.eval()
        m = deploy(m, use_pallas=True, weight_format="int8")
        optimize_deployed(m)
        for name, fuse in (("stem", fuse_stem), ("stages", fuse_stages),
                           ("blocks", lambda mm: fuse_blocks(
                               mm, max_fused_batch=4, strided=True))):
            try:
                n = fuse(m)
                notes.append(f"{name}: {n if n is not None else 'ok'}")
            except Exception as e:  # BATS: no resnet structure to fuse
                notes.append(f"{name}: n/a ({type(e).__name__})")
        cast_floats(m, jnp.bfloat16)
    return m, size, notes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre", action="store_true",
                    help="pre-activation PReLU config (the reference's "
                         "ImageNet recipe)")
    ap.add_argument("--arch", default="resnet18",
                    choices=["resnet18", "resnet34", "resnet50",
                             "bats_cifar"])
    ap.add_argument("--stem", default="basic", choices=["basic", "dabnn"])
    ap.add_argument("--size", type=int, default=0,
                    help="override image size (default: 224, BATS 32)")
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16, 32, 64])
    args = ap.parse_args()

    enable_compilation_cache()
    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"device: {dev}", flush=True)

    m, size, fusion_notes = build_model(args, cpu)
    if args.size:
        size = args.size
    nnx.update(m, jax.device_put(nnx.state(m), dev))
    g, s = nnx.split(m)

    def fn(v):
        out = nnx.merge(g, s)(v)
        return out[0] if isinstance(out, tuple) else out

    rng = np.random.RandomState(0)
    print("fusion:", "; ".join(fusion_notes), flush=True)
    print(f"{'batch':>6} {'latency':>12} {'per-img':>10} {'img/s':>9}",
          flush=True)
    rows = []
    for b in args.batches:
        with jax.default_device(cpu):
            x = jnp.asarray(rng.randn(b, size, size, 3), jnp.bfloat16)
        xd = jax.device_put(x, dev)
        iters = max(400 // b, 30)
        t0 = time.time()
        t = loop_time(fn, xd, iters=iters, rounds=4)
        print(f"{b:>6} {t*1e6:>10.1f}us {t/b*1e6:>8.1f}us {b/t:>9.0f}"
              f"   [{time.time()-t0:.0f}s]", flush=True)
        rows.append({"batch": b, "latency_us": round(t * 1e6, 1),
                     "us_per_img": round(t / b * 1e6, 2),
                     "img_per_s": round(b / t, 1)})

    # The tag must encode EVERYTHING that changes the numbers: a variant
    # run (e.g. --size 64, or a batch subset) writing over the headline
    # artifact would re-publish wrong zoo-table rows on the next
    # gen_tables.py --write — the exact failure the artifact pipeline
    # exists to prevent. BATS ignores --pre/--stem (no resnet stem), so
    # those flags are normalized out of its tag and config.
    is_bats = args.arch == "bats_cifar"
    pre, stem = (False, "basic") if is_bats else (args.pre, args.stem)
    tag = args.arch + ("_pre" if pre else "") + (
        f"_{stem}" if stem != "basic" else "")
    default_size = 32 if is_bats else 224
    if size != default_size:
        tag += f"_s{size}"
    if sorted(args.batches) != [1, 2, 4, 8, 16, 32, 64]:
        tag += "_b" + "-".join(str(b) for b in args.batches)
    write_artifact(f"serving_sweep_{tag}", {
        "config": {"arch": args.arch, "pre": pre, "stem": stem,
                   "image_size": size, "sign": "ternary (torch-parity)",
                   "weight_format": "int8", "float_dtype": "bfloat16",
                   "fusion": fusion_notes},
        "rows": rows,
    })


if __name__ == "__main__":
    main()
