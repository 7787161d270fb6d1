"""Serving example: QAT checkpoint -> compiled TPU inference endpoint.

The reference framework trains binary networks but ships no execution
layer (reference README.md:22) — serving is the part this framework adds.
This script shows the full path from a trained QAT checkpoint to a
production endpoint:

    python examples/serve.py --ckpt /path/to/ckpt      # restore + serve
    python examples/serve.py                           # fresh weights demo

Pipeline inside ``Predictor`` (one call):
  deploy       -> binary layers become bitpacked/int8 deployed layers with
                  folded alpha/scale/bias epilogues
  fold_bn      -> remaining BatchNorms folded into epilogues / sign
                  thresholds (inference/optimize.py)
  quantize     -> classifier head stored weight-only int8 (compress.py)
  megakernels  -> stem + residual blocks fused into Pallas kernels at
                  small batch (TPU only)
  bf16         -> float path cast to bf16, fixed-batch jit

``--export PATH`` freezes the predictor into an on-disk serving bundle
(StableHLO program + flat weights, inference/export.py) and ``--load
PATH`` serves from such a bundle — the load path needs no model code.

Multi-chip: ``--data-parallel N`` batch-shards requests over chips with
replicated weights (the reference's analogue is nn.DataParallel,
examples/cifar10.py:76); ``--tensor-parallel N`` instead shards every
layer's PACKED weights out-channel over N chips (1/N packed bytes per
chip, per-layer all_gather over ICI — inference/tp.py). Both compose:
``--data-parallel 2 --tensor-parallel 4`` on 8 devices.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from bnn_tpu import BConfig, models, prepare_binary_model
from bnn_tpu.inference import Predictor
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)


def build_model(num_classes: int) -> nnx.Module:
    """The CIFAR-10 example's config: binary body, fp32 first/last
    (reference examples/cifar10.py:63-71)."""
    model = models.resnet18(num_classes=num_classes, rngs=nnx.Rngs(0))
    return prepare_binary_model(
        model,
        bconfig=BConfig(
            # torch-parity ternary sign: zero_to_one + post-act ReLU would
            # be a degenerate constant-activation model (megablock.py's
            # measurement warning)
            activation_pre_process=BasicInputBinarizer,
            activation_post_process=BasicScaleBinarizer,
            weight_pre_process=XNORWeightBinarizer,
        ),
        ignore_layers_name=["_first_", "_last_"],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="QAT checkpoint path")
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--requests", type=int, default=4)
    ap.add_argument("--export", default=None, metavar="PATH",
                    help="write a serving bundle (program + weights) and "
                         "exit")
    ap.add_argument("--load", default=None, metavar="PATH",
                    help="serve from an exported bundle instead of "
                         "building a model")
    ap.add_argument("--data-parallel", type=int, default=1,
                    help="batch-shard requests over N chips")
    ap.add_argument("--tensor-parallel", type=int, default=1,
                    help="shard packed weights out-channel over N chips")
    ap.add_argument("--continuous", action="store_true",
                    help="serve a single-image request STREAM through the "
                         "continuous batcher (coalesced into the compiled "
                         "batch) instead of pre-batched requests")
    ap.add_argument("--stream-rps", type=float, default=200.0,
                    help="offered load for --continuous (requests/s, "
                         "Poisson arrivals)")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform != "cpu"
    if args.load:
        from bnn_tpu.inference import load_serving

        predictor = load_serving(args.load)
        print(f"loaded bundle {args.load}: platforms "
              f"{list(predictor.platforms)}, batch {predictor.batch_size}, "
              f"state {predictor.state_bytes() / 1e6:.2f} MB")
        args.batch_size = predictor.batch_size
        serve_loop(predictor, args, shape=predictor.input_shape)
        return

    common = dict(batch_size=args.batch_size, use_pallas=on_tpu,
                  fuse=on_tpu, quantize_float_bits=8)
    if args.data_parallel * args.tensor_parallel > 1:
        from bnn_tpu.parallel import make_mesh

        common["mesh"] = make_mesh(data=args.data_parallel,
                                   model=args.tensor_parallel)
        if args.tensor_parallel > 1:
            # megakernels reduce over full channels; TP serving is unfused
            common.update(tensor_parallel=True, fuse=False)
    if args.ckpt:
        predictor = Predictor.from_checkpoint(
            args.ckpt, lambda: build_model(args.num_classes), **common)
    else:
        predictor = Predictor(build_model(args.num_classes), **common)

    # megakernels are disabled when TP forces fuse=False — say so
    fused = on_tpu and common.get("fuse", False) is not False
    mode = ("TPU megakernels" if fused
            else "TPU unfused (XLA int8 convs)" if on_tpu
            else "CPU reference path")
    if predictor.tensor_parallel:
        mode += (f", {len(predictor.tp_layers)}/{predictor.tp_total} deployed "
                 f"layers tensor-sharded over {args.tensor_parallel} chips")
    print(f"serving state: {predictor.state_bytes() / 1e6:.2f} MB, "
          f"batch {args.batch_size}, {mode}")

    if args.export:
        predictor.export(args.export,
                         input_shape=(args.size, args.size, 3))
        print(f"exported serving bundle to {args.export} "
              f"(serve it with --load {args.export})")
        return

    serve_loop(predictor, args)


def serve_stream(predictor, args, shape):
    """Continuous batching demo: a Poisson stream of SINGLE-image
    requests coalesced into the compiled batch (the north-star
    "continuous batching of image streams" serving shape —
    bnn_tpu/inference/batching.py)."""
    from bnn_tpu.inference import ContinuousBatcher

    rng = np.random.default_rng(0)
    n = max(args.requests, 1) * args.batch_size  # comparable volume
    # warm the compiled program outside the measured stream
    jax.block_until_ready(predictor(np.zeros((1, *shape), np.float32)))
    t0 = time.time()
    with ContinuousBatcher(predictor, max_delay_ms=5.0) as srv:
        futs = []
        for _ in range(n):
            futs.append(srv.submit(
                rng.standard_normal((1, *shape), np.float32)))
            time.sleep(float(rng.exponential(1.0 / args.stream_rps)))
        for f in futs:
            f.result(timeout=300)
        st = srv.stats()
    wall = time.time() - t0
    print(f"stream: {st.requests} requests ({st.rows} images) in "
          f"{wall:.2f}s = {st.rows / wall:.0f} img/s at "
          f"{args.stream_rps:.0f} rps offered; {st.batches} compiled "
          f"calls, occupancy {st.mean_occupancy * 100:.0f}%, latency "
          f"p50 {st.latency_percentile(50):.1f} ms / "
          f"p99 {st.latency_percentile(99):.1f} ms")


def serve_loop(predictor, args, shape=None):
    shape = tuple(shape) if shape is not None else (args.size, args.size, 3)
    if args.continuous:
        serve_stream(predictor, args, shape)
        return
    rng = np.random.default_rng(0)
    for i in range(args.requests):
        n = int(rng.integers(1, args.batch_size + 1))  # ragged request sizes
        x = rng.standard_normal((n, *shape), np.float32)
        t0 = time.time()
        logits = predictor(x)
        jax.block_until_ready(logits)
        top1 = np.asarray(jnp.argmax(logits, -1))
        print(f"request {i}: {n} images -> top-1 {top1.tolist()} "
              f"({(time.time() - t0) * 1e3:.1f} ms incl. host)")


if __name__ == "__main__":
    main()
