"""QAT training-step throughput on the local device (binary ResNet-18).

Measures device-true ms/step for the full train step (forward + backward +
Adam update) at batch 64, 224x224, bf16 compute with f32 masters — the
configuration `examples/imagenet.py --bf16` runs. Also times the plain
(non-binarized) float model as the reference point for QAT overhead.

Measured on TPU v5e (round 2):

    plain fwd+bwd: 11.00 ms/step (5818 img/s)
    qat   fwd+bwd: 11.89 ms/step (5381 img/s)   <- QAT overhead only +8%
    plain fwd-only: 2.75 ms/step
    qat   fwd-only: 2.79 ms/step

Interpretation: the binarization machinery (sign STE, alpha reductions,
scale binarizers) costs ~8% on top of the float model; the remaining gap to
the MXU roofline is the generic XLA ResNet backward (~28 TFLOP/s effective
vs 197 peak: stem weight-gradient at C_in=3, strided-conv input gradients,
BatchNorm backward chains). Optimizing *that* means reimplementing XLA's
conv gradients, which is out of scope while the deployed inference engine —
the part the reference lacks (reference README.md:22) — is the product.

Timing protocol: steps are chained through their state inside one jitted
``lax.fori_loop`` (two traced lengths, difference cancels dispatch/tunnel
overhead) — host-side timers and even ``block_until_ready`` are unreliable
over a tunneled device; see bnn_tpu/utils/timing.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax
from flax import nnx
from jax import lax

from bnn_tpu import BConfig, models, prepare_binary_model
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.parallel.trainstep import _mixed_forward


def build(binary: bool, *, num_classes=1000):
    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        m = models.resnet18(num_classes=num_classes, rngs=nnx.Rngs(0))
        if binary:
            m = prepare_binary_model(m, bconfig=BConfig(
                BasicInputBinarizer, BasicScaleBinarizer,
                XNORWeightBinarizer),
                ignore_layers_name=["_first_", "_last_"])
        m.train()
    nnx.update(m, jax.device_put(nnx.state(m), dev))
    return m


def timed_steps(label, binary, x, y, *, fwd_only=False, short=2, long=12):
    n = x.shape[0]
    m = build(binary)
    opt = nnx.Optimizer(m, optax.adam(1e-3), wrt=nnx.Param)
    gd, st = nnx.split((m, opt))

    def one(state, xv):
        model, o = nnx.merge(gd, state)

        def loss_fn(mm):
            logits = _mixed_forward(mm, xv, jnp.bfloat16)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y).mean()

        if fwd_only:
            loss = loss_fn(model)
        else:
            loss, grads = nnx.value_and_grad(loss_fn)(model)
            o.update(model, grads)
        _, st2 = nnx.split((model, o))
        return st2, loss

    @jax.jit
    def run(state, xv, k):
        def body(i, carry):
            stc, acc = carry
            st2, loss = one(stc, xv + acc * 0)
            return st2, loss.astype(jnp.bfloat16)
        return lax.fori_loop(0, k, body, (state, jnp.bfloat16(0)))[1]

    float(run(st, x, short))  # compile both lengths share one program
    t_s = t_l = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run(st, x, short)); t_s = min(t_s, time.time() - t0)
        t0 = time.time(); float(run(st, x, long)); t_l = min(t_l, time.time() - t0)
    t = (t_l - t_s) / (long - short)
    # stderr: bench.py reuses this helper and reserves stdout for its one
    # parsed JSON line
    print(f"{label}: {t*1e3:.2f} ms/step ({n/t:.0f} img/s)",
          file=sys.stderr, flush=True)
    return t


def main():
    from benchmarks._artifacts import write_artifact

    on_tpu = jax.devices()[0].platform != "cpu"
    n, size = (64, 224) if on_tpu else (8, 64)
    x = jax.random.normal(jax.random.key(0), (n, size, size, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.key(1), (n,), 0, 1000)
    results = {
        "plain_ms": timed_steps("plain fwd+bwd", False, x, y) * 1e3,
        "qat_ms": timed_steps("qat   fwd+bwd", True, x, y) * 1e3,
    }
    if "--fwd" in sys.argv:
        results["plain_fwd_ms"] = timed_steps(
            "plain fwd-only", False, x, y, fwd_only=True) * 1e3
        results["qat_fwd_ms"] = timed_steps(
            "qat   fwd-only", True, x, y, fwd_only=True) * 1e3
    write_artifact("train_step", {
        "config": {"model": "resnet18", "batch": n, "image_size": size,
                   "compute_dtype": "bfloat16", "masters": "f32",
                   "optimizer": "adam"},
        "results": {k: round(v, 3) for k, v in results.items()},
    })


if __name__ == "__main__":
    main()
