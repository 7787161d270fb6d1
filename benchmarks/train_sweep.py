"""QAT train-step optimization sweep (VERDICT r4 next #5).

The standard levers, each measured with the device-loop protocol on the
full binary-ResNet-18 fwd+bwd+opt step and written to
``artifacts/train_sweep.json``:

- base          : bf16 compute + f32 masters + Adam (bench.py's config)
- remat         : + nnx.remat over the forward
- f32           : everything f32 (no mixed precision)
- bf16_pure     : params themselves bf16, no f32 masters
- sgd           : SGD momentum 0.9 (the reference's ImageNet optimizer,
                  ref examples/imagenet.py:116-120) instead of Adam
- pool_all_ties : + all-ties max_pool gradient (skips XLA's 883us
                  select_and_scatter; opt-in semantics — see
                  bnn_tpu/functional.py set_pool_grad_mode)
- pool_index    : + index-gather max_pool gradient (same first-argmax
                  routing as 'exact', bitwise: int8 argmax map +
                  dilated-pad assembly, no select_and_scatter). Measured
                  LOSS on v5e (23.4 vs 12.9 ms/step — XLA does not fuse
                  interior-dilated pads); kept for its stricter torch
                  parity on window-uncovered tails (see functional.py)
- donate        : + buffer donation of the train state
- b128          : base at batch 128 (per-image amortization)

    python benchmarks/train_sweep.py [--variants base remat ...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax
from flax import nnx
from jax import lax

from benchmarks._artifacts import write_artifact
from bnn_tpu import BConfig, models, prepare_binary_model
from bnn_tpu import functional as F
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.parallel.trainstep import _mixed_forward
from bnn_tpu.utils import cast_floats, enable_compilation_cache


def build(*, dtype=None):
    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        m = models.resnet18(num_classes=1000, rngs=nnx.Rngs(0))
        m = prepare_binary_model(m, bconfig=BConfig(
            BasicInputBinarizer, BasicScaleBinarizer, XNORWeightBinarizer),
            ignore_layers_name=["_first_", "_last_"])
        m.train()
        if dtype is not None:
            cast_floats(m, dtype, keep_batch_stats=True)
    nnx.update(m, jax.device_put(nnx.state(m), dev))
    return m


def measure(name, *, batch, size=224, compute_dtype=jnp.bfloat16,
            params_dtype=None, remat=False, optimizer="adam",
            pool_grad="exact", donate=False, short=2, long=12):
    prev_mode = F.set_pool_grad_mode(pool_grad)
    try:
        m = build(dtype=params_dtype)
        if optimizer == "adam":
            tx = optax.adam(1e-3)
        else:
            tx = optax.sgd(0.1, momentum=0.9, nesterov=False)
        opt = nnx.Optimizer(m, tx, wrt=nnx.Param)
        gd, st = nnx.split((m, opt))
        x = jax.random.normal(jax.random.key(0), (batch, size, size, 3),
                              compute_dtype or jnp.float32)
        y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000)

        def one(state, xv):
            model, o = nnx.merge(gd, state)

            def loss_fn(mm):
                if compute_dtype is not None and params_dtype is None:
                    logits = _mixed_forward(mm, xv, compute_dtype)
                else:
                    logits = mm(xv)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), y).mean()

            if remat:
                loss, grads = nnx.value_and_grad(nnx.remat(loss_fn))(model)
            else:
                loss, grads = nnx.value_and_grad(loss_fn)(model)
            o.update(model, grads)
            _, st2 = nnx.split((model, o))
            return st2, loss

        def _runner(state, xv, k):
            def body(i, carry):
                stc, acc = carry
                st2, loss = one(stc, xv + acc.astype(xv.dtype) * 0)
                return st2, loss.astype(jnp.bfloat16)
            return lax.fori_loop(0, k, body, (state, jnp.bfloat16(0)))[1]

        run = jax.jit(_runner, donate_argnums=(0,) if donate else ())

        def timed(k):
            # donated buffers are consumed — hand each call its own copy;
            # the copy cost is identical at both loop lengths, so the
            # t_long - t_short difference cancels it exactly
            arg = jax.tree.map(jnp.copy, st) if donate else st
            t0 = time.time()
            float(run(arg, x, k))
            return time.time() - t0

        float(run(jax.tree.map(jnp.copy, st) if donate else st, x, short))
        t_s = t_l = float("inf")
        for _ in range(3):
            t_s = min(t_s, timed(short))
            t_l = min(t_l, timed(long))
        t = (t_l - t_s) / (long - short)
        print(f"{name:>14}: {t*1e3:7.2f} ms/step ({batch/t:6.0f} img/s)",
              flush=True)
        return {"variant": name, "batch": batch,
                "ms_per_step": round(t * 1e3, 3),
                "img_per_s": round(batch / t, 1)}
    finally:
        F.set_pool_grad_mode(prev_mode)


VARIANTS = {
    "base": {},
    "remat": {"remat": True},
    "f32": {"compute_dtype": None},
    "bf16_pure": {"params_dtype": jnp.bfloat16},
    "sgd": {"optimizer": "sgd"},
    "pool_all_ties": {"pool_grad": "all_ties"},
    "pool_index": {"pool_grad": "index"},
    "b128_pool_index": {"batch": 128, "pool_grad": "index"},
    "donate": {"donate": True},
    "b128": {"batch": 128},
    "b256": {"batch": 256},
    "b128_bf16_pure": {"batch": 128, "params_dtype": jnp.bfloat16},
    # the individually-winning levers combined (do they stack?)
    "combo64": {"donate": True, "params_dtype": jnp.bfloat16,
                "optimizer": "sgd"},
    "b128_combo": {"batch": 128, "donate": True,
                   "params_dtype": jnp.bfloat16, "optimizer": "sgd"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    rows = []
    for name in args.variants:
        kw = dict(VARIANTS[name])
        kw.setdefault("batch", args.batch)
        try:
            rows.append(measure(name, **kw))
        except Exception as e:  # record, keep sweeping
            print(f"{name:>14}: FAILED {type(e).__name__}: {e}", flush=True)
            rows.append({"variant": name, "error": f"{type(e).__name__}: {e}"})
    base = next((r for r in rows if r.get("variant") == "base"
                 and "ms_per_step" in r), None)
    if base:
        for r in rows:
            if "ms_per_step" in r:
                r["vs_base"] = round(base["ms_per_step"] / r["ms_per_step"],
                                     3)
    # subset runs must not clobber the headline artifact gen_tables.py
    # publishes from (same rule as serving_sweep.py)
    name = "train_sweep"
    if list(args.variants) != list(VARIANTS):
        name += "_" + "-".join(args.variants)[:80]
    write_artifact(name, {
        "config": {"model": "binary_resnet18", "image_size": 224,
                   "protocol": "device fori-loop chained steps"},
        "rows": rows,
    })


if __name__ == "__main__":
    main()
