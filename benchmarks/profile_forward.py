"""Name every device-time bucket of the hot paths (TPU, jax.profiler).

VERDICT r4 weak #2/#3: the B=64 deployed forward spends ~250 us (14%)
outside the conv floor ("boundary tax") and the QAT train step runs at
~14% MFU — both previously asserted, not attributed. This script traces
the real program on the real chip, parses the chrome trace, and reports
per-op device time per iteration, so every >10 us slice has a NAME.

The traced program is a ``lax.fori_loop`` chain of ``iters`` model calls
(one dispatch; device busy end-to-end, tunnel/dispatch noise excluded) —
the same protocol the timing harness uses (bnn_tpu/utils/timing.py).

    python benchmarks/profile_forward.py --mode deployed --batch 64
    python benchmarks/profile_forward.py --mode qat --batch 64
    python benchmarks/profile_forward.py --mode train --batch 64

Writes benchmarks/artifacts/profile_<mode>_b<batch>.json with the op table.
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._artifacts import write_artifact
from bnn_tpu import BConfig, models, prepare_binary_model
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.utils import cast_floats, enable_compilation_cache

BC = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def build_binary(num_classes=1000):
    with jax.default_device(jax.devices("cpu")[0]):
        m = models.resnet18(num_classes=num_classes, rngs=nnx.Rngs(0))
        m = prepare_binary_model(m, bconfig=BC,
                                 ignore_layers_name=["_first_", "_last_"])
    return m


def make_forward(mode: str, batch: int, size: int):
    """Returns (fn(x) -> scalar-ish, x) for the requested hot path."""
    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    if mode in ("deployed", "deployed_fused"):
        from bnn_tpu.inference import (deploy, fuse_blocks, fuse_head,
                                       fuse_stages, fuse_stem,
                                       optimize_deployed)
        m = build_binary()
        m.eval()
        with jax.default_device(cpu):
            m = deploy(m, use_pallas=True, weight_format="int8")
            optimize_deployed(m)
            if mode == "deployed_fused":
                fuse_stem(m)
                fuse_stages(m)
                fuse_blocks(m, max_fused_batch=4, strided=True)
                fuse_head(m)
            cast_floats(m, jnp.bfloat16)
        nnx.update(m, jax.device_put(nnx.state(m), dev))
        g, s = nnx.split(m)
        x = jax.random.normal(jax.random.key(0), (batch, size, size, 3),
                              jnp.bfloat16)

        def fn(x, _i):
            return nnx.merge(g, s)(x).sum()

        return fn, x, None

    # qat forward / full train step
    import optax

    from bnn_tpu.parallel.trainstep import _mixed_forward

    m = build_binary()
    m.train()
    nnx.update(m, jax.device_put(nnx.state(m), dev))
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000)
    x = jax.random.normal(jax.random.key(0), (batch, size, size, 3),
                          jnp.bfloat16)
    if mode == "qat":
        g, s = nnx.split(m)

        def fn(x, _i):
            return _mixed_forward(nnx.merge(g, s), x, jnp.bfloat16).sum()

        return fn, x, None

    opt = nnx.Optimizer(m, optax.adam(1e-3), wrt=nnx.Param)
    gd, st = nnx.split((m, opt))

    def step(state, x):
        model, o = nnx.merge(gd, state)

        def loss_fn(mm):
            logits = _mixed_forward(mm, x, jnp.bfloat16)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        o.update(model, grads)
        _, st2 = nnx.split((model, o))
        return st2, loss

    return step, x, st


def run_traced(fn, x, carry, iters, log_dir):
    """One dispatch of an iters-long chained loop, under the profiler."""
    if carry is None:
        @jax.jit
        def run(x):
            def body(i, acc):
                return fn(x + acc.astype(x.dtype) * 0, i).astype(
                    jnp.float32) * 0
            return lax.fori_loop(0, iters, body, jnp.float32(0))

        run(x).block_until_ready()  # compile outside the trace
        jax.profiler.start_trace(log_dir)
        run(x).block_until_ready()
        jax.profiler.stop_trace()
    else:
        @jax.jit
        def run(state, x):
            def body(i, carry):
                st, acc = carry
                st2, loss = fn(st, x + acc * 0)
                return st2, loss.astype(jnp.bfloat16)
            return lax.fori_loop(0, iters, body, (state, jnp.bfloat16(0)))[1]

        run(carry, x).block_until_ready()
        jax.profiler.start_trace(log_dir)
        run(carry, x).block_until_ready()
        jax.profiler.stop_trace()


CATEGORIES = [
    ("conv", re.compile(r"conv|%cudnn", re.I)),
    ("pallas/custom", re.compile(r"custom-call|tpu_custom_call|pallas", re.I)),
    ("matmul", re.compile(r"dot|gemm", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("reduce", re.compile(r"reduce|pool", re.I)),
    ("loop-ctrl", re.compile(r"while|fori|condition|tuple|parameter", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
]


def categorize(name: str) -> str:
    for cat, pat in CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


def analyze(log_dir, iters):
    paths = glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {log_dir}"
    with gzip.open(sorted(paths)[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    tname = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "thread_name"}
    # Events nest within a lane (while/call envelopes contain their body
    # ops). Report SELF time — dur minus same-lane children — so the rows
    # are a complete, non-overlapping decomposition of device busy time.
    lanes = {}
    for e in ev:
        if (e.get("ph") != "X" or e.get("pid") not in tpu_pids
                or "XLA Ops" not in tname.get((e["pid"], e["tid"]), "")):
            continue
        lanes.setdefault((e["pid"], e["tid"]), []).append(e)
    ops = {}
    total = 0.0
    for lane in lanes.values():
        lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0.0)))
        stack = []  # (end_ts, child_sum_accumulator index into recs)
        for e in lane:
            ts, dur = float(e["ts"]), float(e.get("dur", 0.0))
            while stack and ts >= stack[-1][0] - 1e-9:
                stack.pop()
            if stack:
                stack[-1][1]["child_us"] += dur
            rec = {"child_us": 0.0}
            stack.append((ts + dur, rec))
            name = e.get("name", "?")
            la = e.get("args", {}) or {}
            agg = ops.setdefault(name, {"us": 0.0, "count": 0, "long": None,
                                        "recs": []})
            agg["recs"].append((dur, rec))
            agg["count"] += 1
            if agg["long"] is None and isinstance(la, dict):
                agg["long"] = la.get("long_name") or la.get("hlo_op")
    for name, agg in ops.items():
        agg["us"] = sum(dur - r["child_us"] for dur, r in agg["recs"])
        total += agg["us"]
        del agg["recs"]
    rows = []
    for name, rec in ops.items():
        rows.append({
            "op": name, "category": categorize(name),
            "us_per_iter": round(rec["us"] / iters, 2),
            "calls_per_iter": round(rec["count"] / iters, 2),
            "long_name": (rec["long"] or "")[:200] or None,
        })
    rows.sort(key=lambda r: -r["us_per_iter"])
    cats = {}
    for r in rows:
        cats[r["category"]] = round(
            cats.get(r["category"], 0.0) + r["us_per_iter"], 1)
    return rows, cats, round(total / iters, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="deployed",
                    choices=["deployed", "deployed_fused", "qat", "train"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--pool-grad", default="exact",
                    choices=["exact", "index", "all_ties"],
                    help="max_pool gradient mode (train mode only)")
    ap.add_argument("--tag", default="",
                    help="artifact-name suffix for variant runs")
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    from bnn_tpu import functional as Fn
    Fn.set_pool_grad_mode(args.pool_grad)
    fn, x, carry = make_forward(args.mode, args.batch, args.size)
    log_dir = tempfile.mkdtemp(prefix=f"bnn_prof_{args.mode}_")
    run_traced(fn, x, carry, args.iters, log_dir)
    rows, cats, total = analyze(log_dir, args.iters)

    print(f"\n== {args.mode} B={args.batch}: device {total} us/iter ==")
    print(f"{'us/iter':>9} {'x':>5}  {'category':<14} op")
    for r in rows[:args.top]:
        print(f"{r['us_per_iter']:>9.1f} {r['calls_per_iter']:>5.1f}  "
              f"{r['category']:<14} {r['op'][:90]}")
    print("\nby category:", json.dumps(
        dict(sorted(cats.items(), key=lambda kv: -kv[1]))))

    write_artifact(f"profile_{args.mode}_b{args.batch}{args.tag}", {
        "config": {"mode": args.mode, "batch": args.batch,
                   "image_size": args.size, "iters": args.iters,
                   "pool_grad": args.pool_grad},
        "device_us_per_iter": total,
        "by_category_us": cats,
        "ops": rows[:args.top],
        "trace_dir": log_dir,
    })


if __name__ == "__main__":
    main()
