"""Headline benchmark: binary ResNet-18 inference on TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value: images/s of the deployed binary ResNet-18 forward (int8-MXU binary
convs, bf16 float path, folded dequant epilogues) at batch 64, 224x224.
vs_baseline: speedup vs the reference's execution model — the QAT "fake"
binary path (fp32 sign + alpha through XLA convs), which is how the
reference framework executes binary nets (it ships no hardware execution
path, reference README.md:22) — measured on the same chip, same batch.

Timing uses a device-side fori_loop (one dispatch, one readback), robust to
async-dispatch/tunnel latency.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bnn_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from flax import nnx
    from bnn_tpu import BConfig, models, prepare_binary_model
    from bnn_tpu.inference import deploy, model_weight_bytes
    from bnn_tpu.ops import (
        BasicInputBinarizer,
        BasicScaleBinarizer,
        XNORWeightBinarizer,
    )
    from bnn_tpu.utils import cast_floats
    from bnn_tpu.utils.timing import loop_time

    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform != "cpu"
    batch, size, iters = (64, 224, 30) if on_tpu else (8, 64, 5)
    rounds = 2 if on_tpu else 1

    cpu = jax.devices("cpu")[0]

    def build(stem_type="basic"):
        # init on CPU: parameter initialization is hundreds of tiny ops,
        # which over the remote-TPU tunnel cost a round trip each.
        # Sign convention: torch-parity TERNARY (the framework's and the
        # reference's default). NOT zero_to_one: with post-act ReLU that
        # combination is a DEGENERATE model (sign(relu(x)) == +1) whose
        # whole binary body XLA folds to constants — rounds 1-3 partially
        # benchmarked that artifact; see ROADMAP "Measurement discipline"
        with jax.default_device(cpu):
            m = models.resnet18(num_classes=1000, stem_type=stem_type,
                                rngs=nnx.Rngs(0))
            m = prepare_binary_model(
                m,
                bconfig=BConfig(
                    activation_pre_process=BasicInputBinarizer,
                    activation_post_process=BasicScaleBinarizer,
                    weight_pre_process=XNORWeightBinarizer,
                ),
                ignore_layers_name=["_first_", "_last_"],
            )
            m.eval()
        return m

    def to_bench_device(m):
        # bulk-transfer the whole state in one hop
        nnx.update(m, jax.device_put(nnx.state(m), dev))
        return m

    def check_not_folded(fn, xe, min_gflops=2.0):
        """Degenerate-model guard: the compiled executable must actually
        contain the binary body's FLOPs."""
        try:
            fl = jax.jit(fn).lower(xe).compile().cost_analysis()["flops"]
        except Exception as e:  # guard must never silently vanish
            log(f"WARNING: degenerate-model guard could not run "
                f"(cost_analysis failed: {e}); timings unverified")
            return
        scale = xe.shape[0]
        assert fl >= min_gflops * 1e9 * scale / 64, (
            f"compiled flops {fl/1e9:.2f}G — body folded away; "
            "degenerate benchmark config")

    x = jax.random.normal(jax.random.key(0), (batch, size, size, 3))

    qat_model = to_bench_device(build())
    gq, sq = nnx.split(qat_model)
    t0 = time.time()
    t_qat = loop_time(lambda v: nnx.merge(gq, sq)(v), x, iters=iters, rounds=rounds)
    log(f"QAT fake path: {t_qat*1e3:.2f} ms/batch ({batch/t_qat:.0f} img/s) "
        f"[measured in {time.time()-t0:.0f}s] "
        f"weights {model_weight_bytes(qat_model)/1e6:.1f} MB")

    x16 = x.astype(jnp.bfloat16)
    dep_i8 = deploy(build(), use_pallas=on_tpu, weight_format="int8")
    cast_floats(dep_i8, jnp.bfloat16)
    to_bench_device(dep_i8)
    gi, si = nnx.split(dep_i8)
    if on_tpu:
        check_not_folded(lambda v: nnx.merge(gi, si)(v), x16)
    t_i8 = loop_time(lambda v: nnx.merge(gi, si)(v), x16, iters=iters,
                     rounds=rounds)
    log(f"deployed int8+bf16: {t_i8*1e3:.2f} ms/batch ({batch/t_i8:.0f} img/s) "
        f"weights {model_weight_bytes(dep_i8)/1e6:.1f} MB "
        f"speedup {t_qat/t_i8:.2f}x")

    from bnn_tpu.inference import (
        DeployedConv,
        DeployedLinear,
        optimize_deployed,
        packed_weight_bytes,
        quantize_float_layers,
        state_bytes,
    )
    from bnn_tpu.binarize import named_modules
    import math

    qat_state = state_bytes(qat_model)
    dep_p = deploy(build(), use_pallas=on_tpu, weight_format="packed")
    log(f"deployed packed: weights {model_weight_bytes(dep_p)/1e6:.1f} MB "
        f"({model_weight_bytes(qat_model)/model_weight_bytes(dep_p):.1f}x "
        f"kernel compression)")
    # full serving format: BN folded into epilogues, fc head int8, floats bf16
    optimize_deployed(dep_p)
    quantize_float_layers(dep_p)
    cast_floats(dep_p, jnp.bfloat16)
    bin_fp32 = bin_packed = 0
    for _, m in named_modules(dep_p):
        if isinstance(m, DeployedConv):
            bin_fp32 += 4 * m.out_channels * m.in_channels * math.prod(
                m.kernel_size)
        elif isinstance(m, DeployedLinear):
            bin_fp32 += 4 * m.in_features * m.out_features
    bin_packed = packed_weight_bytes(dep_p)
    log(f"serving state: {state_bytes(dep_p)/1e6:.2f} MB "
        f"({qat_state/state_bytes(dep_p):.1f}x vs fp32 QAT state; "
        f"binary layers {bin_fp32/bin_packed:.1f}x bitpacked)")

    # serving latency at batch 1: BN folds + the full megakernel pipeline
    # (phase-decomposed stem + whole-stage chain kernels + per-block
    # megakernels) — measured fastest on honest configs at every small
    # batch (inference/megablock.py docstring)
    from bnn_tpu.inference import (fuse_blocks, fuse_head, fuse_stages,
                                   fuse_stem, optimize_deployed)
    dep_s = deploy(build(), use_pallas=on_tpu, weight_format="int8")
    optimize_deployed(dep_s)
    if on_tpu:
        fuse_stem(dep_s)
        fuse_stages(dep_s)
        fuse_blocks(dep_s, max_fused_batch=4, strided=True)
        fuse_head(dep_s)
    cast_floats(dep_s, jnp.bfloat16)
    to_bench_device(dep_s)
    gs, ss = nnx.split(dep_s)
    x1 = x16[:1]
    t_1 = loop_time(lambda v: nnx.merge(gs, ss)(v), x1,
                    iters=10 * iters, rounds=rounds)
    log(f"serving fused B=1: {t_1*1e6:.1f} us/img ({1/t_1:.0f} img/s)")

    # the reference's own efficient-stem option (DaBNN, its models/resnet.py
    # stem_type) removes the 7x7 fp32 stem that bounds B=64 throughput
    if on_tpu:
        dep_d = deploy(build(stem_type="dabnn"), use_pallas=True,
                       weight_format="int8")
        optimize_deployed(dep_d)
        cast_floats(dep_d, jnp.bfloat16)
        to_bench_device(dep_d)
        gd, sd = nnx.split(dep_d)
        check_not_folded(lambda v: nnx.merge(gd, sd)(v), x16)
        t_d = loop_time(lambda v: nnx.merge(gd, sd)(v), x16, iters=20,
                        rounds=rounds)
        log(f"deployed dabnn-stem: {t_d*1e3:.2f} ms/batch "
            f"({batch/t_d:.0f} img/s) — the reference's efficient-stem "
            f"option (honest ternary: a LOSS at B=64 on TPU; its extra "
            f"binary 112^2 convs outweigh dropping the 7x7 fp32 stem)")

    # training throughput (VERDICT r4 next #3: training is half the
    # reference's product — examples/imagenet.py:337-384 hot loop — and
    # must be driver-visible, not a docstring). Same harness as
    # benchmarks/train_step.py: full fwd+bwd+Adam step, bf16 compute with
    # f32 masters, chained device-side so tunnel latency cancels.
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.train_step import timed_steps
    y = jax.random.randint(jax.random.key(1), (batch,), 0, 1000)
    t_plain = timed_steps("train plain fwd+bwd", False, x16, y)
    t_train = timed_steps("train QAT   fwd+bwd", True, x16, y)
    training = {
        "qat_ms_per_step": round(t_train * 1e3, 2),
        "qat_img_per_s": round(batch / t_train, 1),
        "plain_ms_per_step": round(t_plain * 1e3, 2),
        "binarization_overhead_pct": round((t_train / t_plain - 1) * 100, 1),
        "config": "B=%d %d^2 bf16 compute + f32 masters, adam" % (batch, size),
    }
    log(f"training: QAT {t_train*1e3:.2f} ms/step "
        f"({batch/t_train:.0f} img/s), float twin {t_plain*1e3:.2f} ms/step "
        f"(+{(t_train/t_plain-1)*100:.0f}% binarization overhead)")
    # tuned arm: the per-chip training sweet spot (the B=64 step is
    # batch-starved at 112^2 — ROADMAP train-sweep table); B=64 base
    # stays the headline for cross-round comparability
    try:
        from benchmarks.train_sweep import measure as sweep_measure
        tuned = sweep_measure("tuned", batch=2 * batch, size=size,
                              params_dtype=jnp.bfloat16, long=8)
        training["tuned"] = {
            "qat_ms_per_step": tuned["ms_per_step"],
            "qat_img_per_s": tuned["img_per_s"],
            "config": "B=%d %d^2 pure-bf16 params, adam"
                      % (2 * batch, size),
        }
    except Exception as e:  # never fail the bench over the extra arm
        log(f"tuned training arm skipped: {type(e).__name__}: {e}")

    imgs_per_s = batch / t_i8
    print(json.dumps({
        "training": training,
        "metric": "binary_resnet18_deployed_inference",
        "value": round(imgs_per_s, 1),
        "unit": "images/s",
        "vs_baseline": round(t_qat / t_i8, 3),
        # self-description so cross-round BENCH_r*.json stay comparable
        # (VERDICT r3 next #8): rounds 1-3 changed sign convention
        # (degenerate zero_to_one retraction, ROADMAP "Measurement
        # discipline") — the config rides with the number from now on
        "config": {
            "model": "binary_resnet18",
            "batch": batch, "image_size": size,
            "sign": "ternary (torch-parity, non-degenerate)",
            "stem": "basic 7x7 fp-by-convention (first/last fp32)",
            "weight_format": "int8", "float_dtype": "bfloat16",
            "fused": "none at B=64 (stage/block kernel caps <= 8)",
            "baseline": "QAT fake-binary path on the same chip "
                        "(the reference's execution model)",
            "b1_fused_us": round(t_1 * 1e6, 1),
            "qat_ms": round(t_qat * 1e3, 3),
            "deployed_ms": round(t_i8 * 1e3, 3),
        },
    }))


if __name__ == "__main__":
    main()
