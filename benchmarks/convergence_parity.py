"""Accuracy-at-convergence parity vs the RUNNABLE torch reference.

The last measurable piece of the north star ("XNOR R18 top-1 within 0.5 pt",
BASELINE.json:5): train the SAME binary config in the torch reference and in
bnn_tpu from IDENTICAL init (through the real-checkpoint weight-transfer
harness) on a synthetic-but-learnable classification dataset, to plateau,
and compare HELD-OUT top-1 — the quantity the reference's own training loop
reports and checkpoints on (ref examples/cifar10.py:126-167 ``test()`` +
best-acc tracking). Full-dataset CIFAR/ImageNet top-1 stays environmentally
blocked (no datasets, zero egress); this is the strongest accuracy
statement measurable in this container.

Dataset: class-conditional images — per-class smooth random template
(coarse noise upsampled to full resolution) + per-sample Gaussian noise +
random circular shifts. Learnable (a conv net plateaus high) but not
trivial (noise + shifts force real feature learning; a linear probe cannot
memorize pixels). Both frameworks see byte-identical batches in identical
order (shared numpy rng).

Two modes:
- ``pair``   : fp32 twins + xnor_scaled binary pair (single-config
               convergence parity);
- ``recipe`` : the reference's own 2-step ``xnor-net-plus.yaml`` run
               end-to-end by BOTH BinaryChefs (step0 trains, step1
               re-converts CARRYING WEIGHTS, trains again) — progressive-
               binarization semantics at training depth
               (ref bnn/engine.py:51-79).

Assertions (same bands as tests/test_convergence_parity.py):
- |top1_ref - top1_ours| <= 1.0 pt at plateau (binary and recipe);
- each binary model >= 95% of its OWN framework's fp32 twin accuracy
  (absolute sanity floor — binarization must not collapse learning).

Artifacts: ``benchmarks/artifacts/convergence_parity_<mode>.json``;
headline numbers land in PARITY.md.

    JAX_PLATFORMS=cpu python benchmarks/convergence_parity.py --mode pair
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Dict, List, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from benchmarks.parity_vs_reference import (  # noqa: E402
    REFERENCE_PATH,
    build_our_model,
    build_ref_model,
    load_reference,
    transfer_weights,
)


# -- dataset -----------------------------------------------------------------

def make_dataset(num_classes: int = 10, n_train: int = 3200,
                 n_test: int = 800, size: int = 32, noise: float = 1.0,
                 max_shift: int = 3, seed: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x_train, y_train, x_test, y_test); images NCHW float32, ~unit scale.

    Templates are smooth low-frequency fields (4x4 coarse noise bilinearly
    upsampled), distinct per class; samples add iid Gaussian noise and a
    random circular shift. SNR ~1 per pixel, so single-pixel rules fail but
    a small conv net separates classes cleanly.
    """
    rng = np.random.default_rng(seed)
    coarse = rng.standard_normal((num_classes, 3, 4, 4)).astype(np.float32)
    # bilinear upsample 4x4 -> size x size (pure numpy)
    src = np.linspace(0, 3, size, dtype=np.float32)
    i0 = np.clip(np.floor(src).astype(int), 0, 2)
    frac = src - i0
    up = coarse[:, :, i0][:, :, :, i0]  # nearest lower corner gather
    c01 = coarse[:, :, np.minimum(i0 + 1, 3)][:, :, :, i0]
    c10 = coarse[:, :, i0][:, :, :, np.minimum(i0 + 1, 3)]
    c11 = coarse[:, :, np.minimum(i0 + 1, 3)][:, :, :, np.minimum(i0 + 1, 3)]
    fy = frac[None, None, :, None]
    fx = frac[None, None, None, :]
    templates = (up * (1 - fy) * (1 - fx) + c01 * fy * (1 - fx)
                 + c10 * (1 - fy) * fx + c11 * fy * fx)
    templates /= templates.std(axis=(1, 2, 3), keepdims=True)

    def sample(n, rng):
        y = rng.integers(0, num_classes, n).astype(np.int64)
        x = templates[y] + noise * rng.standard_normal(
            (n, 3, size, size)).astype(np.float32)
        if max_shift:
            sh = rng.integers(-max_shift, max_shift + 1, (n, 2))
            for i in range(n):  # circular shift per sample
                x[i] = np.roll(x[i], (sh[i, 0], sh[i, 1]), axis=(1, 2))
        return x.astype(np.float32), y

    x_tr, y_tr = sample(n_train, rng)
    x_te, y_te = sample(n_test, rng)
    return x_tr, y_tr, x_te, y_te


def epoch_order(n: int, epoch: int, seed: int = 123) -> np.ndarray:
    """Deterministic per-epoch shuffle shared by both frameworks."""
    return np.random.default_rng(seed + epoch).permutation(n)


# -- torch-side training -----------------------------------------------------

def train_ref(model, data, *, epochs: int, batch: int, lr: float = 1e-3,
              log=print) -> Dict:
    torch, _ = load_reference()
    import torch.nn.functional as TF

    x_tr, y_tr, x_te, y_te = data
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    n = len(x_tr)
    best = 0.0
    accs: List[float] = []
    for ep in range(epochs):
        model.train()
        order = epoch_order(n, ep)
        t0 = time.time()
        losses = []
        for i in range(0, n - batch + 1, batch):
            idx = order[i:i + batch]
            opt.zero_grad()
            loss = TF.cross_entropy(model(torch.from_numpy(x_tr[idx])),
                                    torch.from_numpy(y_tr[idx]))
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        acc = eval_ref(model, x_te, y_te)
        best = max(best, acc)
        accs.append(acc)
        log(f"  ref ep{ep}: loss {np.mean(losses):.4f} top1 {acc:.2f}% "
            f"[{time.time()-t0:.0f}s]")
    return {"best": best, "final": accs[-1],
            "plateau": float(np.mean(accs[-3:])), "curve": accs}


def eval_ref(model, x_te, y_te, batch: int = 100) -> float:
    torch, _ = load_reference()

    model.eval()
    correct = 0
    with torch.no_grad():
        for i in range(0, len(x_te), batch):
            out = model(torch.from_numpy(x_te[i:i + batch]))
            correct += int((out.argmax(1).numpy()
                            == y_te[i:i + batch]).sum())
    return 100.0 * correct / len(x_te)


# -- jax-side training -------------------------------------------------------

def train_ours(model, data, *, epochs: int, batch: int, lr: float = 1e-3,
               log=print) -> Dict:
    import jax.numpy as jnp
    import optax
    from flax import nnx

    x_tr, y_tr, x_te, y_te = data
    x_tr_nhwc = np.transpose(x_tr, (0, 2, 3, 1)).copy()
    opt = nnx.Optimizer(model, optax.adam(lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt_, x, y):
        def loss_fn(m):
            return optax.softmax_cross_entropy_with_integer_labels(
                m(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt_.update(model, grads)
        return loss

    n = len(x_tr)
    best = 0.0
    accs: List[float] = []
    for ep in range(epochs):
        model.train()
        order = epoch_order(n, ep)
        t0 = time.time()
        losses = []
        for i in range(0, n - batch + 1, batch):
            idx = order[i:i + batch]
            losses.append(float(step(model, opt,
                                     jnp.asarray(x_tr_nhwc[idx]),
                                     jnp.asarray(y_tr[idx]))))
        acc = eval_ours(model, x_te, y_te)
        best = max(best, acc)
        accs.append(acc)
        log(f"  ours ep{ep}: loss {np.mean(losses):.4f} top1 {acc:.2f}% "
            f"[{time.time()-t0:.0f}s]")
    return {"best": best, "final": accs[-1],
            "plateau": float(np.mean(accs[-3:])), "curve": accs}


_EVAL_FWD = None  # jitted once; a per-call closure would recompile per epoch


def eval_ours(model, x_te, y_te, batch: int = 100) -> float:
    import jax.numpy as jnp
    from flax import nnx

    model.eval()
    g, s = nnx.split(model)

    global _EVAL_FWD
    if _EVAL_FWD is None:
        @nnx.jit
        def _EVAL_FWD(g_, s_, x):
            return nnx.merge(g_, s_)(x).argmax(-1)
    fwd = _EVAL_FWD

    correct = 0
    for i in range(0, len(x_te), batch):
        x = jnp.asarray(np.transpose(x_te[i:i + batch], (0, 2, 3, 1)))
        correct += int((np.asarray(fwd(g, s, x)) == y_te[i:i + batch]).sum())
    return 100.0 * correct / len(x_te)


# -- modes -------------------------------------------------------------------

def run_config_pair(config: str, data, *, epochs: int, batch: int,
                    arch: str = "resnet18", num_classes: int = 10,
                    log=print) -> Dict:
    """Identical-init (ref -> checkpoint -> ours) pair trained to plateau."""
    ref_m = build_ref_model(arch=arch, config=config,
                            num_classes=num_classes)
    our_m = build_our_model(arch=arch, config=config,
                            num_classes=num_classes)
    transfer_weights(ref_m, our_m)
    log(f"[{config}] training reference ({epochs} epochs)...")
    ref = train_ref(ref_m, data, epochs=epochs, batch=batch, log=log)
    log(f"[{config}] training bnn_tpu ({epochs} epochs)...")
    ours = train_ours(our_m, data, epochs=epochs, batch=batch, log=log)
    return {"config": config, "epochs": epochs, "ref": ref, "ours": ours,
            "plateau_gap_pt": abs(ref["plateau"] - ours["plateau"])}


def run_recipe_pair(data, *, epochs_per_step: int, batch: int,
                    num_classes: int = 10, recipe: str | None = None,
                    log=print) -> Dict:
    """The reference's 2-step xnor-net-plus recipe end-to-end in BOTH
    frameworks: step0 converts + trains, step1 RE-CONVERTS THE TRAINED
    MODEL (weights carry over, ref bnn/engine.py:72-79) + trains again;
    held-out top-1 compared after the final step."""
    torch, _ = load_reference()
    import bnn.engine as ref_engine
    from flax import nnx

    from bnn_tpu import BinaryChef, models

    recipe = recipe or os.path.join(
        REFERENCE_PATH, "examples", "recepies", "xnor-net-plus.yaml")

    torch.manual_seed(0)
    import bnn.models.resnet as ref_resnet
    ref_m = ref_resnet.resnet18(num_classes=num_classes)
    our_m = models.resnet18(num_classes=num_classes, rngs=nnx.Rngs(0))
    ref_chef = ref_engine.BinaryChef(recipe)
    our_chef = BinaryChef(recipe)
    assert len(ref_chef) == len(our_chef)

    results = {"steps": []}
    for i in range(len(ref_chef)):
        ref_m = ref_chef.run_step(ref_m, i)
        our_m = our_chef.run_step(our_m, i)
        if i == 0:
            # identical init once, at the start; later steps must carry
            # each framework's own trained weights (that is the semantics
            # under test)
            transfer_weights(ref_m, our_m)
        log(f"[recipe step {i}] training reference...")
        ref = train_ref(ref_m, data, epochs=epochs_per_step, batch=batch,
                        log=log)
        log(f"[recipe step {i}] training bnn_tpu...")
        ours = train_ours(our_m, data, epochs=epochs_per_step, batch=batch,
                          log=log)
        results["steps"].append({"step": i, "epochs": epochs_per_step,
                                 "ref": ref, "ours": ours})
    last = results["steps"][-1]
    results["plateau_gap_pt"] = abs(
        last["ref"]["plateau"] - last["ours"]["plateau"])
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="pair", choices=["pair", "recipe"])
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--fp32-epochs", type=int, default=4,
                    help="fp32 twins converge faster")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=3200)
    ap.add_argument("--n-test", type=int, default=800)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--check", action="store_true",
                    help="exit nonzero if parity bands fail")
    ap.add_argument("--tag", default="",
                    help="artifact-name suffix (variant runs don't "
                         "overwrite the headline artifact)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # parity instrument: CPU f32

    data = make_dataset(n_train=args.n_train, n_test=args.n_test,
                        size=args.size, noise=args.noise)
    t0 = time.time()
    out = {"mode": args.mode,
           "dataset": {"n_train": args.n_train, "n_test": args.n_test,
                       "size": args.size, "noise": args.noise,
                       "classes": 10, "max_shift": 3},
           # per-run epoch counts live in each run's own "epochs" field
           # (fp32 twins train --fp32-epochs, not --epochs)
           "train": {"batch": args.batch, "lr": 1e-3, "opt": "adam",
                     "epochs": args.epochs,
                     "fp32_epochs": args.fp32_epochs}}
    failures = []
    if args.mode == "pair":
        fp32 = run_config_pair("fp32", data, epochs=args.fp32_epochs,
                               batch=args.batch)
        binary = run_config_pair("xnor_scaled", data, epochs=args.epochs,
                                 batch=args.batch)
        out["fp32"] = fp32
        out["binary"] = binary
        if binary["plateau_gap_pt"] > 1.0:
            failures.append(f"binary plateau gap "
                            f"{binary['plateau_gap_pt']:.2f}pt > 1.0")
        for side in ("ref", "ours"):
            floor = 0.95 * fp32[side]["plateau"]
            if binary[side]["plateau"] < floor:
                failures.append(
                    f"{side} binary {binary[side]['plateau']:.2f}% < 95% of "
                    f"its fp32 twin ({fp32[side]['plateau']:.2f}%)")
        print(f"fp32    plateau: ref {fp32['ref']['plateau']:.2f}% "
              f"ours {fp32['ours']['plateau']:.2f}%")
        print(f"binary  plateau: ref {binary['ref']['plateau']:.2f}% "
              f"ours {binary['ours']['plateau']:.2f}% "
              f"(gap {binary['plateau_gap_pt']:.2f}pt)")
    else:
        rec = run_recipe_pair(data, epochs_per_step=args.epochs,
                              batch=args.batch)
        out["recipe"] = rec
        if rec["plateau_gap_pt"] > 1.0:
            failures.append(f"recipe plateau gap "
                            f"{rec['plateau_gap_pt']:.2f}pt > 1.0")
        last = rec["steps"][-1]
        print(f"recipe final-step plateau: ref {last['ref']['plateau']:.2f}% "
              f"ours {last['ours']['plateau']:.2f}% "
              f"(gap {rec['plateau_gap_pt']:.2f}pt)")

    out["wall_s"] = round(time.time() - t0, 1)
    from benchmarks._artifacts import write_artifact
    name = f"convergence_parity_{args.mode}"
    if args.tag:
        name += f"_{args.tag}"
    write_artifact(name, out)
    if failures:
        print("PARITY FAIL:", failures)
        if args.check:
            sys.exit(1)
    else:
        print("PARITY OK")


if __name__ == "__main__":
    main()
