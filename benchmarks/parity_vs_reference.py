"""Cross-framework parity harness vs the RUNNABLE torch reference.

The reference framework (/root/reference, CPU torch) is imported and
executed side by side with bnn_tpu; identical weights move between the two
through a real ``torch.save`` checkpoint and
:func:`bnn_tpu.utils.import_torch_checkpoint`. This converts the north-star
accuracy-parity claim from "blocked on datasets" into directly measured
equivalences (VERDICT r3 next #1):

- **forward parity**: same weights -> same logits (eval & train mode), for
  every runnable block family / stem / binarizer config
  (ref bnn/binarize.py:129-141, bnn/models/resnet.py:180-213);
- **gradient parity**: STE sign / XNOR-alpha / learnable-scale gradients
  through layers and whole blocks vs ``jax.grad``
  (ref bnn/ops.py:51-140);
- **recipe parity**: the reference's own ``BinaryChef`` run on its own
  ``test/assets/test.yaml`` against ours on the same file — identical layer
  sets swapped with identical binarizer kinds (ref bnn/engine.py:51-79);
- **training parity**: both frameworks trained on identical synthetic
  CIFAR batches from identical init (Adam 1e-3, the reference's
  examples/cifar10.py:63-123 settings). The fp32 (all-Identity) config
  must track exactly; binary configs are chaotic by nature — any ~1e-6
  backend difference in a pre-sign value flips an activation bit and the
  trajectories decorrelate (measured: step-0 loss diff ~8e-3 from sign
  flips alone) — so the binary assertion is statistical: the curves stay
  in the same band and descend together.

Run as a script for the full report:
    JAX_PLATFORMS=cpu python benchmarks/parity_vs_reference.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
from typing import Dict, List, Optional, Tuple

import numpy as np

REFERENCE_PATH = "/root/reference"

# make `python benchmarks/parity_vs_reference.py` work from anywhere:
# sys.path[0] is benchmarks/, not the repo root that holds bnn_tpu
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

def _force_cpu():
    """This is a CPU parity instrument: the reference runs CPU torch, so
    jax must run the same f32 arithmetic. On the TPU backend convs execute
    at reduced mantissa by default and the comparison measures hardware
    precision (~3e-1 logit diffs), not framework parity. Called from
    ``main()`` only — at import time it would silently retarget a whole
    pytest session that imports this module for its helpers (the test
    suite's conftest forces CPU itself). The axon plugin forces its
    platform from sitecustomize, so the config update is required, not
    just the env var."""
    import jax

    jax.config.update("jax_platforms", "cpu")

_TORCH = None
_REF = None


def reference_available() -> bool:
    """True when torch + the reference repo are importable."""
    try:
        load_reference()
        return True
    except Exception:
        return False


def load_reference():
    """Import (once) and return ``(torch, bnn)`` — the reference framework."""
    global _TORCH, _REF
    if _REF is None:
        if REFERENCE_PATH not in sys.path:
            sys.path.insert(0, REFERENCE_PATH)
        import torch

        torch.set_num_threads(max(1, os.cpu_count() or 1))
        _install_easydict_shim()
        import bnn as ref_bnn

        _TORCH, _REF = torch, ref_bnn
    return _TORCH, _REF


def _install_easydict_shim():
    """The reference's BinaryChef depends on ``easydict`` (ref
    bnn/engine.py:3), which this container doesn't ship. Provide the tiny
    attribute-access dict it needs so the reference engine runs unmodified."""
    try:
        import easydict  # noqa: F401
        return
    except ImportError:
        pass
    import types

    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            for k, v in dict(d or {}, **kwargs).items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            elif isinstance(v, (list, tuple)):
                v = type(v)(EasyDict(i) if isinstance(i, dict) else i
                            for i in v)
            super().__setitem__(k, v)

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k) from None

        __setattr__ = __setitem__

    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


# -- config table ------------------------------------------------------------
# name -> (ref binarizer names, our binarizer names); resolved lazily so the
# module imports without torch
CONFIGS = ("fp32", "xnor", "xnor_scaled", "xnor_net_plus")


def _ref_bconfig(config: str):
    torch, ref = load_reference()
    import bnn.bconfig as rbc
    import bnn.ops as rops

    table = {
        "fp32": (torch.nn.Identity, rbc.Identity, torch.nn.Identity),
        "xnor": (rops.BasicInputBinarizer, rbc.Identity,
                 rops.XNORWeightBinarizer),
        "xnor_scaled": (rops.BasicInputBinarizer, rops.BasicScaleBinarizer,
                        rops.XNORWeightBinarizer),
        # the reference's xnor-net-plus recipe step1
        # (examples/recepies/xnor-net-plus.yaml:13-25)
        "xnor_net_plus": (rops.BasicInputBinarizer, rops.BasicScaleBinarizer,
                          rops.XNORWeightBinarizer.with_args(
                              compute_alpha=True, center_weights=True)),
    }
    pre, post, w = table[config]
    return ref.BConfig(activation_pre_process=pre,
                       activation_post_process=post,
                       weight_pre_process=w)


def _our_bconfig(config: str):
    from bnn_tpu import BConfig
    from bnn_tpu import ops

    table = {
        "fp32": (ops.Identity, ops.Identity, ops.Identity),
        "xnor": (ops.BasicInputBinarizer, ops.Identity,
                 ops.XNORWeightBinarizer),
        "xnor_scaled": (ops.BasicInputBinarizer, ops.BasicScaleBinarizer,
                        ops.XNORWeightBinarizer),
        "xnor_net_plus": (ops.BasicInputBinarizer, ops.BasicScaleBinarizer,
                          ops.XNORWeightBinarizer.with_args(
                              compute_alpha=True, center_weights=True)),
    }
    pre, post, w = table[config]
    return BConfig(activation_pre_process=pre,
                   activation_post_process=post,
                   weight_pre_process=w)


# -- model pairs -------------------------------------------------------------

def build_ref_model(arch: str = "resnet18", block: Optional[str] = None,
                    stem: str = "basic", activation: Optional[str] = None,
                    num_classes: int = 10, config: str = "xnor",
                    ignore: Tuple[str, ...] = ("_first_", "_last_"),
                    seed: int = 0):
    """Binarized reference model (ref prepare_binary_model over its own
    resnet factory, bnn/models/resnet.py:180-213 + bnn/binarize.py:129)."""
    torch, ref = load_reference()
    import bnn.models.resnet as ref_resnet
    import bnn.models.layers as ref_layers

    torch.manual_seed(seed)
    kwargs = dict(num_classes=num_classes, stem_type=stem)
    if activation is not None:
        kwargs["activation"] = getattr(torch.nn, activation)
    factory = getattr(ref_resnet, arch)
    model = (factory(**kwargs) if block is None
             else factory(block_type=getattr(ref_layers, block), **kwargs))
    return ref.prepare_binary_model(model, _ref_bconfig(config),
                                    ignore_layers_name=list(ignore))


def build_our_model(arch: str = "resnet18", block: Optional[str] = None,
                    stem: str = "basic", activation: Optional[str] = None,
                    num_classes: int = 10, config: str = "xnor",
                    ignore: Tuple[str, ...] = ("_first_", "_last_"),
                    seed: int = 0):
    from flax import nnx

    from bnn_tpu import models, nn, prepare_binary_model
    from bnn_tpu.models import layers as our_layers

    kwargs = dict(num_classes=num_classes, stem_type=stem,
                  rngs=nnx.Rngs(seed))
    if activation is not None:
        kwargs["activation"] = getattr(nn, activation)
    factory = getattr(models, arch)
    model = (factory(**kwargs) if block is None
             else factory(block_type=getattr(our_layers, block), **kwargs))
    return prepare_binary_model(model, bconfig=_our_bconfig(config),
                                ignore_layers_name=list(ignore))


def transfer_weights(ref_model, our_model, tmpdir: Optional[str] = None,
                     strict: bool = True) -> str:
    """Move the reference model's weights into ours through a REAL
    ``torch.save`` checkpoint file (the reference's own checkpoint schema,
    examples/imagenet.py:218-256) + the no-torch importer. Returns the
    checkpoint path (so tests can also exercise re-loading)."""
    torch, _ = load_reference()
    from bnn_tpu.utils import import_torch_checkpoint

    own_tmp = tmpdir is None
    tmpdir = tmpdir or tempfile.mkdtemp(prefix="bnn_parity_")
    path = os.path.join(tmpdir, "ref_ckpt.pth.tar")
    try:
        torch.save({"state_dict": ref_model.state_dict(), "epoch": 0,
                    "best_acc1": 0.0, "arch": "parity"}, path)
        missing, unexpected = import_torch_checkpoint(our_model, path,
                                                      strict=strict)
        if strict:
            assert not missing and not unexpected, (missing, unexpected)
    finally:
        if own_tmp:
            # a self-created dir holds a ~45 MB checkpoint per call —
            # don't accumulate them in /tmp across runs. (Callers that
            # pass tmpdir= keep the file for re-loading tests.)
            import shutil

            shutil.rmtree(tmpdir, ignore_errors=True)
            path = ""
    return path


def warm_batchnorm(ref_model, batches: int = 3, batch: int = 8,
                   size: int = 32, seed: int = 7) -> None:
    """Run a few train-mode batches through the reference model so running
    stats are non-trivial before an eval-mode comparison."""
    torch, _ = load_reference()
    torch.manual_seed(seed)
    ref_model.train()
    with torch.no_grad():
        for _ in range(batches):
            ref_model(torch.randn(batch, 3, size, size))
    ref_model.eval()


def make_pair(tmpdir: Optional[str] = None, warm_bn: bool = True,
              **kwargs):
    """(ref_model, our_model, ckpt_path) with identical weights, both in
    eval mode."""
    ref_model = build_ref_model(**kwargs)
    if warm_bn:
        warm_batchnorm(ref_model)
    our_model = build_our_model(**kwargs)
    path = transfer_weights(ref_model, our_model, tmpdir)
    ref_model.eval()
    our_model.eval()
    return ref_model, our_model, path


# -- comparisons -------------------------------------------------------------

def nchw(x_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def forward_diff(ref_model, our_model, batch: int = 4, size: int = 32,
                 train_mode: bool = False, seed: int = 0) -> float:
    """Max |logit difference| on a shared random batch."""
    torch, _ = load_reference()
    import jax.numpy as jnp

    x = np.random.default_rng(seed).standard_normal(
        (batch, 3, size, size)).astype(np.float32)
    if train_mode:
        ref_model.train()
        our_model.train()
    else:
        ref_model.eval()
        our_model.eval()
    with torch.no_grad():
        y_ref = ref_model(torch.from_numpy(x)).numpy()
    y_our = np.asarray(our_model(jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    return float(np.abs(y_our - y_ref).max())


def grad_diffs(ref_model, our_model, batch: int = 4, chans: int = 16,
               size: int = 8, seed: int = 1) -> Dict[str, float]:
    """Per-parameter relative gradient difference for a module pair taking
    a (batch, chans, size, size) input. Loss = sum(output * fixed noise),
    so every cotangent path is exercised. Returns
    ``{torch_param_name: rel_diff}`` plus ``'__input__'``."""
    torch, _ = load_reference()
    import jax
    from flax import nnx
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, chans, size, size)).astype(np.float32)
    ref_model.train()
    our_model.train()
    xt = torch.from_numpy(x).requires_grad_(True)
    out = ref_model(xt)
    g = rng.standard_normal(tuple(out.shape)).astype(np.float32)
    out.backward(torch.from_numpy(g))
    ref_grads = {n: p.grad.detach().numpy()
                 for n, p in ref_model.named_parameters()
                 if p.grad is not None}
    gx_ref = xt.grad.numpy()

    gj = jnp.asarray(np.transpose(g, (0, 2, 3, 1)))
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    def f(model, xin):
        return (model(xin) * gj).sum()

    mg, xg = nnx.grad(f, argnums=(0, 1))(our_model, xj)

    def walk(d, prefix=()):
        if isinstance(d, dict):
            for k, v in d.items():
                yield from walk(v, prefix + (str(k),))
        else:
            yield prefix, d

    diffs = {}
    for path, gv in walk(nnx.to_pure_dict(mg)):
        leaf, name = path[-1], ".".join(path[:-1])
        t = np.asarray(gv)
        if leaf == "kernel":
            t = np.transpose(t, (3, 2, 0, 1)) if t.ndim == 4 else t.T
            tname = f"{name}.weight"
        elif leaf in ("scale", "weight"):
            tname = f"{name}.weight"
        elif leaf == "alpha":
            tname = f"{name}.alpha"
        else:
            tname = f"{name}.{leaf}"
        rg = ref_grads.get(tname)
        if rg is None:
            continue
        rg = rg.reshape(t.shape)
        diffs[tname] = float(
            np.abs(t - rg).max() / (np.abs(rg).max() + 1e-12))
    gx = np.transpose(np.asarray(xg), (0, 3, 1, 2))
    diffs["__input__"] = float(
        np.abs(gx - gx_ref).max() / (np.abs(gx_ref).max() + 1e-12))
    return diffs


def build_smoke_pair(config: str, num_classes: int = 10,
                     tmpdir: Optional[str] = None):
    """A small maxpool-free conv pair with identical weights.

    Maxpool over post-ReLU feature maps is full of TIED zeros, and torch
    vs XLA break pooling-gradient ties differently — a real, systematic
    gradient-routing difference that makes even fp32 training curves drift.
    The smoke model (conv/BN/PReLU stacks + avgpool head) has no ties, so
    its curves must track to fp noise; ResNet curves are compared
    statistically."""
    torch, ref = load_reference()
    from flax import nnx

    from bnn_tpu import nn, prepare_binary_model

    torch.manual_seed(0)
    tn = torch.nn
    ref_model = tn.Sequential(
        tn.Conv2d(3, 16, 3, padding=1), tn.BatchNorm2d(16), tn.PReLU(16),
        tn.Conv2d(16, 16, 3, padding=1), tn.BatchNorm2d(16), tn.PReLU(16),
        tn.AdaptiveAvgPool2d(1), tn.Flatten(),
        tn.Linear(16, num_classes))
    ref_model = ref.prepare_binary_model(
        ref_model, _ref_bconfig(config),
        ignore_layers_name=["_first_", "_last_"])
    rngs = nnx.Rngs(0)
    our_model = nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1, rngs=rngs),
        nn.BatchNorm2d(16, rngs=rngs), nn.PReLU(16, rngs=rngs),
        nn.Conv2d(16, 16, 3, padding=1, rngs=rngs),
        nn.BatchNorm2d(16, rngs=rngs), nn.PReLU(16, rngs=rngs),
        nn.AdaptiveAvgPool2d(1), nn.Flatten(),
        nn.Linear(16, num_classes, rngs=rngs))
    our_model = prepare_binary_model(
        our_model, bconfig=_our_bconfig(config),
        ignore_layers_name=["_first_", "_last_"])
    transfer_weights(ref_model, our_model, tmpdir)
    return ref_model, our_model


def train_curves(config: str = "xnor", n_steps: int = 200, batch: int = 32,
                 size: int = 32, num_classes: int = 10, lr: float = 1e-3,
                 seed: int = 42, arch: str = "resnet18",
                 tmpdir: Optional[str] = None) -> Tuple[List[float], List[float]]:
    """Train the reference and bnn_tpu from IDENTICAL init on IDENTICAL
    synthetic CIFAR batches with Adam (the reference's cifar10 settings,
    examples/cifar10.py:63-123); returns the two per-step loss curves.
    ``arch='smoke'`` uses the tie-free small pair (see build_smoke_pair)."""
    torch, _ = load_reference()
    import torch.nn.functional as TF
    import jax.numpy as jnp
    import optax
    from flax import nnx

    if arch == "smoke":
        ref_model, our_model = build_smoke_pair(config, num_classes, tmpdir)
    else:
        ref_model = build_ref_model(arch=arch, config=config,
                                    num_classes=num_classes)
        our_model = build_our_model(arch=arch, config=config,
                                    num_classes=num_classes)
        transfer_weights(ref_model, our_model, tmpdir)

    rng = np.random.default_rng(seed)
    batches = [
        (rng.standard_normal((batch, 3, size, size)).astype(np.float32),
         rng.integers(0, num_classes, batch).astype(np.int64))
        for _ in range(n_steps)
    ]

    ref_model.train()
    opt = torch.optim.Adam(ref_model.parameters(), lr=lr)
    ref_losses = []
    for xb, yb in batches:
        opt.zero_grad()
        loss = TF.cross_entropy(ref_model(torch.from_numpy(xb)),
                                torch.from_numpy(yb))
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    our_model.train()
    optimizer = nnx.Optimizer(our_model, optax.adam(lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt_, x, y):
        def loss_fn(model):
            return optax.softmax_cross_entropy_with_integer_labels(
                model(x), y).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt_.update(model, grads)
        return loss

    our_losses = []
    for xb, yb in batches:
        loss = step(our_model, optimizer,
                    jnp.asarray(np.transpose(xb, (0, 2, 3, 1))),
                    jnp.asarray(yb))
        our_losses.append(float(loss))
    return ref_losses, our_losses


def chef_layer_report(chef, model, run_step, named_modules, is_binary,
                      binarizer_names, n_steps: int):
    """Apply every recipe step; after each, record
    ``{layer_name: (pre, post, weight) binarizer class names}``."""
    reports = []
    for i in range(n_steps):
        model = run_step(model, i)
        rep = {}
        for name, m in named_modules(model):
            if is_binary(m):
                rep[name] = binarizer_names(m)
        reports.append(rep)
    return model, reports


def compare_chefs(recipe_path: str, num_classes: int = 10):
    """Run the reference's BinaryChef and ours on the SAME yaml file over
    equivalent resnet18s; returns (ref_reports, our_reports) of per-step
    {layer: (pre, post, weight)} dicts. Class names are normalized
    (the reference spells no-ops 'Identity' both ways)."""
    torch, ref = load_reference()
    import bnn.engine as ref_engine
    import bnn.layers as ref_layers
    import bnn.models.resnet as ref_resnet

    def norm(n: str) -> str:
        return "Identity" if n == "Identity" or n.endswith(".Identity") else n

    torch.manual_seed(0)
    ref_model = ref_resnet.resnet18(num_classes=num_classes)
    ref_chef = ref_engine.BinaryChef(recipe_path)
    _, ref_reports = chef_layer_report(
        ref_chef, ref_model,
        run_step=lambda m, i: ref_chef.run_step(m, i),
        named_modules=lambda m: m.named_modules(),
        is_binary=lambda m: isinstance(
            m, (ref_layers.Conv2d, ref_layers.Conv1d, ref_layers.Linear)),
        binarizer_names=lambda m: (
            norm(type(m.activation_pre_process).__name__),
            norm(type(m.activation_post_process).__name__),
            norm(type(m.weight_pre_process).__name__)),
        n_steps=len(ref_chef))

    from flax import nnx

    from bnn_tpu import BinaryChef, models
    from bnn_tpu.binarize import named_modules as our_named
    from bnn_tpu.layers import BinaryConv1d, BinaryConv2d, BinaryLinear

    our_model = models.resnet18(num_classes=num_classes, rngs=nnx.Rngs(0))
    our_chef = BinaryChef(recipe_path)
    _, our_reports = chef_layer_report(
        our_chef, our_model,
        run_step=lambda m, i: our_chef.run_step(m, i),
        named_modules=our_named,
        is_binary=lambda m: isinstance(
            m, (BinaryConv1d, BinaryConv2d, BinaryLinear)),
        binarizer_names=lambda m: (
            norm(type(m.activation_pre_process).__name__),
            norm(type(m.activation_post_process).__name__),
            norm(type(m.weight_pre_process).__name__)),
        n_steps=len(our_chef))
    return ref_reports, our_reports


# -- CLI report --------------------------------------------------------------

FORWARD_CASES = [
    # (label, kwargs) — every runnable reference model-level family/stem.
    # resnet50 (Bottleneck/PreBottleneck at MODEL level) is omitted: the
    # reference's own resnet50 cannot run — its head is
    # ``Linear(512, n)`` regardless of block expansion
    # (ref bnn/models/resnet.py:166, 204-213), so the forward crashes with
    # a 2048-vs-512 matmul mismatch. The bottleneck families are
    # parity-tested at BLOCK level instead (tests/test_reference_parity.py).
    ("r18_xnor", dict(arch="resnet18", config="xnor")),
    ("r18_xnor_scaled", dict(arch="resnet18", config="xnor_scaled")),
    ("r18_xnor_net_plus", dict(arch="resnet18", config="xnor_net_plus")),
    ("r18_preact_prelu", dict(arch="resnet18", block="PreBasicBlock",
                              activation="PReLU", config="xnor_scaled")),
    ("r18_dabnn_stem", dict(arch="resnet18", stem="dabnn",
                            config="xnor_scaled")),
]


def main():
    _force_cpu()
    results = {}
    failures = []
    for label, kwargs in FORWARD_CASES:
        ref_m, our_m, _ = make_pair(**kwargs)
        d_eval = results[f"forward_eval/{label}"] = forward_diff(ref_m, our_m)
        d_train = results[f"forward_train/{label}"] = forward_diff(
            ref_m, our_m, train_mode=True)
        # eval-mode logits are the parity oracle (tolerance 1e-4).
        # train-mode on BINARY configs is reported for completeness but is
        # inherently chaotic: batch-stat BN shifts sit exactly on sign()
        # kinks, so ~1e-7 backend noise flips activation bits and whole
        # channels diverge — the same pair matches at <1e-3 on fp32
        # configs (tests/test_reference_parity.py documents this)
        ok = d_eval < 1e-4
        if not ok:
            failures.append(label)
        print(f"{label}: eval {d_eval:.2e} [{'OK' if ok else 'FAIL'}] "
              f"train {d_train:.2e} [chaotic-by-design on binary configs]",
              flush=True)

    ref_rep, our_rep = compare_chefs(
        os.path.join(REFERENCE_PATH, "test/assets/test.yaml"))
    results["chef_steps_equal"] = ref_rep == our_rep
    print("chef parity:", ref_rep == our_rep, flush=True)

    for config, steps, arch in (("fp32", 60, "smoke"),
                                ("xnor_scaled", 200, "resnet18")):
        ref_l, our_l = train_curves(config=config, n_steps=steps, arch=arch)
        d = np.abs(np.array(ref_l) - np.array(our_l))
        results[f"train/{config}/mean_abs_diff"] = float(d.mean())
        results[f"train/{config}/final10_ref"] = float(np.mean(ref_l[-10:]))
        results[f"train/{config}/final10_ours"] = float(np.mean(our_l[-10:]))
        # the training bands GATE the verdict (same tolerances as
        # tests/test_reference_parity.py): fp32 curves must track to fp
        # noise; binary curves are chaotic but must stay in band
        if config == "fp32":
            ok = d.mean() < 5e-2
        else:
            ok = (d.mean() < 0.25
                  and abs(np.mean(ref_l[-10:]) - np.mean(our_l[-10:])) < 0.15)
        if not ok:
            failures.append(f"train/{config}")
        print(f"train {config} ({arch}): mean|Δloss| {d.mean():.4f}  "
              f"final10 ref {np.mean(ref_l[-10:]):.4f} "
              f"ours {np.mean(our_l[-10:]):.4f} [{'OK' if ok else 'FAIL'}]",
              flush=True)

    if not results["chef_steps_equal"]:
        failures.append("chef")
    print(json.dumps(results))
    if failures:
        print(f"PARITY FAIL: {failures}", flush=True)
        sys.exit(1)
    print("PARITY OK: all eval-mode forwards < 1e-4, chef steps equal, "
          "training curves in band", flush=True)


if __name__ == "__main__":
    main()
