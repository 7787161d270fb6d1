"""Reference-checkpoint importer (utils/torch_import.py).

Round-trips a real ``torch.save`` file: a binarized bnn_tpu model's state
is exported to the reference's checkpoint schema (torch tensors in torch
layout conventions, ``{'state_dict': ...}`` wrapper —
reference examples/imagenet.py:218-256), saved with torch, then imported
into a fresh differently-seeded model WITHOUT torch in the load path; the
outputs must match the original exactly (VERDICT r2 next #7)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.utils import import_torch_checkpoint, load_torch_file

BC = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def small_net(seed):
    rngs = nnx.Rngs(seed)
    net = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1, bias=False, rngs=rngs),
        nn.BatchNorm2d(8, rngs=rngs),
        nn.PReLU(8, rngs=rngs),
        nn.Conv2d(8, 8, 3, padding=1, rngs=rngs),
        nn.BatchNorm2d(8, rngs=rngs),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(8, 4, rngs=rngs),
    )
    return prepare_binary_model(net, bconfig=BC,
                                ignore_layers_name=["_first_", "_last_"])


def export_torch_state_dict(model):
    """Inverse of the importer's mapping: our leaves -> torch layout."""
    pure = nnx.to_pure_dict(nnx.state(model))
    sd = {}

    def walk(d, prefix=()):
        if isinstance(d, dict):
            for k, v in d.items():
                walk(v, prefix + (str(k),))
            return
        path, leaf = prefix[:-1], prefix[-1]
        t = np.asarray(d)
        if leaf == "kernel":
            if t.ndim == 4:
                t = np.transpose(t, (3, 2, 0, 1))  # HWIO -> OIHW
            elif t.ndim == 2:
                t = t.T                            # (I,O) -> (O,I)
            tleaf = "weight"
        elif leaf == "scale":
            tleaf = "weight"
        elif leaf == "mean":
            tleaf = "running_mean"
        elif leaf == "var":
            tleaf = "running_var"
        elif leaf == "alpha":
            t = t.reshape((1,) + t.shape + (1, 1))  # (C,) -> [1,C,1,1]
            tleaf = "alpha"
        else:
            tleaf = leaf
        sd[".".join(path + (tleaf,))] = torch.from_numpy(np.ascontiguousarray(t))

    walk(pure)
    return sd


def test_round_trip_through_torch_save(tmp_path):
    src = small_net(seed=0)
    src.eval()
    # make BN stats + alpha non-trivial
    src[1].mean[...] = jnp.linspace(-0.5, 0.5, 8)
    src[1].var[...] = jnp.linspace(0.5, 2.0, 8)
    src[3].activation_post_process.alpha[...] = jnp.linspace(0.5, 1.5, 8)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    expected = src(x)

    sd = export_torch_state_dict(src)
    sd["1.num_batches_tracked"] = torch.tensor(123)  # dropped on import
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save({"state_dict": sd, "epoch": 7, "best_acc1": 51.2,
                "arch": "testnet"}, path)

    dst = small_net(seed=99)
    dst.eval()
    assert not np.allclose(dst(x), expected)
    missing, unexpected = import_torch_checkpoint(dst, path)
    assert missing == [] and unexpected == []
    np.testing.assert_allclose(dst(x), expected, rtol=1e-6, atol=1e-6)


def test_ddp_prefix_and_bare_state_dict(tmp_path):
    src = small_net(seed=3)
    src.eval()
    sd = {f"module.{k}": v for k, v in export_torch_state_dict(src).items()}
    path = str(tmp_path / "ddp.pth")
    torch.save(sd, path)  # bare state_dict, DDP prefixes
    dst = small_net(seed=4)
    dst.eval()
    import_torch_checkpoint(dst, path)
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 3))
    np.testing.assert_allclose(dst(x), src(x), rtol=1e-6, atol=1e-6)


def test_strict_raises_on_unexpected(tmp_path):
    src = small_net(seed=0)
    sd = export_torch_state_dict(src)
    sd["nonexistent.weight"] = torch.zeros(3)
    path = str(tmp_path / "bad.pth")
    torch.save({"state_dict": sd}, path)
    dst = small_net(seed=1)
    with pytest.raises(ValueError, match="unexpected"):
        import_torch_checkpoint(dst, path)
    # non-strict: imports the rest, reports the stray key
    _, unexpected = import_torch_checkpoint(dst, path, strict=False)
    assert unexpected == ["nonexistent.weight"]


def test_loader_rejects_arbitrary_globals(tmp_path):
    """The no-torch loader is allow-listed: a pickle smuggling os.system
    must fail to load, not execute."""
    import pickle as pkl

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    path = str(tmp_path / "evil.pth")
    torch.save({"state_dict": {"x": Evil()}}, path)
    with pytest.raises(pkl.UnpicklingError, match="not allowed"):
        load_torch_file(path)


def test_resnet18_schema_matches_torchvision_names():
    """Every leaf path of our (binarized) resnet18 must resolve to a torch
    key of the reference's naming scheme — guards against silent renames."""
    from bnn_tpu import models
    from bnn_tpu.utils.torch_import import _LEAF_TO_TORCH

    model = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
    model = prepare_binary_model(model, bconfig=BC,
                                 ignore_layers_name=["_first_", "_last_"])
    pure = nnx.to_pure_dict(nnx.state(model))

    def leaves(d, prefix=()):
        if isinstance(d, dict):
            for k, v in d.items():
                yield from leaves(v, prefix + (str(k),))
        else:
            yield prefix

    names = {p[-1] for p in leaves(pure)}
    assert names <= set(_LEAF_TO_TORCH), names - set(_LEAF_TO_TORCH)
    # spot-check the reference's canonical paths exist
    paths = {".".join(p) for p in leaves(pure)}
    assert "conv1.kernel" in paths
    assert "layer1.0.conv1.kernel" in paths
    assert "fc.kernel" in paths


def test_real_state_dict_with_metadata(tmp_path):
    """An ACTUAL torch nn.Module.state_dict() carries a _metadata instance
    attribute on its OrderedDict; the no-torch loader must absorb it
    (review r3 — previously crashed on every genuine checkpoint)."""
    tm = torch.nn.Sequential(torch.nn.Conv2d(3, 4, 3), torch.nn.Linear(4, 2))
    path = str(tmp_path / "real.pth")
    torch.save({"state_dict": tm.state_dict(), "epoch": 1}, path)
    sd = load_torch_file(path)["state_dict"]
    assert "0.weight" in sd and "1.bias" in sd
    assert np.asarray(sd["0.weight"]).shape == (4, 3, 3, 3)
    np.testing.assert_allclose(np.asarray(sd["1.weight"]),
                               tm[1].weight.detach().numpy())


def test_shape_mismatch_reported_once(tmp_path):
    """A name-matched wrong-shape tensor lands ONLY in `missing` (with the
    shape diagnostic), not in `unexpected` (review r3)."""
    src = small_net(seed=0)
    sd = export_torch_state_dict(src)
    sd["7.weight"] = torch.zeros(3, 8)  # fc head with a wrong shape
    path = str(tmp_path / "shape.pth")
    torch.save({"state_dict": sd}, path)
    dst = small_net(seed=1)
    missing, unexpected = import_torch_checkpoint(dst, path, strict=False)
    assert unexpected == []
    assert len(missing) == 1 and "shape" in missing[0], missing
