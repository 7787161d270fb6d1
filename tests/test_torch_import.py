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


# ---------------------------------------------------------------------------
# Adversarial corpus (VERDICT r4 next #8): the loader advertises itself as
# safe on untrusted files; every hostile geometry/structure below must raise
# a clean UnpicklingError/BadZipFile — never crash, OOB-read, or allocate
# unboundedly. Checkpoints are HAND-CRAFTED zips (torch.save's layout:
# archive/data.pkl + archive/data/<key> storages) so each field can be
# poisoned independently.
# ---------------------------------------------------------------------------
import io
import pickle as _pkl
import zipfile as _zipfile


class _StorageToken:
    """Pickles (via persistent_id) into torch.save's storage reference."""

    def __init__(self, tag="FloatStorage", key="0", numel=4):
        self.tag, self.key, self.numel = tag, key, numel


class _CraftedTensor:
    """Pickles into a torch._utils._rebuild_tensor_v2 call with arbitrary
    (hostile) offset/size/stride."""

    def __init__(self, token, offset, size, stride):
        self.token, self.offset = token, offset
        self.size, self.stride = size, stride

    def __reduce__(self):
        import torch._utils as tu

        return (tu._rebuild_tensor_v2,
                (self.token, self.offset, self.size, self.stride, False, {}))


class _Crafter(_pkl.Pickler):
    def persistent_id(self, o):
        if isinstance(o, _StorageToken):
            return ("storage", o.tag, o.key, "cpu", o.numel)
        return None


def craft_ckpt(tmp_path, name, obj=None, storages=None, pkl_bytes=None,
               pkl_name="archive/data.pkl"):
    if pkl_bytes is None:
        b = io.BytesIO()
        _Crafter(b, protocol=2).dump(obj)
        pkl_bytes = b.getvalue()
    path = str(tmp_path / name)
    with _zipfile.ZipFile(path, "w") as z:
        if pkl_name is not None:
            z.writestr(pkl_name, pkl_bytes)
        for k, v in (storages or {}).items():
            z.writestr(f"archive/data/{k}", v)
    return path


FOUR_FLOATS = np.arange(4, dtype="<f4").tobytes()


def test_crafted_valid_checkpoint_loads(tmp_path):
    """The crafting helper speaks real torch.save format (sanity anchor for
    the hostile cases below)."""
    t = _CraftedTensor(_StorageToken(), 0, (2, 2), (2, 1))
    p = craft_ckpt(tmp_path, "ok.pth", {"w": t}, {"0": FOUR_FLOATS})
    out = load_torch_file(p)
    np.testing.assert_array_equal(out["w"],
                                  np.arange(4, dtype="<f4").reshape(2, 2))


@pytest.mark.parametrize("offset,size,stride", [
    (-1, (2,), (1,)),            # negative offset
    (99, (2,), (1,)),            # offset past storage
    (0, (2, 3), (1,)),           # rank mismatch
    (0, (-2,), (1,)),            # negative size
    (0, (4,), (-1,)),            # negative stride
    (0, (3,), (2,)),             # extent past storage end
    (0, (2**20, 2**20), (0, 0)),  # stride-0 memory bomb over 4 floats
    (0, (2**40,), (1,)),         # numel bomb
    (2, (4,), (1,)),             # offset+size past end
    ("x", (2,), (1,)),           # non-integer offset
    (0, (2,), ("y",)),           # non-integer stride
    (2.9, (2,), (1,)),           # truncating float offset (int(2.9)==2)
    (0, (2.5,), (1,)),           # truncating float size
    (0, (2,), (1.5,)),           # truncating float stride
    (True, (2,), (1,)),          # bool offset
])
def test_hostile_tensor_geometry(tmp_path, offset, size, stride):
    t = _CraftedTensor(_StorageToken(), offset, size, stride)
    p = craft_ckpt(tmp_path, "geom.pth", {"w": t}, {"0": FOUR_FLOATS})
    with pytest.raises(_pkl.UnpicklingError):
        load_torch_file(p)


def test_missing_storage(tmp_path):
    t = _CraftedTensor(_StorageToken(key="7"), 0, (2,), (1,))
    p = craft_ckpt(tmp_path, "nostorage.pth", {"w": t}, {"0": FOUR_FLOATS})
    with pytest.raises(_pkl.UnpicklingError, match="missing storage"):
        load_torch_file(p)


def test_unknown_storage_tag(tmp_path):
    t = _CraftedTensor(_StorageToken(tag="EvilStorage"), 0, (2,), (1,))
    p = craft_ckpt(tmp_path, "eviltag.pth", {"w": t}, {"0": FOUR_FLOATS})
    with pytest.raises(_pkl.UnpicklingError, match="storage type"):
        load_torch_file(p)


def test_malformed_persistent_id(tmp_path):
    class BadToken:
        def __reduce_ex__(self, _):
            raise NotImplementedError

    class P(_pkl.Pickler):
        def persistent_id(self, o):
            if isinstance(o, BadToken):
                return ("storage", "FloatStorage")  # wrong arity
            return None

    b = io.BytesIO()
    P(b, protocol=2).dump({"w": BadToken()})
    p = craft_ckpt(tmp_path, "badpid.pth", pkl_bytes=b.getvalue(),
                   storages={"0": FOUR_FLOATS})
    with pytest.raises(_pkl.UnpicklingError, match="persistent id"):
        load_torch_file(p)

    class P2(P):
        def persistent_id(self, o):
            if isinstance(o, BadToken):
                return ("not-storage", "FloatStorage", "0", "cpu", 4)
            return None

    b2 = io.BytesIO()
    P2(b2, protocol=2).dump({"w": BadToken()})
    p2 = craft_ckpt(tmp_path, "badkind.pth", pkl_bytes=b2.getvalue(),
                    storages={"0": FOUR_FLOATS})
    with pytest.raises(_pkl.UnpicklingError, match="kind"):
        load_torch_file(p2)


def test_storage_not_dtype_multiple(tmp_path):
    t = _CraftedTensor(_StorageToken(), 0, (1,), (1,))
    p = craft_ckpt(tmp_path, "ragged.pth", {"w": t}, {"0": b"\x00" * 5})
    with pytest.raises(_pkl.UnpicklingError, match="multiple"):
        load_torch_file(p)


def test_no_data_pkl(tmp_path):
    p = craft_ckpt(tmp_path, "nopkl.pth", pkl_bytes=b"", pkl_name=None,
                   storages={"0": FOUR_FLOATS})
    with pytest.raises(_pkl.UnpicklingError, match="data.pkl"):
        load_torch_file(p)


def test_truncated_zip(tmp_path):
    src = small_net(seed=0)
    path = str(tmp_path / "full.pth")
    torch.save({"state_dict": export_torch_state_dict(src)}, path)
    blob = open(path, "rb").read()
    for frac in (0.15, 0.6, 0.97):
        tpath = str(tmp_path / f"trunc{frac}.pth")
        with open(tpath, "wb") as f:
            f.write(blob[: int(len(blob) * frac)])
        with pytest.raises((_zipfile.BadZipFile, _pkl.UnpicklingError,
                            EOFError)):
            load_torch_file(tpath)


def test_truncated_pickle_inside_zip(tmp_path):
    t = _CraftedTensor(_StorageToken(), 0, (2, 2), (2, 1))
    b = io.BytesIO()
    _Crafter(b, protocol=2).dump({"w": t})
    cut = b.getvalue()[: len(b.getvalue()) // 2]
    p = craft_ckpt(tmp_path, "cutpkl.pth", pkl_bytes=cut,
                   storages={"0": FOUR_FLOATS})
    with pytest.raises((_pkl.UnpicklingError, EOFError)):
        load_torch_file(p)


def test_nested_container_bomb(tmp_path):
    """Deep nesting must not crash the process (the C unpickler builds
    iteratively); either a clean load or a clean refusal is acceptable.
    The stream is raw opcodes — ``pickle.dumps`` itself recurses and
    cannot produce it: PROTO2, EMPTY_DICT, BINUNICODE 'd', EMPTY_TUPLE,
    then 5000 TUPLE1 wraps, SETITEM, STOP."""
    depth = 5000
    pkl_bytes = (b"\x80\x02}X\x01\x00\x00\x00d)" + b"\x85" * depth
                 + b"s.")
    p = craft_ckpt(tmp_path, "deep.pth", pkl_bytes=pkl_bytes)
    try:
        out = load_torch_file(p)
        n = 0
        cur = out["d"]
        while isinstance(cur, tuple) and cur:
            cur = cur[0]
            n += 1
        assert n == depth and cur == ()
    except _pkl.UnpicklingError:
        pass


def test_zero_size_dim_is_fine(tmp_path):
    t = _CraftedTensor(_StorageToken(), 0, (0, 3), (3, 1))
    p = craft_ckpt(tmp_path, "empty.pth", {"w": t}, {"0": FOUR_FLOATS})
    out = load_torch_file(p)
    assert out["w"].shape == (0, 3)
