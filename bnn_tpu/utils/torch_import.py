"""Import reference (PyTorch) checkpoints into bnn_tpu models.

The reference trains with torch and checkpoints ``{'state_dict': ...,
'optimizer': ..., 'epoch': ..., 'best_acc1': ...}`` via ``torch.save``
(reference examples/imagenet.py:218-256, examples/utils.py:62-68). This
module loads those files WITHOUT torch — ``torch.save``'s modern format is a
zip archive holding a pickle (``data.pkl``) whose tensors are persistent-id
references into raw little-endian storage files — and maps the tensors onto
a bnn_tpu model:

- module paths are identical by construction (``conv1``, ``layer1.0.conv1``,
  ``downsample.1`` ... — bnn_tpu/models/resnet.py keeps the reference's
  attribute names), so only the *leaf* conventions differ;
- conv ``weight`` (OIHW) -> ``kernel`` (HWIO), linear ``weight`` (O,I) ->
  ``kernel`` (I,O) — the transposes the golden layer tests encode
  (tests/test_layers.py:33-37);
- BatchNorm ``weight/bias/running_mean/running_var`` -> nnx
  ``scale/bias/mean/var``; ``num_batches_tracked`` is dropped;
- binarizer state like ``activation_post_process.alpha`` transfers with a
  reshape (the reference keeps broadcast shapes ``[1, C, 1, 1]``,
  bnn/ops.py:180-205; ours is ``(C,)``).

With this, accuracy parity vs a reference-trained run (BASELINE.md north
star) is measurable the moment reference weights are available — no
retraining needed.
"""
from __future__ import annotations

import io
import math
import os
import pickle
import zipfile
from typing import Any, Dict, List, Tuple, Union

import numpy as np
from flax import nnx

__all__ = ["load_torch_file", "torch_to_state_dict", "import_torch_checkpoint"]


# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("bool"),
}


def _bfloat16_dtype():
    import ml_dtypes  # ships with jax

    return np.dtype(ml_dtypes.bfloat16)


class _OrderedDictStub(dict):
    """dict subclass standing in for collections.OrderedDict so pickled
    instance attributes (torch's ``_metadata``) can be restored."""


class _StorageRef:
    """Lazy handle to one raw storage blob inside the checkpoint zip."""

    def __init__(self, data: bytes, dtype: np.dtype):
        self.data = data
        self.dtype = dtype

    def asarray(self) -> np.ndarray:
        if len(self.data) % self.dtype.itemsize:
            raise pickle.UnpicklingError(
                f"storage of {len(self.data)} bytes is not a multiple of "
                f"itemsize {self.dtype.itemsize}")
        return np.frombuffer(self.data, dtype=self.dtype)


def _rebuild_tensor(storage: _StorageRef, storage_offset, size, stride, *args):
    """Stand-in for ``torch._utils._rebuild_tensor_v2``: materialize a
    numpy array from (storage, offset, size, stride).

    The (offset, size, stride) triple comes straight from the (untrusted)
    pickle, and ``as_strided`` would happily read outside the storage
    buffer — so every extent is bounds-checked against the actual blob
    before the view is taken (tests/test_torch_import.py adversarial
    corpus)."""
    if not isinstance(storage, _StorageRef):
        raise pickle.UnpicklingError(
            f"tensor rebuild got {type(storage).__name__}, not a storage")
    flat = storage.asarray()
    def _as_int(v):
        # int() would silently TRUNCATE a crafted float (int(2.9) == 2)
        # where torch rejects the checkpoint — require exact integers
        if isinstance(v, bool):
            raise pickle.UnpicklingError("bool tensor geometry value")
        if isinstance(v, (int, np.integer)):
            return int(v)
        if isinstance(v, float) and v.is_integer():
            return int(v)
        raise pickle.UnpicklingError(
            f"non-integral tensor geometry value: {v!r}")

    try:
        storage_offset = _as_int(storage_offset)
        size = tuple(_as_int(s) for s in size)
        stride = tuple(_as_int(s) for s in stride)
    except (TypeError, ValueError) as e:
        raise pickle.UnpicklingError(
            f"non-integer tensor geometry: {e}") from None
    if storage_offset < 0 or storage_offset >= max(flat.size, 1):
        raise pickle.UnpicklingError(
            f"tensor storage_offset {storage_offset} outside storage "
            f"of {flat.size} elements")
    if not size:
        if flat.size == 0:
            raise pickle.UnpicklingError("0-d tensor over empty storage")
        return flat[storage_offset].copy()
    if len(stride) != len(size) or any(s < 0 for s in size):
        raise pickle.UnpicklingError(
            f"malformed tensor geometry size={size} stride={stride}")
    if any(s < 0 for s in stride):
        raise pickle.UnpicklingError(
            f"negative strides not allowed in a checkpoint: {stride}")
    if any(st == 0 and n > 1 for n, st in zip(size, stride)):
        # stride-0 broadcast views pass the extent check below while
        # .copy() materializes prod(size) elements — a memory bomb from
        # 4 stored bytes. Checkpointed tensors are never expand()ed.
        raise pickle.UnpicklingError(
            f"zero stride over size>1 dim: size={size} stride={stride}")
    if math.prod(size) > max(flat.size - storage_offset, 0):
        raise pickle.UnpicklingError(
            f"tensor of {math.prod(size)} elements over storage of "
            f"{flat.size} (offset {storage_offset}) — overlapping or "
            f"oversized view")
    if 0 not in size:
        last = storage_offset + sum(
            (n - 1) * s for n, s in zip(size, stride))
        if last >= flat.size:
            raise pickle.UnpicklingError(
                f"tensor extent (offset {storage_offset}, size {size}, "
                f"stride {stride}) reads element {last} past storage "
                f"of {flat.size} elements")
    itemsize = flat.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
    )
    return view.copy()


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _TorchStub:
    """Callable stub for harmless torch constructors (e.g. ``torch.Size``)."""

    def __init__(self, name):
        self.name = name

    def __call__(self, *a, **k):
        if self.name.endswith("Size"):
            return tuple(a[0]) if a else ()
        raise pickle.UnpicklingError(
            f"torch checkpoint requires unsupported constructor {self.name}")


class _Unpickler(pickle.Unpickler):
    """Minimal, allow-listed unpickler for torch checkpoints.

    Only tensor-rebuild plumbing and plain containers are admitted;
    anything else (arbitrary classes, reduce payloads) raises. This is both
    the no-torch path AND a safer loader than ``torch.load`` for untrusted
    files.
    """

    def __init__(self, file, storages: Dict[str, bytes]):
        super().__init__(file, encoding="utf-8")
        self._storages = storages

    def find_class(self, module: str, name: str):
        if module == "collections" and name == "OrderedDict":
            # a dict SUBCLASS, not dict: torch's state_dict() attaches a
            # `_metadata` instance attribute that pickle restores via
            # instance __dict__, which plain dict lacks
            return _OrderedDictStub
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _rebuild_tensor
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch":
            if name in _STORAGE_DTYPES or name == "BFloat16Storage":
                return name  # storage *type tag*, consumed by persistent_load
            if name == "Size":
                return _TorchStub("torch.Size")
        if module == "numpy.core.multiarray" and name == "scalar":
            return lambda dt, b: np.frombuffer(b, dt)[0]
        if module == "numpy" and name == "dtype":
            return np.dtype
        raise pickle.UnpicklingError(
            f"global '{module}.{name}' is not allowed in a torch checkpoint")

    def persistent_load(self, saved_id):
        try:
            kind, tag, key, _location, _numel = saved_id
        except (TypeError, ValueError):
            raise pickle.UnpicklingError(
                f"malformed persistent id: {saved_id!r}") from None
        if kind != "storage":
            raise pickle.UnpicklingError(
                f"unsupported persistent id kind {kind!r}")
        tag = tag if isinstance(tag, str) else getattr(tag, "__name__", tag)
        if tag == "BFloat16Storage":
            dtype = _bfloat16_dtype()
        elif tag in _STORAGE_DTYPES:
            dtype = _STORAGE_DTYPES[tag]
        else:
            raise pickle.UnpicklingError(f"unknown storage type {tag!r}")
        try:
            data = self._storages[str(key)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"checkpoint references missing storage {key!r}") from None
        return _StorageRef(data, dtype)


def load_torch_file(path: str) -> Any:
    """Load a ``torch.save``d file (zip format, torch >= 1.6) without torch.

    Returns the deserialized object with every tensor as a numpy array.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(
            (n for n in names if n.endswith("/data.pkl")), None)
        if pkl_name is None:
            raise pickle.UnpicklingError(
                f"{path}: no */data.pkl member — not a torch.save zip")
        prefix = pkl_name[: -len("data.pkl")]
        storages = {
            n[len(prefix) + len("data/"):]: zf.read(n)
            for n in names
            if n.startswith(prefix + "data/")
        }
        return _Unpickler(io.BytesIO(zf.read(pkl_name)), storages).load()


def torch_to_state_dict(obj: Union[str, Dict]) -> Dict[str, np.ndarray]:
    """Normalize a checkpoint path / payload into a flat ``state_dict``.

    Accepts the reference's wrapper schema (``{'state_dict': ...}``,
    examples/imagenet.py:218-226) or a bare state_dict; strips DDP's
    ``module.`` prefix."""
    if isinstance(obj, (str, os.PathLike)):
        obj = load_torch_file(os.fspath(obj))
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise TypeError(f"expected a state_dict, got {type(obj)}")
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v)
    return out


# our leaf name -> candidate torch leaf names, tried in order
_LEAF_TO_TORCH = {
    "kernel": ("weight",),
    "scale": ("weight",),           # nnx.BatchNorm scale
    "mean": ("running_mean",),
    "var": ("running_var",),
    "bias": ("bias",),
    "weight": ("weight",),          # PReLU slope
    "alpha": ("alpha",),            # BasicScaleBinarizer
}

# torch leaves that have no counterpart here, silently dropped
_TORCH_ONLY_LEAVES = {"num_batches_tracked"}


def _to_ours(t: np.ndarray, leaf: str, target_shape: Tuple[int, ...]):
    """Reorient a torch tensor to our conventions for the given leaf."""
    if leaf == "kernel":
        if t.ndim == 4:      # conv2d OIHW -> HWIO
            t = np.transpose(t, (2, 3, 1, 0))
        elif t.ndim == 3:    # conv1d OIW -> WIO
            t = np.transpose(t, (2, 1, 0))
        elif t.ndim == 2:    # linear (O, I) -> (I, O)
            t = t.T
    if t.shape != tuple(target_shape):
        # The reshape fallback exists ONLY for broadcast-shaped binarizer
        # leaves (reference keeps alpha as [1, C, 1, 1], bnn/ops.py:180-205;
        # ours is (C,)). A size-matched but differently-shaped *kernel*
        # (e.g. an asymmetric (3,1) vs (1,3) conv) must NOT be silently
        # scrambled — report it as missing instead.
        squeezable = tuple(d for d in t.shape if d != 1) == tuple(
            d for d in target_shape if d != 1)
        if squeezable and (len(target_shape) <= 1 or leaf == "alpha"):
            t = t.reshape(target_shape)
        else:
            return None
    return t


def import_torch_checkpoint(
    model: nnx.Module,
    src: Union[str, Dict],
    strict: bool = True,
) -> Tuple[List[str], List[str]]:
    """Load a reference torch checkpoint's tensors into ``model`` in place.

    Returns ``(missing, unexpected)``:

    - ``missing``: our leaves with no usable torch source — either no key
      of the expected name, or an irreconcilable shape (annotated with
      both shapes);
    - ``unexpected``: torch keys that matched nothing.

    A name-matched-but-wrong-shape key appears ONLY in ``missing`` (with
    its shape diagnostic), never in ``unexpected``. ``strict=True`` raises
    if either list is non-empty.
    """
    from .checkpoint import _unflatten, _walk

    sd = torch_to_state_dict(src)
    state = nnx.state(model)
    pure = nnx.to_pure_dict(state)

    used, missing = set(), []
    flat = dict(_walk(pure))
    merged = {}
    for path, cur in flat.items():
        leaf = str(path[-1])
        prefix = ".".join(str(p) for p in path[:-1])
        got = None
        for tleaf in _LEAF_TO_TORCH.get(leaf, (leaf,)):
            tkey = f"{prefix}.{tleaf}" if prefix else tleaf
            if tkey in sd:
                used.add(tkey)  # name-matched either way
                got = _to_ours(sd[tkey], leaf, np.shape(cur))
                if got is None:
                    missing.append(
                        f"{'.'.join(str(p) for p in path)} "
                        f"[shape: torch {tuple(sd[tkey].shape)} vs "
                        f"{tuple(np.shape(cur))}]")
                break
        else:
            missing.append(".".join(str(p) for p in path))
        merged[path] = (cur if got is None
                        else got.astype(np.asarray(cur).dtype))

    unexpected = [
        k for k in sd
        if k not in used and k.rsplit(".", 1)[-1] not in _TORCH_ONLY_LEAVES
    ]
    if strict and (missing or unexpected):
        raise ValueError(
            f"torch import mismatch: missing={missing[:5]} "
            f"unexpected={unexpected[:5]}")

    nnx.replace_by_pure_dict(state, _unflatten(merged))
    nnx.update(model, state)
    return missing, unexpected
