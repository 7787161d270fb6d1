"""Serving-artifact export: freeze a ``Predictor`` into an on-disk bundle.

The reference framework has no deployment story at all — it binarizes
tensors in fp32 and stops at the trained torch module (reference
README.md:22).  On TPU the natural deployment unit is the *compiled
program*: everything a ``Predictor`` does (deployed layers, folded
epilogues, megakernels, bf16 casts, fixed-batch padding) is a single
traced computation, so it can be serialized with :mod:`jax.export` as a
StableHLO artifact plus a flat list of weight leaves.

    predictor = Predictor.from_model(model, batch_size=32)
    export_serving(predictor, "r18.bnnx", input_shape=(224, 224, 3))

    server = load_serving("r18.bnnx")     # needs only jax + numpy
    logits = server(images)               # same padding semantics

Design points:

- The exported function takes ``(leaves, x)`` where ``leaves`` is a plain
  *list* of arrays — the nnx graph/state structure is dissolved at export
  time, so loading requires neither flax nor any bnn_tpu model class.
- The program is compiled for the platform(s) it was exported for
  (``meta["platforms"]``); ``jax.export`` refuses execution elsewhere.
  Pallas megakernels serialize as TPU custom calls — export the fused
  pipeline on the hardware that will serve it, or build the predictor
  with ``use_pallas=False`` for a portable XLA-only artifact (pass
  ``platforms=("tpu", "cpu")`` for an artifact that runs on both).
- Batch shape is static (one executable per bundle, ``batch_size`` rides
  in ``meta.json``); the loader reproduces ``Predictor.__call__``'s
  pad-to-multiple / split / strip semantics exactly.
- Compatibility horizon is jax.export's: artifacts are readable by newer
  jax for the documented backward-compatibility window.

Bundle layout (a directory)::

    program.jaxir   serialized jax.export.Exported (StableHLO)
    state.npz       weight leaves, key = leaf index
    meta.json       batch_size, dtypes, input signature, platforms

Multi-chip bundles (format v2): a ``Predictor(mesh=...)`` — data-parallel
or tensor-parallel — exports the whole shard_map program with its
shardings (``jax.export`` carries ``nr_devices`` and per-argument
shardings in the StableHLO). ``meta.json`` records the mesh axis
names/sizes and each weight leaf's PartitionSpec; the loader rebuilds an
equivalent mesh over the first ``nr_devices`` local devices, lays the
leaves out per spec, and serves — round-tripped bit-exactly on the
virtual 8-device mesh (tests/test_export.py). The device COUNT must
match the export (that is jax.export's contract); the physical devices
need not be the same ones.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["export_serving", "load_serving", "ExportedServer"]

_FORMAT_VERSION = 2
_PROGRAM = "program.jaxir"
_STATE = "state.npz"
_META = "meta.json"


def _encode_spec(spec) -> list:
    """PartitionSpec -> JSON (entry: None | str | [str, ...])."""
    out = []
    for e in tuple(spec):
        out.append(list(e) if isinstance(e, (tuple, list)) else e)
    return out


def _decode_spec(entries):
    from jax.sharding import PartitionSpec as P

    return P(*[tuple(e) if isinstance(e, list) else e for e in entries])


def _strip_padding(out, n: int, mesh):
    """``out[:n]`` that also works when ``out`` is batch-sharded and ``n``
    does not divide over the mesh: slicing a sharded axis to a non-multiple
    length has no unambiguous sharding, so replicate first (a serving-
    boundary readback that was about to happen anyway)."""
    if out.shape[0] == n:
        return out
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = getattr(out, "sharding", None)
        if (isinstance(sharding, NamedSharding)
                and any(e is not None for e in tuple(sharding.spec))):
            out = jax.device_put(out, NamedSharding(mesh, P()))
    return out[:n]


def batched_call(one_batch, x, batch_size: int, mesh=None):
    """The serving-boundary pad/split/concat/strip discipline, shared by
    ``Predictor.__call__`` and ``ExportedServer.__call__`` so the two can
    never drift apart: pad ``x`` up to ``batch_size`` multiples, run
    ``one_batch`` per fixed-shape chunk, concatenate, strip back to the
    real row count (sharding-aware via :func:`_strip_padding`)."""
    n, bs = x.shape[0], batch_size
    if n == 0:
        # fabricating an output shape for zero rows would mean running a
        # padded batch for nothing — make the contract violation loud
        raise ValueError("empty request batch (0 rows)")
    padded_n = -(-n // bs) * bs
    if padded_n != n:
        pad = [(0, padded_n - n)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    outs = [one_batch(x[i:i + bs]) for i in range(0, padded_n, bs)]
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return _strip_padding(out, n, mesh)


def _leaf_spec(leaf):
    """The PartitionSpec a live array is laid out with (P() if unsharded)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = getattr(leaf, "sharding", None)
    if isinstance(sharding, NamedSharding):
        return sharding.spec
    return P()


def export_serving(predictor, path: str, input_shape: Sequence[int], *,
                   platforms: Optional[Sequence[str]] = None) -> None:
    """Serialize ``predictor`` to a self-contained bundle at ``path``.

    ``input_shape`` is the per-example shape (no batch dim), e.g.
    ``(224, 224, 3)``. ``platforms`` optionally lowers for several
    backends (e.g. ``("tpu", "cpu")``) — only possible for predictors
    without Pallas kernels (``use_pallas=False``).
    """
    from jax import export as jax_export

    mesh = predictor.mesh
    leaves = [jnp.asarray(l) for l in jax.tree.flatten(predictor._state)[0]]
    treedef = jax.tree.structure(predictor._state)
    graphdef = predictor._graphdef

    def _flat_run(flat, x):
        from flax import nnx  # export-time only; not needed to load

        state = jax.tree.unflatten(treedef, flat)
        out = nnx.merge(graphdef, state)(x)
        return out[0] if isinstance(out, tuple) else out

    x_shape = (predictor.batch_size, *input_shape)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    mesh_meta = None
    if mesh is None:
        x_aval = jax.ShapeDtypeStruct(x_shape, predictor.dtype)
        leaf_avals = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
        fn = jax.jit(_flat_run)
    else:
        # export the SAME shard_map program the live predictor serves:
        # per-leaf specs read off the live (already laid-out) arrays, the
        # request batch split over the data axis (replicated for pure-TP
        # meshes). jax.export records nr_devices + shardings; the loader
        # rebuilds an equivalent mesh (axis names/sizes in meta).
        from jax.sharding import NamedSharding, PartitionSpec as P

        if platforms is not None:
            raise ValueError(
                "multi-platform lowering and mesh export are mutually "
                "exclusive: a sharded program is compiled for its mesh")
        leaf_specs = [_leaf_spec(l) for l in leaves]
        batch_axis = getattr(predictor, "batch_axis", "data")
        x_spec = P(batch_axis) if batch_axis in mesh.shape else P()
        sharded = jax.shard_map(
            _flat_run, mesh=mesh, in_specs=(leaf_specs, x_spec),
            out_specs=x_spec, check_vma=False)
        fn = jax.jit(sharded)
        x_aval = jax.ShapeDtypeStruct(
            x_shape, predictor.dtype, sharding=NamedSharding(mesh, x_spec))
        leaf_avals = [
            jax.ShapeDtypeStruct(l.shape, l.dtype,
                                 sharding=NamedSharding(mesh, s))
            for l, s in zip(leaves, leaf_specs)]
        mesh_meta = {
            "axis_names": list(mesh.axis_names),
            "axis_sizes": [int(mesh.shape[a]) for a in mesh.axis_names],
            "x_spec": _encode_spec(x_spec),
            "leaf_specs": [_encode_spec(s) for s in leaf_specs],
        }
    exported = jax_export.export(fn, **kwargs)(leaf_avals, x_aval)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _PROGRAM), "wb") as f:
        f.write(exported.serialize())
    # bfloat16 has no numpy wire format — store a raw uint16 view + a
    # dtype tag so the loader can reconstruct it
    arrays, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        a = np.asarray(jax.device_get(leaf))
        dtypes.append(str(a.dtype))
        if a.dtype == jnp.bfloat16:
            a = a.view(np.uint16)
        arrays[f"leaf_{i:05d}"] = a
    np.savez(os.path.join(path, _STATE), **arrays)
    meta = {
        "format_version": _FORMAT_VERSION,
        "batch_size": predictor.batch_size,
        "input_shape": list(input_shape),
        "input_dtype": str(np.dtype(predictor.dtype)
                           if predictor.dtype != jnp.bfloat16 else "bfloat16"),
        "n_leaves": len(leaves),
        "leaf_dtypes": dtypes,
        "platforms": list(exported.platforms),
        "nr_devices": int(exported.nr_devices),
        "mesh": mesh_meta,
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)


class ExportedServer:
    """A loaded serving bundle: callable with ``Predictor`` semantics."""

    def __init__(self, exported, leaves, meta: dict):
        self._exported = exported
        self.meta = meta
        self.batch_size = int(meta["batch_size"])
        self.input_shape: Tuple[int, ...] = tuple(meta["input_shape"])
        self.platforms: Tuple[str, ...] = tuple(meta["platforms"])
        self.dtype = jnp.dtype(meta["input_dtype"])
        self.mesh = None
        self._x_sharding = None
        mesh_meta = meta.get("mesh")
        if mesh_meta:
            from jax.sharding import Mesh, NamedSharding

            n = int(meta.get("nr_devices", 1))
            devs = jax.devices()
            if len(devs) < n:
                raise ValueError(
                    f"bundle was exported for {n} devices; only "
                    f"{len(devs)} available")
            self.mesh = Mesh(
                np.array(devs[:n]).reshape(mesh_meta["axis_sizes"]),
                tuple(mesh_meta["axis_names"]))
            leaves = [
                jax.device_put(l, NamedSharding(self.mesh, _decode_spec(s)))
                for l, s in zip(leaves, mesh_meta["leaf_specs"])]
            self._x_sharding = NamedSharding(
                self.mesh, _decode_spec(mesh_meta["x_spec"]))
        self._leaves = leaves
        self._forward = jax.jit(exported.call)

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, self.dtype)
        if x.shape[1:] != self.input_shape:
            raise ValueError(
                f"input shape {x.shape[1:]} != exported signature "
                f"{self.input_shape}")
        def _one(xb):
            if self._x_sharding is not None:
                xb = jax.device_put(xb, self._x_sharding)
            return self._forward(self._leaves, xb)

        return batched_call(_one, x, self.batch_size, self.mesh)

    def state_bytes(self) -> int:
        return sum(l.size * l.dtype.itemsize for l in self._leaves)


def load_serving(path: str) -> ExportedServer:
    """Load a bundle written by :func:`export_serving`.

    Requires only jax + numpy: the program is deserialized StableHLO and
    the weights are a flat leaf list — no flax, no model classes.
    """
    from jax import export as jax_export

    meta_path = os.path.join(path, _META)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"not a serving bundle (no {_META}): {path}")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format_version") not in (1, _FORMAT_VERSION):
        raise ValueError(
            f"unsupported bundle format {meta.get('format_version')!r} "
            f"(loader supports 1..{_FORMAT_VERSION}; v1 = single-device, "
            f"v2 adds mesh bundles)")
    with open(os.path.join(path, _PROGRAM), "rb") as f:
        exported = jax_export.deserialize(f.read())
    npz = np.load(os.path.join(path, _STATE))
    leaves = []
    for i, dt in enumerate(meta["leaf_dtypes"]):
        a = npz[f"leaf_{i:05d}"]
        if dt == "bfloat16":
            a = a.view(jnp.bfloat16)
        leaves.append(jnp.asarray(a))
    return ExportedServer(exported, leaves, meta)
