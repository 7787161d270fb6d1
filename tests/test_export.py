"""Serving-artifact export/load round trips (bnn_tpu.inference.export).

The bundle is a StableHLO program + flat weight leaves: loading must not
require flax or any bnn_tpu model class, and the loaded server must
reproduce the live Predictor bit-for-bit on the same platform (here: the
CPU backend, so the predictor is built with use_pallas=False and the
exported program is pure XLA).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.inference import Predictor, export_serving, load_serving
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)

BCONFIG = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def _bin_model():
    rngs = nnx.Rngs(0)
    net = nn.Sequential(
        nn.Conv2d(3, 32, 3, padding=1, rngs=rngs),
        nn.BatchNorm2d(32, rngs=rngs),
        nn.PReLU(32, rngs=rngs),
        nn.Conv2d(32, 64, 3, stride=2, padding=1, rngs=rngs),
        nn.BatchNorm2d(64, rngs=rngs),
        nn.PReLU(64, rngs=rngs),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(64, 10, rngs=rngs),
    )
    m = prepare_binary_model(net, bconfig=BCONFIG,
                             ignore_layers_name=["_first_"])
    m.eval()
    return m


def _rand(key, shape):
    return jax.random.normal(key, shape) + 0.1


class TestExportRoundTrip:
    def _predictor(self, **kw):
        kw.setdefault("batch_size", 4)
        kw.setdefault("use_pallas", False)
        kw.setdefault("dtype", None)  # fp32: exact cross-check on CPU
        return Predictor.from_model(_bin_model(), **kw)

    def test_round_trip_exact(self, tmp_path):
        pred = self._predictor()
        path = str(tmp_path / "bundle")
        export_serving(pred, path, input_shape=(8, 8, 3))

        server = load_serving(path)
        x = _rand(jax.random.key(0), (4, 8, 8, 3))
        np.testing.assert_array_equal(np.asarray(server(x)),
                                      np.asarray(pred(x)))
        assert server.batch_size == 4
        assert server.input_shape == (8, 8, 3)
        assert server.state_bytes() > 0

    def test_padding_and_multi_batch(self, tmp_path):
        """n not a multiple of batch_size, and n spanning two executions:
        the loader must reproduce Predictor's pad/split/strip exactly."""
        pred = self._predictor()
        path = str(tmp_path / "bundle")
        pred.export(path, input_shape=(8, 8, 3))  # method form
        server = load_serving(path)
        for n in (1, 3, 4, 7):
            x = _rand(jax.random.key(n), (n, 8, 8, 3))
            out = server(x)
            assert out.shape == (n, 10)
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(pred(x)))

    def test_bf16_leaves_survive_npz(self, tmp_path):
        """bfloat16 has no numpy wire format; the uint16-view round trip
        must restore dtype and values exactly."""
        pred = self._predictor(dtype=jnp.bfloat16)
        path = str(tmp_path / "bundle")
        export_serving(pred, path, input_shape=(8, 8, 3))
        server = load_serving(path)
        assert server.dtype == jnp.bfloat16
        x = _rand(jax.random.key(2), (4, 8, 8, 3))
        np.testing.assert_array_equal(
            np.asarray(server(x), np.float32),
            np.asarray(pred(x), np.float32))

    def test_bundle_is_flax_free(self, tmp_path):
        """The artifact must be loadable from only jax + numpy: no flax
        types in the state file, and meta/program files self-contained."""
        pred = self._predictor()
        path = str(tmp_path / "bundle")
        export_serving(pred, path, input_shape=(8, 8, 3))
        npz = np.load(os.path.join(path, "state.npz"))
        assert all(k.startswith("leaf_") for k in npz.files)
        meta = json.load(open(os.path.join(path, "meta.json")))
        assert meta["n_leaves"] == len(npz.files)
        assert meta["platforms"]  # recorded for mismatch diagnostics
        # program file is plain bytes, parse-checked by the loader
        assert os.path.getsize(os.path.join(path, "program.jaxir")) > 0

    def test_quantized_head_exports(self, tmp_path):
        """int8 weight-only head (compress.py) rides through export —
        its DequantizeEinsum custom bits are plain lax ops."""
        pred = self._predictor(quantize_float_bits=8)
        path = str(tmp_path / "bundle")
        export_serving(pred, path, input_shape=(8, 8, 3))
        server = load_serving(path)
        x = _rand(jax.random.key(3), (4, 8, 8, 3))
        np.testing.assert_array_equal(np.asarray(server(x)),
                                      np.asarray(pred(x)))

    def test_multi_platform_export(self, tmp_path):
        """platforms=('cpu','tpu') lowers one portable XLA-only artifact
        (possible because use_pallas=False — no TPU custom calls); it must
        load and run on the CPU backend here."""
        pred = self._predictor()
        path = str(tmp_path / "bundle")
        export_serving(pred, path, input_shape=(8, 8, 3),
                       platforms=("cpu", "tpu"))
        server = load_serving(path)
        assert set(server.platforms) == {"cpu", "tpu"}
        x = _rand(jax.random.key(5), (4, 8, 8, 3))
        np.testing.assert_array_equal(np.asarray(server(x)),
                                      np.asarray(pred(x)))

    def test_mesh_dp_round_trip(self, tmp_path):
        """Format v2: a data-parallel (shard_map) predictor freezes whole —
        the loader rebuilds an equivalent mesh over the local devices and
        reproduces the live predictor bit-exactly."""
        mesh = jax.make_mesh((2,), ("data",))
        pred = Predictor.from_model(_bin_model(), batch_size=4,
                                    use_pallas=False, dtype=None, mesh=mesh)
        path = str(tmp_path / "dp_bundle")
        export_serving(pred, path, input_shape=(8, 8, 3))
        server = load_serving(path)
        assert server.mesh is not None
        assert dict(zip(server.mesh.axis_names,
                        server.mesh.devices.shape)) == {"data": 2}
        x = _rand(jax.random.key(0), (6, 8, 8, 3))  # pads to 8, two execs
        np.testing.assert_array_equal(np.asarray(server(x)),
                                      np.asarray(pred(x)))

    def test_mesh_tp_round_trip(self, tmp_path):
        """The north-star topology: tensor-parallel serving (per-layer
        out-channel shards + in-forward all-gathers) frozen into a bundle
        and served back on a fresh dp2xtp4 mesh, bit-exactly."""
        from bnn_tpu.parallel import make_mesh

        mesh = make_mesh(data=2, model=4)
        pred = Predictor.from_model(
            _bin_model(), batch_size=4, use_pallas=False, fuse=False,
            space_to_depth=False, dtype=None, mesh=mesh,
            tensor_parallel=True)
        assert pred.tp_layers, "no layers sharded — test is vacuous"
        path = str(tmp_path / "tp_bundle")
        export_serving(pred, path, input_shape=(8, 8, 3))
        meta = json.load(open(os.path.join(path, "meta.json")))
        assert meta["nr_devices"] == 8
        # sharded leaves carry their PartitionSpecs into the manifest
        assert any(spec and "model" in str(spec)
                   for spec in meta["mesh"]["leaf_specs"])
        server = load_serving(path)
        x = _rand(jax.random.key(1), (4, 8, 8, 3))
        np.testing.assert_array_equal(np.asarray(server(x)),
                                      np.asarray(pred(x)))

    def test_mesh_export_rejects_multi_platform(self, tmp_path):
        mesh = jax.make_mesh((2,), ("data",))
        pred = Predictor.from_model(_bin_model(), batch_size=4,
                                    use_pallas=False, dtype=None, mesh=mesh)
        with pytest.raises(ValueError, match="mutually exclusive"):
            export_serving(pred, str(tmp_path / "b"), input_shape=(8, 8, 3),
                           platforms=("cpu", "tpu"))

    def test_loader_validates(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_serving(str(tmp_path / "nope"))
        pred = self._predictor()
        path = str(tmp_path / "bundle")
        export_serving(pred, path, input_shape=(8, 8, 3))
        # wrong input shape is a loud error, not silent recompile
        server = load_serving(path)
        with pytest.raises(ValueError, match="input shape"):
            server(_rand(jax.random.key(0), (2, 9, 9, 3)))
        # format-version gate
        meta = json.load(open(os.path.join(path, "meta.json")))
        meta["format_version"] = 99
        json.dump(meta, open(os.path.join(path, "meta.json"), "w"))
        with pytest.raises(ValueError, match="format"):
            load_serving(path)
