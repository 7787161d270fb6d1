"""Tensor-parallel serving (inference/tp.py): bitpacked weights sharded
over the mesh's model axis, per-layer all_gather under shard_map — the
north-star serving topology (BASELINE.json:5; VERDICT r2 weak #1 / next
#2). Runs on the virtual 8-device CPU mesh (conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import NamedSharding

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.inference import Predictor, deploy, tag_tensor_parallel
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.parallel import make_mesh

BCONFIG = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def _rand_no_zeros(key, shape):
    x = jax.random.normal(key, shape)
    return jnp.where(x == 0, 1e-3, x)


def _bin_model(seed=0):
    rngs = nnx.Rngs(seed)
    net = nn.Sequential(
        nn.Conv2d(3, 32, 3, padding=1, rngs=rngs),
        nn.BatchNorm2d(32, rngs=rngs),
        nn.PReLU(32, rngs=rngs),
        nn.Conv2d(32, 64, 3, stride=2, padding=1, rngs=rngs),
        nn.BatchNorm2d(64, rngs=rngs),
        nn.PReLU(64, rngs=rngs),
        nn.Conv2d(64, 64, 1, rngs=rngs),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(64, 16, rngs=rngs),
    )
    return prepare_binary_model(net, bconfig=BCONFIG,
                                ignore_layers_name=["_first_"])


COMMON = dict(batch_size=8, use_pallas=False, dtype=None, fuse=False,
              space_to_depth=False)


class TestTPServing:
    def test_tp_matches_replicated(self):
        mesh = make_mesh(data=2, model=4)
        x = np.asarray(_rand_no_zeros(jax.random.key(0), (8, 8, 8, 3)))

        ref = Predictor.from_model(_bin_model(), mesh=mesh, **COMMON)
        tp = Predictor.from_model(_bin_model(), mesh=mesh,
                                  tensor_parallel=True, **COMMON)
        assert tp.tp_layers, "no layers were tensor-parallel tagged"
        np.testing.assert_allclose(tp(x), ref(x), rtol=1e-5, atol=1e-5)

    def test_model_only_mesh_serves_replicated_batches(self):
        """Pure TP: a mesh with ONLY a model axis is legal — requests stay
        replicated (each chip holds a weight shard, not a batch shard)."""
        mesh = jax.make_mesh((8,), ("model",))
        x = np.asarray(_rand_no_zeros(jax.random.key(2), (8, 8, 8, 3)))
        ref = Predictor.from_model(_bin_model(), **COMMON)
        tp = Predictor.from_model(_bin_model(), mesh=mesh,
                                  tensor_parallel=True, **COMMON)
        assert tp.tp_layers
        np.testing.assert_allclose(tp(x), ref(x), rtol=1e-5, atol=1e-5)

    def test_packed_bytes_sharded_one_over_n(self):
        """Each chip must hold exactly 1/N of every tagged layer's packed
        weights (the whole point of TP serving)."""
        mesh = make_mesh(data=2, model=4)
        tp = Predictor.from_model(_bin_model(), mesh=mesh,
                                  tensor_parallel=True, **COMMON)

        def leaves_named(d, prefix=()):
            if isinstance(d, dict):
                for k, v in d.items():
                    yield from leaves_named(v, prefix + (str(k),))
            else:
                yield ".".join(prefix), d

        pure = nnx.to_pure_dict(tp._state)
        checked = 0
        for name, leaf in leaves_named(pure):
            if not (name.endswith(".w_packed") or name.endswith("w_packed.value")):
                continue
            mod_name = name.rsplit(".w_packed", 1)[0]
            if mod_name not in tp.tp_layers:
                continue
            assert isinstance(leaf.sharding, NamedSharding), name
            shard = leaf.addressable_shards[0].data
            assert shard.nbytes * 4 == leaf.nbytes, (
                f"{name}: shard {shard.nbytes}B x 4 != total {leaf.nbytes}B")
            checked += 1
        assert checked >= 2, "expected at least conv+linear sharded"

    @pytest.mark.slow
    def test_tp_resnet18_matches_replicated(self):
        """The flagship config: deployed binary ResNet-18 under 4-way TP."""
        from bnn_tpu import models

        def build():
            m = models.resnet18(num_classes=16, rngs=nnx.Rngs(0))
            return prepare_binary_model(
                m, bconfig=BCONFIG, ignore_layers_name=["_first_", "_last_"])

        mesh = make_mesh(data=2, model=4)
        x = np.asarray(_rand_no_zeros(jax.random.key(1), (8, 32, 32, 3)))
        ref = Predictor.from_model(build(), mesh=mesh, **COMMON)
        tp = Predictor.from_model(build(), mesh=mesh, tensor_parallel=True,
                                  **COMMON)
        # every binary trunk conv (64..512 out-ch) must be tagged
        assert len(tp.tp_layers) >= 16, tp.tp_layers
        np.testing.assert_allclose(tp(x), ref(x), rtol=1e-4, atol=1e-4)

    def test_untagged_when_channels_do_not_divide(self):
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            nn.Conv2d(3, 12, 3, padding=1, rngs=rngs),  # 12 % 8 != 0
            nn.AdaptiveAvgPool2d(1),
            nn.Flatten(),
            nn.Linear(12, 10, rngs=rngs),  # 10 % 8 != 0
        )
        net = prepare_binary_model(net, bconfig=BCONFIG)
        dep = deploy(net, use_pallas=False)
        mesh = make_mesh(data=1, model=8)
        assert tag_tensor_parallel(dep, mesh) == []
