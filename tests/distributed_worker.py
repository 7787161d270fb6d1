"""Worker for the real two-process distributed test (run via subprocess).

Proves the DCN rendezvous path — ``jax.distributed.initialize`` against a
live coordinator, cross-process collectives (gloo CPU backend), a global
mesh spanning both processes, one DP train step, and disjoint
DistributedSampler-equivalent host shards — the capability the reference
gets from ``init_process_group``/DDP/DistributedSampler
(reference examples/imagenet.py:139-147, 285-292).

Usage: distributed_worker.py <coordinator addr:port> <process_id> <nprocs>
"""
import os
import sys

coordinator, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=nprocs, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from flax import nnx  # noqa: E402

from bnn_tpu import BConfig, nn, prepare_binary_model  # noqa: E402
from bnn_tpu.data import NativeDataLoader  # noqa: E402
from bnn_tpu.ops import (  # noqa: E402
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)
from bnn_tpu.parallel import make_mesh, make_train_step  # noqa: E402

assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 2 * nprocs, jax.device_count()
assert jax.local_device_count() == 2

mesh = make_mesh()  # (data=4, model=1) over both processes

rngs = nnx.Rngs(0)
model = nn.Sequential(
    nn.Conv2d(3, 16, 3, padding=1, rngs=rngs),
    nn.BatchNorm2d(16, rngs=rngs),
    nn.PReLU(16, rngs=rngs),
    nn.AdaptiveAvgPool2d(1),
    nn.Flatten(),
    nn.Linear(16, 4, rngs=rngs),
)
model = prepare_binary_model(
    model,
    bconfig=BConfig(BasicInputBinarizer, BasicScaleBinarizer,
                    XNORWeightBinarizer),
    ignore_layers_name=["_first_", "_last_"],
)
model.train()
optimizer = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

# identical global batch on every host, assembled from host-local shards
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

global_batch = 8
x_all = np.random.RandomState(0).randn(global_batch, 8, 8, 3).astype(np.float32)
y_all = np.random.RandomState(1).randint(0, 4, global_batch).astype(np.int32)
local = slice(pid * global_batch // nprocs, (pid + 1) * global_batch // nprocs)
sharding = NamedSharding(mesh, P("data"))
x = jax.make_array_from_process_local_data(sharding, x_all[local],
                                           x_all.shape)
y = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), y_all[local], y_all.shape)

step = make_train_step()
metrics = step(model, optimizer, x, y)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss

# ZeRO-1 + multi-host checkpoint round-trip (VERDICT r3 next #4): shard the
# optimizer moments over the CROSS-PROCESS data axis, save (collective
# gather + host-0 write), restore into a fresh optimizer on every host,
# re-shard, and verify the next step matches an uninterrupted run
import tempfile  # noqa: E402

from bnn_tpu.parallel import shard_optimizer_zero1  # noqa: E402
from bnn_tpu.utils import (load_checkpoint, restore_into,  # noqa: E402
                           restore_optimizer, save_checkpoint)

shard_optimizer_zero1(optimizer, mesh, min_size=16)
sharded_leaves = [
    v for p, v in jax.tree_util.tree_leaves_with_path(nnx.state(optimizer))
    if "opt_state" in jax.tree_util.keystr(p)
    and hasattr(v, "is_fully_addressable") and not v.is_fully_addressable]
assert sharded_leaves, "no cross-process-sharded optimizer leaves"

ckpt_dir = os.path.join(tempfile.gettempdir(),
                        f"dist_ckpt_{coordinator.split(':')[1]}")
# train a fresh pair two steps, checkpoint it (sharded moments), restore
# into a differently-seeded pair, and compare the following step against
# the uninterrupted original
model2 = prepare_binary_model(
    nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1, rngs=nnx.Rngs(0)),
        nn.BatchNorm2d(16, rngs=nnx.Rngs(0)),
        nn.PReLU(16, rngs=nnx.Rngs(0)),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(16, 4, rngs=nnx.Rngs(0)),
    ),
    bconfig=BConfig(BasicInputBinarizer, BasicScaleBinarizer,
                    XNORWeightBinarizer),
    ignore_layers_name=["_first_", "_last_"],
)
model2.train()
opt2 = nnx.Optimizer(model2, optax.adam(1e-3), wrt=nnx.Param)
shard_optimizer_zero1(opt2, mesh, min_size=16)
step(model2, opt2, x, y)
step(model2, opt2, x, y)
save_checkpoint(ckpt_dir, model2, opt_state=opt2)  # collective on all hosts

model3 = prepare_binary_model(
    nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1, rngs=nnx.Rngs(7)),
        nn.BatchNorm2d(16, rngs=nnx.Rngs(7)),
        nn.PReLU(16, rngs=nnx.Rngs(7)),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(16, 4, rngs=nnx.Rngs(7)),
    ),
    bconfig=BConfig(BasicInputBinarizer, BasicScaleBinarizer,
                    XNORWeightBinarizer),
    ignore_layers_name=["_first_", "_last_"],
)
model3.train()
opt3 = nnx.Optimizer(model3, optax.adam(1e-3), wrt=nnx.Param)
import jax.experimental.multihost_utils as mhu  # noqa: E402

mhu.sync_global_devices("ckpt_written")
payload = load_checkpoint(ckpt_dir)
restore_into(model3, payload)
assert restore_optimizer(opt3, payload) == []
shard_optimizer_zero1(opt3, mesh, min_size=16)
resumed = float(step(model3, opt3, x, y)["loss"])
uninterrupted = float(step(model2, opt2, x, y)["loss"])
assert abs(resumed - uninterrupted) < 1e-5, (resumed, uninterrupted)
zero1_ok = 1

# Cross-process PIPELINE checkpoint (round-4 deadlock fix): the flat
# (n_stages, L) buffer shards P(pipe) over a pipe axis spanning both
# processes. The trainer's checkpoint path must (a) gather the
# non-addressable flat buffer on EVERY host before slicing per-stage rows
# and (b) enter the collective save on EVERY host — a host-0 gate
# deadlocks here (examples/imagenet.py checkpoint_now).
from bnn_tpu.parallel import HeteroPipeline, make_pipeline_mesh  # noqa: E402
from bnn_tpu.utils import gather_replicated  # noqa: E402

pstages = [nn.Sequential(nn.Linear(8, 8, rngs=nnx.Rngs(i)))
           for i in range(4)]
pmesh = make_pipeline_mesh(pipe=4)  # 4 devices over 2 processes
pipe = HeteroPipeline(pstages, x_shape=(8,), mesh=pmesh)
flat = pipe.flat_params
assert not flat.is_fully_addressable, "pipe axis must span processes"
flat_full = jnp.asarray(gather_replicated(flat))
for st_mod, st in zip(pstages, pipe.unflatten_stage_states(flat_full)):
    nnx.update(st_mod, st)
pipe_dir = os.path.join(tempfile.gettempdir(),
                        f"dist_pipe_{coordinator.split(':')[1]}")
save_checkpoint(pipe_dir, nn.Sequential(*pstages),
                opt_state={"pipeline_flat": [np.asarray(flat_full)]})
mhu.sync_global_devices("pipe_ckpt_written")
ppayload = load_checkpoint(pipe_dir)
saved_flat = ppayload["opt_state"]["pipeline_flat"]
if isinstance(saved_flat, dict):  # orbax may stringify list indices
    saved_flat = [saved_flat[k] for k in sorted(saved_flat, key=int)]
np.testing.assert_array_equal(np.asarray(saved_flat[0]),
                              np.asarray(flat_full))
pipe_ckpt_ok = 1

# DistributedSampler-equivalent host shards must be disjoint across
# processes and cover the dataset
loader = NativeDataLoader(
    np.zeros((32, 8, 8, 3), np.uint8), np.zeros((32,), np.int64),
    batch_size=4, seed=0, process_index=pid, process_count=nprocs)
loader.set_epoch(3)
idx = sorted(int(i) for i in loader._epoch_indices())

print(f"RESULT pid={pid} loss={loss:.6f} shard={','.join(map(str, idx))} "
      f"zero1_ckpt={zero1_ok} pipe_ckpt={pipe_ckpt_ok}", flush=True)
