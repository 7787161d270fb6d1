"""ImageNet-style distributed recipe-driven QAT trainer.

TPU-native counterpart of the reference's DDP trainer
(reference: examples/imagenet.py). The reference's process topology
(``mp.spawn`` + ``init_process_group`` + DDP + DistributedSampler,
imagenet.py:120-187, 285-292) collapses on TPU to:

- ``jax.distributed.initialize()`` for multi-host process groups,
- one ``(data, model)`` Mesh over all devices,
- ``shard_batch`` placing each host's local batch on its devices (the
  DistributedSampler equivalent is per-host slicing of the dataset),
- GSPMD inserting the gradient psum DDP does by hook.

CLI flags mirror the reference's (arch/recipe/step/optimizer/scheduler/
resume, imagenet.py:33-88). Data: a directory of ``{split}_xN.npy`` shards
or synthetic stand-in (no dataset ships in this container).

Usage (single host):
    python examples/imagenet.py --recipe examples/recipes/imagenet-baseline.yaml \
        --step 0 --epochs 90 --batch-size 256 --synthetic

Multi-host: run the same command on every host with
    --coordinator <host0-ip:port> --num-hosts N --host-id K
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from bnn_tpu import BinaryChef, models, nn
from bnn_tpu.data import NativeDataLoader, prefetch_to_device
from bnn_tpu.engine import RecipeError
from bnn_tpu.models.layers import PreBasicBlock
from bnn_tpu.parallel import make_eval_step, make_mesh, make_train_step, \
    shard_batch, shard_model
from bnn_tpu.utils import (
    AverageMeter,
    ProgressMeter,
    load_checkpoint,
    restore_into,
    restore_optimizer,
    save_checkpoint,
)


def parse_args():
    p = argparse.ArgumentParser(description="bnn_tpu ImageNet QAT training")
    p.add_argument("--data", default=None, help="dataset directory")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("-a", "--arch", default="resnet18",
                   choices=["resnet18", "resnet34", "resnet50"])
    p.add_argument("--stem-type", default="basic", choices=["basic", "dabnn"])
    p.add_argument("--recipe", default="examples/recipes/imagenet-baseline.yaml")
    p.add_argument("--step", type=int, default=0,
                   help="recipe step to train (reference imagenet.py:154-156)")
    p.add_argument("--epochs", type=int, default=None,
                   help="epoch budget (default: the recipe step's 'epochs' "
                        "if declared, else 90)")
    p.add_argument("-b", "--batch-size", type=int, default=256,
                   help="global batch size across all devices")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adam", "sgd"])
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--scheduler", default="cosine",
                   choices=["cosine", "multistep"])
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--milestones", type=int, nargs="*", default=[30, 60, 80])
    p.add_argument("--resume", default=None)
    p.add_argument("-e", "--evaluate", action="store_true",
                   help="evaluate the model on the validation set and exit "
                        "(reference imagenet.py:63-64, 299-300)")
    p.add_argument("--out", default="./checkpoint/imagenet")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print-freq", type=int, default=50)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="override synthetic epoch length")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="size of the tensor-parallel mesh axis")
    p.add_argument("--pipeline", type=int, default=1,
                   help="pipeline-parallel stages (GPipe over a 'pipe' "
                        "mesh axis via HeteroPipeline; 1 = off). "
                        "Composes with data parallelism on the remaining "
                        "devices; incompatible with --model-parallel/"
                        "--zero1/--accum-steps in this trainer")
    p.add_argument("--microbatches", type=int, default=4,
                   help="GPipe microbatches per step (with --pipeline)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient-accumulation microbatches per step")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer moments over the data axis (ZeRO-1)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision QAT: bf16 compute, f32 masters")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations in the backward pass")
    # multi-host rendezvous (replaces --dist-url/--dist-backend,
    # reference imagenet.py:69-72)
    p.add_argument("--coordinator", default=None, help="host0 ip:port")
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--host-id", type=int, default=0)
    return p.parse_args()


def make_scheduler(args, steps_per_epoch):
    warmup_steps = args.warmup_epochs * steps_per_epoch
    warmup = optax.linear_schedule(0.0, args.lr, warmup_steps)
    if args.scheduler == "cosine":
        main = optax.cosine_decay_schedule(
            args.lr, max(1, (args.epochs - args.warmup_epochs) * steps_per_epoch))
    else:
        # milestones are ABSOLUTE epochs; join_schedules feeds `main`
        # warmup-relative steps, so shift the boundaries left (unshifted,
        # every drop fired warmup_epochs late — same fix as engine.py)
        main = optax.piecewise_constant_schedule(
            args.lr,
            {m * steps_per_epoch - warmup_steps: 0.1
             for m in args.milestones
             if m * steps_per_epoch > warmup_steps},
        )
    return optax.join_schedules([warmup, main], [warmup_steps])


def make_optimizer(args, schedule):
    # weight decay zeroed for binarized steps > 0, like the reference
    # (imagenet.py:192-204): decaying binary weights fights the binarizer
    wd = args.weight_decay if args.step == 0 else 0.0
    if args.optimizer == "adamw":
        return optax.adamw(schedule, weight_decay=wd)
    if args.optimizer == "adam":
        return optax.adam(schedule)
    return optax.sgd(schedule, momentum=0.9)


def synthetic_batches(batch, steps, seed=0, size=224):
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        x = rng.normal(0, 1, (batch, size, size, 3)).astype(np.float32)
        y = rng.integers(0, 1000, batch).astype(np.int32)
        yield x, y


def npy_batches(data_dir, split, batch, shuffle, seed=0):
    xs = np.load(os.path.join(data_dir, f"{split}_x.npy"), mmap_mode="r")
    ys = np.load(os.path.join(data_dir, f"{split}_y.npy"))
    idx = np.arange(len(xs))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    for b in range(0, len(idx) - batch + 1, batch):
        sel = np.sort(idx[b:b + batch])
        yield np.asarray(xs[sel], np.float32), ys[sel].astype(np.int32)


def resnet_pipeline_stages(model, n: int):
    """Split a (binarized) ResNet into ``n`` contiguous pipeline stages.

    Natural units: stem, layer1..4, head. The stage Sequentials WRAP the
    model's own submodules (shared parameters), so updating the stages
    updates the model."""
    units = [nn.Sequential(model.conv1, model.bn1, nn.ReLU(), model.maxpool)
             if model.stem_type == "basic" else nn.Sequential(model.conv1)]
    for i in (1, 2, 3, 4):
        units.append(getattr(model, f"layer{i}"))
    units.append(nn.Sequential(model.avgpool, nn.Flatten(), model.fc))
    assert 1 < n <= len(units), (n, len(units))
    groups = np.array_split(np.arange(len(units)), n)
    return [nn.Sequential(*[units[i] for i in g]) for g in groups]


def train_pipelined(args, model, chef, is_host0):
    """GPipe pipeline-parallel training over a (pipe, data) mesh.

    The reference has no pipeline parallelism of any kind (SURVEY §2.3);
    this path trains on HeteroPipeline's flat parameter buffer directly
    (elementwise optimizers are exactly the per-leaf update) and carries
    BN running stats through the schedule (return_state=True)."""
    import optax
    from bnn_tpu.parallel import HeteroPipeline, make_pipeline_mesh

    assert not args.data, \
        "--pipeline currently trains on synthetic data only (use the " \
        "DP/TP path for dataset runs)"
    n_dev = jax.device_count()
    assert n_dev % args.pipeline == 0, (n_dev, args.pipeline)
    mesh = make_pipeline_mesh(pipe=args.pipeline,
                              data=n_dev // args.pipeline)
    if is_host0:
        print(f"==> pipeline mesh {dict(mesh.shape)} over {n_dev} devices")

    start_epoch, payload = 0, None
    if args.resume:
        # model state restores BEFORE the pipeline flattens it, so the flat
        # buffer starts from the checkpointed weights/stats; the flat
        # optimizer state restores below once its structure exists
        # (reference resumes any config, imagenet.py:218-256)
        payload = load_checkpoint(args.resume)
        skipped = restore_into(model, payload, strict=False)
        if skipped and is_host0:
            print(f"==> pipeline resume skipped {len(skipped)} "
                  "mismatched entries")
        start_epoch = int(payload.get("metadata", {}).get("epoch", 0))

    model.train()
    stages = resnet_pipeline_stages(model, args.pipeline)
    pipe = HeteroPipeline(
        stages, x_shape=(args.image_size, args.image_size, 3), mesh=mesh)

    steps_per_epoch = args.steps_per_epoch or 256
    if args.epochs is None:
        args.epochs = chef.epochs(args.step) or 90
    try:
        tx = chef.make_tx(args.step, steps_per_epoch)
    except RecipeError:
        tx = make_optimizer(args, make_scheduler(args, steps_per_epoch))

    flat = pipe.flat_params
    opt_state = tx.init(flat)
    if payload is not None and payload.get("opt_state") is not None:
        # the pipeline optimizer runs over the flat (n_stages, Lmax)
        # buffer; its optax state is checkpointed as a leaf list (orbax
        # round-trips the arrays, the treedef is reconstructable from
        # tx.init). Restoring the counts resumes the schedule position.
        leaves, treedef = jax.tree.flatten(opt_state)
        saved = payload["opt_state"].get("pipeline_flat")
        if isinstance(saved, dict):  # orbax may stringify list indices
            saved = [saved[k] for k in sorted(saved, key=int)]
        if saved is not None and len(saved) == len(leaves) and all(
                np.shape(s) == np.shape(l) for s, l in zip(saved, leaves)):
            # re-commit each restored leaf to the sharding its fresh
            # tx.init counterpart carries (P(pipe, None) moments): a bare
            # jnp.asarray would enter the jitted step replicated, and
            # every device would hold ALL stages' moment buffers. Scalars
            # (optax counts) stay uncommitted — their fresh counterparts
            # carry a single-device placement that jit is free to move,
            # and committing them there conflicts with the mesh.
            from jax.sharding import NamedSharding

            def _restore_leaf(s, l):
                s = jnp.asarray(s)
                if isinstance(getattr(l, "sharding", None), NamedSharding):
                    return jax.device_put(s, l.sharding)
                return s

            opt_state = jax.tree.unflatten(
                treedef, [_restore_leaf(s, l)
                          for s, l in zip(saved, leaves)])
            if is_host0:
                print("==> pipeline resume restored optimizer state")
        elif is_host0:
            print("==> checkpoint optimizer state incompatible with this "
                  "pipeline config; moments reset")
    assert args.batch_size % args.microbatches == 0

    @jax.jit
    def step(flat, opt_state, x, y):
        def loss_fn(f):
            logits, new_flat = pipe.apply(
                f, x, n_microbatches=args.microbatches, return_state=True)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, (new_flat, logits)

        (loss, (new_flat, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(flat)
        # the flat buffer mixes Params with BatchNorm running stats; mask
        # the stats lanes out of the params the optimizer sees so adamw's
        # decoupled weight decay never shrinks running mean/var (adam/sgd
        # read params only through add_decayed_weights, so this is exact)
        upd, opt_state = tx.update(grads, opt_state,
                                   new_flat * pipe.param_mask)
        top1 = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return optax.apply_updates(new_flat, upd), opt_state, loss, top1

    def checkpoint_now(epoch_done: int):
        # write trained params + stats back into the shared model modules;
        # the model checkpoint stays format-compatible with the sequential
        # trainer (resume/eval works either way), the flat optimizer state
        # rides along for pipeline-to-pipeline resume
        # gather the pipe-sharded flat buffer to every host first:
        # unflatten_stage_states slices per-stage rows, and on a
        # multi-host pipe axis the remote rows are not addressable
        from bnn_tpu.utils import gather_replicated

        flat_full = jnp.asarray(gather_replicated(flat))
        for st_mod, st in zip(stages, pipe.unflatten_stage_states(flat_full)):
            nnx.update(st_mod, st)
        # EVERY host calls save_checkpoint: it is a collective (the flat
        # params/moments can be pipe-sharded across processes, and both
        # the gather and orbax's save protocol synchronize all hosts) —
        # a host-0 gate would deadlock multi-host pipeline runs
        save_checkpoint(
            args.out, model,
            opt_state={"pipeline_flat": jax.tree.leaves(opt_state)},
            metadata={"epoch": epoch_done, "arch": args.arch,
                      "step": args.step, "pipeline": args.pipeline})

    for epoch in range(start_epoch, args.epochs):
        losses = AverageMeter("Loss", ":.4e")
        top1m = AverageMeter("Acc@1", ":6.2f")
        it = synthetic_batches(args.batch_size, steps_per_epoch,
                               seed=args.seed + epoch, size=args.image_size)
        for i, (xb, yb) in enumerate(it):
            flat, opt_state, loss, top1 = step(
                flat, opt_state, jnp.asarray(xb), jnp.asarray(yb))
            losses.update(float(loss), len(yb))
            top1m.update(float(top1) * 100.0, len(yb))
            if is_host0 and i % args.print_freq == 0:
                print(f"PipeEpoch[{epoch}][{i}/{steps_per_epoch}] "
                      f"{losses} {top1m}")
        checkpoint_now(epoch + 1)
        if is_host0:
            print(f" * PipeEpoch {epoch}: Loss {losses.avg:.4f} "
                  f"Acc@1 {top1m.avg:.3f}")
    if is_host0:
        print(f"==> pipelined training done; checkpoint at {args.out}")


def validate(args, model, eval_step, mesh, val_loader):
    """One pass over the validation split; returns (acc1, acc5) in percent
    (the reference's ``validate()``, examples/imagenet.py:387-428)."""
    model.eval()
    tot = {"loss": 0.0, "top1": 0.0, "top5": 0.0, "count": 0.0}
    if val_loader is not None:
        val_it = prefetch_to_device(iter(val_loader), mesh=mesh,
                                    host_shards=True)
    elif args.data and not args.synthetic:
        val_it = npy_batches(args.data, "val", args.batch_size, False)
    else:
        val_it = synthetic_batches(args.batch_size, 8, seed=999,
                                   size=args.image_size)
    for xb, yb in val_it:
        if val_loader is None:
            xb, yb = shard_batch((jnp.asarray(xb), jnp.asarray(yb)), mesh)
        m = eval_step(model, xb, yb)
        for k in tot:
            tot[k] += float(m[k])
    return (100.0 * tot["top1"] / tot["count"],
            100.0 * tot["top5"] / tot["count"])


def main():
    args = parse_args()

    if args.num_hosts > 1:
        # multi-host process group over DCN (replaces init_process_group,
        # reference imagenet.py:139-147)
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )
    is_host0 = jax.process_index() == 0

    model_fn = getattr(models, args.arch)
    model = model_fn(block_type=PreBasicBlock, activation=nn.PReLU,
                     stem_type=args.stem_type, rngs=nnx.Rngs(args.seed))
    chef = BinaryChef(args.recipe)
    model = chef.run_step(model, args.step)
    if is_host0:
        print(f"==> {args.arch} binarized with step {args.step} of {args.recipe}")

    if args.pipeline > 1:
        # pipeline-parallel training path (GPipe over a 'pipe' axis)
        assert args.model_parallel == 1 and not args.zero1 \
            and args.accum_steps == 1, \
            "--pipeline composes with data parallelism only in this trainer"
        assert not args.evaluate, \
            "eval-only runs use the sequential path (pipeline checkpoints " \
            "are model-format compatible: --evaluate --resume <ckpt> " \
            "without --pipeline)"
        return train_pipelined(args, model, chef, is_host0)

    mesh = make_mesh(model=args.model_parallel)
    if is_host0:
        print(f"==> mesh {dict(mesh.shape)} over {jax.device_count()} devices")

    steps_per_epoch = args.steps_per_epoch or 256
    train_loader = val_loader = None
    if args.data and not args.synthetic:
        xs = np.load(os.path.join(args.data, "train_x.npy"), mmap_mode="r")
        ys = np.load(os.path.join(args.data, "train_y.npy"))
        steps_per_epoch = len(ys) // args.batch_size
        if xs.dtype == np.uint8:
            # native multi-core loader with torchvision-style train
            # transforms; each host takes a disjoint shard per epoch and
            # assembles GLOBAL_BATCH / num_hosts rows (-b is the global
            # batch; the per-host batches combine into one global array
            # via shard_host_batch in the prefetch)
            n_hosts = jax.process_count()
            assert args.batch_size % n_hosts == 0, (args.batch_size, n_hosts)
            local_bs = args.batch_size // n_hosts
            train_loader = NativeDataLoader(
                xs, ys, local_bs,
                mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                pad=4, flip=True, seed=args.seed)
            steps_per_epoch = len(train_loader)
            vxs = np.load(os.path.join(args.data, "val_x.npy"), mmap_mode="r")
            vys = np.load(os.path.join(args.data, "val_y.npy"))
            val_loader = NativeDataLoader(
                vxs, vys, local_bs, shuffle=False,
                mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))

    # a recipe step may declare its own optimizer/lr_schedule/epochs (fully
    # declarative multi-stage runs); CLI flags are the fallback
    if args.epochs is None:
        args.epochs = chef.epochs(args.step) or 90
    try:
        tx = chef.make_tx(args.step, steps_per_epoch)
        if is_host0:
            print(f"==> optimizer from recipe step {args.step}")
    except RecipeError:
        tx = make_optimizer(args, make_scheduler(args, steps_per_epoch))
    optimizer = nnx.Optimizer(model, tx, wrt=nnx.Param)
    model.train()
    shard_model(model, mesh)
    shard_model(optimizer, mesh)
    if args.zero1:
        from bnn_tpu.parallel import shard_optimizer_zero1
        shard_optimizer_zero1(optimizer, mesh)

    train_step = make_train_step(
        accum_steps=args.accum_steps,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        remat=args.remat)
    eval_step = make_eval_step()

    start_epoch, best_acc1 = 0, 0.0
    if args.resume:
        payload = load_checkpoint(args.resume)
        skipped = restore_into(model, payload, strict=False)
        if skipped and is_host0:
            print(f"==> resume skipped {len(skipped)} mismatched entries")
        if payload.get("opt_state") is not None:
            # Adam moments + optax step counts; the counts carry the
            # schedule position, so the LR trajectory continues exactly
            # (reference resets LR then fast-forwards the scheduler,
            # imagenet.py:248-256 — with optax that is what a restored
            # count under the freshly built schedule computes)
            opt_skipped = restore_optimizer(optimizer, payload, strict=False)
            if opt_skipped and is_host0:
                print(f"==> resume skipped {len(opt_skipped)} optimizer entries")
        elif is_host0:
            print("==> checkpoint has no optimizer state; moments reset")
        meta = payload.get("metadata", {})
        start_epoch = int(meta.get("epoch", 0))
        best_acc1 = float(meta.get("best_acc1", 0.0))
        shard_model(model, mesh)
        shard_model(optimizer, mesh)
        if args.zero1:
            from bnn_tpu.parallel import shard_optimizer_zero1
            shard_optimizer_zero1(optimizer, mesh)

    if args.evaluate:
        # eval-only mode: one validation pass, no training
        # (reference imagenet.py:299-300)
        acc1, acc5 = validate(args, model, eval_step, mesh, val_loader)
        if is_host0:
            print(f" * Evaluate: Acc@1 {acc1:.3f} Acc@5 {acc5:.3f}")
        return acc1

    for epoch in range(start_epoch, args.epochs):
        model.train()
        losses = AverageMeter("Loss", ":.4e")
        top1 = AverageMeter("Acc@1", ":6.2f")
        batch_time = AverageMeter("Time", ":6.3f")
        progress = ProgressMeter(steps_per_epoch, [batch_time, losses, top1],
                                 prefix=f"Epoch[{epoch}]")
        if train_loader is not None:
            # native loader: per-epoch reshuffle + OpenMP batch assembly,
            # overlapped with device compute by the prefetcher
            train_loader.set_epoch(epoch)
            it = prefetch_to_device(iter(train_loader), mesh=mesh,
                                    host_shards=True)
        elif args.data and not args.synthetic:
            it = npy_batches(args.data, "train", args.batch_size, True,
                             seed=args.seed + epoch)
        else:
            it = synthetic_batches(args.batch_size, steps_per_epoch,
                                   seed=args.seed + epoch,
                                   size=args.image_size)
        end = time.time()
        for i, (xb, yb) in enumerate(it):
            if train_loader is None:
                xb, yb = shard_batch((jnp.asarray(xb), jnp.asarray(yb)), mesh)
            metrics = train_step(model, optimizer, xb, yb)
            losses.update(float(metrics["loss"]), len(yb))
            top1.update(float(metrics["top1"]) * 100.0, len(yb))
            batch_time.update(time.time() - end)
            end = time.time()
            if is_host0 and i % args.print_freq == 0:
                progress.display(i)

        # validate
        acc1, acc5 = validate(args, model, eval_step, mesh, val_loader)
        if is_host0:
            print(f" * Epoch {epoch}: Acc@1 {acc1:.3f} Acc@5 {acc5:.3f}")
        is_best = acc1 > best_acc1
        best_acc1 = max(acc1, best_acc1)
        # EVERY host calls save_checkpoint: with --zero1 on a multi-host
        # mesh the optimizer moments are sharded across processes, and
        # both the gather and orbax's save protocol are collectives (the
        # primary host does the actual writing)
        save_checkpoint(
            args.out, model, opt_state=optimizer,
            metadata={"epoch": epoch + 1, "arch": args.arch,
                      "best_acc1": best_acc1, "step": args.step},
            is_best=is_best)


if __name__ == "__main__":
    main()
