"""Jitted, mesh-aware train/eval steps.

NNX-transform formulation of the training loop body. One compiled step
serves single-chip, data-parallel, and tensor-parallel execution: placement
comes entirely from the shardings of the model/optimizer state arrays
(committed via :func:`bnn_tpu.parallel.mesh.shard_model` /
``shard_batch``), and XLA's GSPMD partitioner inserts the gradient psum that
DDP does by hook in the reference (examples/imagenet.py:377).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import nnx

__all__ = ["make_train_step", "make_eval_step"]


def _default_loss(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def _logits_of(out):
    # BATS networks return (logits, aux); plain models return logits
    return out[0] if isinstance(out, tuple) else out


from ..utils.precision import cast_float_tree as _cast_float_tree


def _mixed_forward(model, x, compute_dtype):
    """Run ``model(x)`` with params cast to ``compute_dtype``.

    Master params stay at their stored precision (f32) on ``model``; the
    forward/backward math runs at ``compute_dtype``. The cast sits inside the
    differentiated function, so gradients flow through the
    ``convert_element_type`` back to the f32 masters — the standard
    mixed-precision recipe. bf16 shares f32's exponent range, so no loss
    scaling is needed (unlike fp16).

    Normalization layers get ``dtype=compute_dtype`` on the compute copy so
    their outputs stay low-precision, while their running statistics remain
    f32 end to end (flax computes batch stats in >=f32 internally; the EMA
    is accumulated and written back to the master at f32).
    """
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    m = nnx.merge(graphdef, _cast_float_tree(params, compute_dtype), rest)
    for _, mod in nnx.iter_modules(m):
        # flax norm/linear convention: modules with a promote_dtype carry a
        # `dtype` knob meaning "compute/result dtype" (None = promote inputs)
        if getattr(mod, "promote_dtype", None) is not None \
                and getattr(mod, "dtype", False) is None:
            mod.dtype = compute_dtype
    out = m(x.astype(compute_dtype))
    nnx.update(model, nnx.state(m, nnx.Not(nnx.Param)))
    return out


def make_train_step(loss_fn: Callable = _default_loss,
                    aux_weight: float = 0.0, remat: bool = False,
                    compute_dtype=None, accum_steps: int = 1) -> Callable:
    """Build a jitted train step.

    Returns ``step(model, optimizer, x, y) -> metrics`` (metrics: ``loss``,
    ``top1``). ``model`` is mutated in place (params, BatchNorm stats, RNG
    streams); ``optimizer`` is an ``nnx.Optimizer``. Auxiliary-head models
    (BATS) add ``aux_weight * loss(aux_logits)`` like the reference trainer.

    ``remat=True`` rematerializes the forward under ``nnx.remat``
    (``jax.checkpoint``): activations are recomputed in the backward pass
    instead of stored, trading ~30% more FLOPs for O(sqrt) activation
    memory — the standard lever for fitting larger batches in HBM.

    ``compute_dtype=jnp.bfloat16`` enables mixed-precision QAT: forward and
    backward run in bf16 (MXU bf16 rate, half the activation HBM traffic)
    while master weights, gradients as applied, and optimizer state stay
    f32 (see :func:`_mixed_forward`). The loss itself is always computed in
    f32. The reference has no mixed-precision path (plain fp32 throughout,
    examples/imagenet.py:192-204) — this is a TPU-native addition.

    ``accum_steps=N`` enables gradient accumulation (also absent from the
    reference, SURVEY.md §2.3): the batch is split into N equal microbatches,
    per-microbatch gradients are averaged, and the optimizer applies ONE
    update — the effective batch is the full ``x`` while peak activation
    memory is that of ``batch/N``. For mean-reduced losses on BN-free models
    this is numerically the full-batch gradient; with BatchNorm the stats are
    per-microbatch (standard accumulation semantics).
    """

    def _loss(model, x, y):
        if compute_dtype is not None:
            fwd = lambda m, v: _mixed_forward(m, v, compute_dtype)  # noqa: E731
        else:
            fwd = lambda m, v: m(v)  # noqa: E731
        if remat:
            out = nnx.remat(fwd)(model, x)
        else:
            out = fwd(model, x)
        logits = _logits_of(out)
        loss = loss_fn(_as_f32(logits), y)
        if aux_weight and isinstance(out, tuple) and out[1] is not None:
            loss = loss + aux_weight * loss_fn(_as_f32(out[1]), y)
        return loss, logits

    @nnx.jit
    def step(model, optimizer, x, y):
        (loss, logits), grads = nnx.value_and_grad(_loss, has_aux=True)(
            model, x, y)
        optimizer.update(model, grads)
        top1 = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return {"loss": loss, "top1": top1}

    @nnx.jit
    def accum_step(model, optimizer, x, y):
        assert x.shape[0] % accum_steps == 0, (x.shape, accum_steps)
        xs = x.reshape(accum_steps, -1, *x.shape[1:])
        ys = y.reshape(accum_steps, -1, *y.shape[1:])
        total_grads = None
        loss_sum = jnp.float32(0)
        top1_sum = jnp.float32(0)
        # static unroll: accum_steps is a Python int, each microbatch shares
        # the same compiled forward/backward body via XLA CSE
        for i in range(accum_steps):
            (loss, logits), grads = nnx.value_and_grad(
                _loss, has_aux=True)(model, xs[i], ys[i])
            total_grads = grads if total_grads is None else jax.tree.map(
                jnp.add, total_grads, grads)
            loss_sum = loss_sum + loss
            top1_sum = top1_sum + jnp.mean(
                (jnp.argmax(logits, -1) == ys[i]).astype(jnp.float32))
        grads = jax.tree.map(lambda g: g / accum_steps, total_grads)
        optimizer.update(model, grads)
        return {"loss": loss_sum / accum_steps, "top1": top1_sum / accum_steps}

    return step if accum_steps == 1 else accum_step


def _as_f32(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def make_eval_step() -> Callable:
    """Build a jitted eval step: ``(model, x, y) -> metrics`` with summed
    ``loss``/``top1``/``top5`` hits and ``count`` for exact epoch
    aggregation."""

    @nnx.jit
    def step(model, x, y):
        logits = _logits_of(model(x))
        loss = _default_loss(logits, y)
        top1 = jnp.sum((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        k = min(5, logits.shape[-1])
        _, topk_idx = jax.lax.top_k(logits, k)
        top5 = jnp.sum(jnp.any(topk_idx == y[:, None], axis=-1)
                       .astype(jnp.float32))
        return {"loss": loss * y.shape[0], "top1": top1, "top5": top5,
                "count": jnp.asarray(y.shape[0], jnp.float32)}

    return step
