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


def make_train_step(loss_fn: Callable = _default_loss,
                    aux_weight: float = 0.0, remat: bool = False) -> Callable:
    """Build a jitted train step.

    Returns ``step(model, optimizer, x, y) -> metrics`` (metrics: ``loss``,
    ``top1``). ``model`` is mutated in place (params, BatchNorm stats, RNG
    streams); ``optimizer`` is an ``nnx.Optimizer``. Auxiliary-head models
    (BATS) add ``aux_weight * loss(aux_logits)`` like the reference trainer.

    ``remat=True`` rematerializes the forward under ``nnx.remat``
    (``jax.checkpoint``): activations are recomputed in the backward pass
    instead of stored, trading ~30% more FLOPs for O(sqrt) activation
    memory — the standard lever for fitting larger batches in HBM.
    """

    @nnx.jit
    def step(model, optimizer, x, y):
        def _loss(model):
            if remat:
                out = nnx.remat(lambda m, v: m(v))(model, x)
            else:
                out = model(x)
            logits = _logits_of(out)
            loss = loss_fn(logits, y)
            if aux_weight and isinstance(out, tuple) and out[1] is not None:
                loss = loss + aux_weight * loss_fn(out[1], y)
            return loss, logits

        (loss, logits), grads = nnx.value_and_grad(_loss, has_aux=True)(model)
        optimizer.update(model, grads)
        top1 = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return {"loss": loss, "top1": top1}

    return step


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
