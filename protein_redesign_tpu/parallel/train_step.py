"""Jitted training machinery: optimizer, EMA, gradient accumulation.

Replaces the reference's Lightning trainer internals:
- Adam + linear warmup  <- `model.py:203-213`
- EMA after each optimizer step, with torch_ema's num_updates ramp
  <- `model.py:124,215-217`
- gradient accumulation <- Lightning ``accumulate_grad_batches``
  (README-prescribed 8/10), here a `lax.scan` over micro-batches inside
  ONE jitted step, so the whole accumulation loop is a single XLA program.
- DDP gradient all-reduce <- implicit: the batch is sharded over the
  'data' mesh axis and params are replicated/FSDP-sharded, so XLA inserts
  psum/reduce-scatter collectives over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import ModelConfig, TrainConfig
from ..models.prdiff import Batch, ProteinReDiffModel


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    ema_updates: jnp.ndarray  # torch_ema num_updates counter


def make_optimizer(cfg: ModelConfig, train_cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with the reference's LinearLR warmup (`model.py:203-213`):
    lr ramps from lr/warmup to lr over warmup-1 steps, then stays —
    unless ``TrainConfig.lr_decay_steps`` > 0, which appends a cosine
    decay to ``lr * lr_min_ratio`` (beyond reference; constant post-warmup
    LR makes small-data runs plateau-oscillate)."""
    warmup = optax.linear_schedule(
        init_value=cfg.learning_rate / cfg.warmup_steps,
        end_value=cfg.learning_rate,
        transition_steps=max(cfg.warmup_steps - 1, 1),
    )
    if train_cfg.lr_decay_steps > 0:
        decay = optax.cosine_decay_schedule(
            init_value=cfg.learning_rate,
            decay_steps=train_cfg.lr_decay_steps,
            alpha=train_cfg.lr_min_ratio,
        )
        schedule = optax.join_schedules(
            [warmup, decay], boundaries=[max(cfg.warmup_steps - 1, 1)]
        )
    else:
        schedule = warmup
    tx = [optax.scale_by_adam()]
    if train_cfg.gradient_clip_norm > 0:
        tx.insert(0, optax.clip_by_global_norm(train_cfg.gradient_clip_norm))
    tx.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*tx)


def make_train_state(
    model: ProteinReDiffModel,
    train_cfg: TrainConfig,
    key: jax.Array,
    sample_batch: Batch,
) -> TrainState:
    params = model.init_params(key, sample_batch)
    opt = make_optimizer(model.cfg, train_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_updates=jnp.zeros((), jnp.int32),
    )


def _ema_update(
    ema: Any, params: Any, decay: float, num_updates: jnp.ndarray
) -> Any:
    """torch_ema semantics (use_num_updates=True):
    decay_t = min(decay, (1+n)/(10+n))."""
    n = num_updates.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema, params
    )


def make_train_step(
    model: ProteinReDiffModel,
    train_cfg: TrainConfig,
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the (un-jitted) train step; jit with appropriate shardings at
    the call site. The input batch may carry a leading micro-batch axis
    [accum, B, ...] when accumulate_grad_batches > 1."""
    opt = make_optimizer(model.cfg, train_cfg)
    accum = train_cfg.accumulate_grad_batches

    def loss_fn(params: Any, batch: Batch, key: jax.Array) -> jnp.ndarray:
        loss, _ = model.loss(params, batch, key, training=True)
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(
        state: TrainState, batch: Batch, key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if accum > 1:
            keys = jax.random.split(key, accum)

            def micro(carry, inp):
                loss_acc, grad_acc = carry
                mb, k = inp
                loss, grads = grad_fn(state.params, mb, k)
                return (
                    loss_acc + loss,
                    jax.tree_util.tree_map(jnp.add, grad_acc, grads),
                ), None

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            (loss_sum, grad_sum), _ = jax.lax.scan(
                micro, (jnp.zeros(()), zero_grads), (batch, keys)
            )
            loss = loss_sum / accum
            grads = jax.tree_util.tree_map(lambda g: g / accum, grad_sum)
        else:
            loss, grads = grad_fn(state.params, batch, key)

        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = _ema_update(
            state.ema_params, params, model.cfg.ema_decay, state.ema_updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_updates=state.ema_updates + 1,
        )
        grad_norm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return train_step


def make_eval_step(
    model: ProteinReDiffModel,
    per_sample: bool = False,
) -> Callable[[TrainState, Batch, jax.Array], jnp.ndarray]:
    """Validation under EMA weights with a fresh random t
    (`model.py:226-247`). ``per_sample`` returns the [B] loss vector so
    the caller can exclude padding rows (the pipeline repeats samples to
    keep the final batch's shape static)."""

    def eval_step(state: TrainState, batch: Batch, key: jax.Array) -> jnp.ndarray:
        loss, _ = model.loss(
            state.ema_params, batch, key, training=True,
            reduction="none" if per_sample else "mean",
        )
        return loss

    return eval_step
