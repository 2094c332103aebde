"""Sharded SFT training step.

The reference trains nothing (SURVEY.md §0 — "no training code"); this
module exists because a standalone framework serving its own policy models
must also be able to finetune them (and the multi-chip dry-run validates the
full dp/fsdp/ep/tp sharding stack end-to-end through grads + optimizer).

Layout: parameters sharded per the model's logical axes under TRAIN_RULES
(fsdp on embed dims, tp on heads/mlp, ep on experts); batch sharded over
(dp, fsdp). Loss is next-token cross-entropy with a padding mask; the step
is one jit with donated (params, opt_state) — XLA inserts all collectives
(psum for grads over dp, all-gathers for fsdp params, all-to-alls for ep).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..parallel.sharding import TRAIN_RULES, shard_pytree


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def cross_entropy_loss(logits: jax.Array, targets: jax.Array,
                       mask: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return -jnp.sum(ll * mask) / denom


def make_train_step(forward, cfg, optimizer):
    """Build the jitted train step: (state, tokens[B,T], loss_mask[B,T]) →
    (state, metrics). ``tokens`` are right-shifted internally."""

    def loss_fn(params, tokens, mask):
        inputs = tokens[:, :-1]
        targets = tokens[:, 1:]
        positions = jnp.broadcast_to(
            jnp.arange(inputs.shape[1], dtype=jnp.int32)[None, :], inputs.shape
        )
        logits, _ = forward(params, cfg, inputs, positions)
        return cross_entropy_loss(logits, targets, mask[:, 1:])

    @jax.jit
    def train_step(state: TrainState, tokens, mask):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, tokens, mask)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": gnorm,
        }

    return train_step


def lr_schedule(peak_lr: float, total_steps: int, warmup_steps: int = 0,
                end_lr_frac: float = 0.1):
    """Linear warmup → cosine decay to ``end_lr_frac·peak`` (the standard
    SFT schedule)."""
    warmup_steps = min(warmup_steps, max(total_steps - 1, 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, 1), end_value=peak_lr * end_lr_frac)


def init_train_state(model_name: str, mesh, *, seed: int = 0,
                     learning_rate: float = 1e-5, rules=TRAIN_RULES,
                     total_steps: int | None = None, warmup_steps: int = 0,
                     grad_clip: float | None = 1.0):
    """Initialize params on the mesh with TRAIN_RULES sharding and wrap in a
    TrainState with AdamW (+ global-norm clipping and, when ``total_steps``
    is given, warmup-cosine LR decay)."""
    from ..models.registry import get_model

    fam = get_model(model_name)
    params = fam.init_params(fam.config, jax.random.PRNGKey(seed))
    axes = fam.logical_axes()
    params = shard_pytree(params, axes, mesh, rules)
    lr = (lr_schedule(learning_rate, total_steps, warmup_steps)
          if total_steps else learning_rate)
    tx = [optax.adamw(lr, weight_decay=0.01)]
    if grad_clip:
        tx.insert(0, optax.clip_by_global_norm(grad_clip))
    optimizer = optax.chain(*tx)
    opt_state = optimizer.init(params)
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    return state, optimizer, fam


def make_eval_step(forward, cfg):
    """Jitted held-out loss: (params, tokens, mask) → masked CE."""

    @jax.jit
    def eval_step(params, tokens, mask):
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        positions = jnp.broadcast_to(
            jnp.arange(inputs.shape[1], dtype=jnp.int32)[None, :],
            inputs.shape)
        logits, _ = forward(params, cfg, inputs, positions)
        return cross_entropy_loss(logits, targets, mask[:, 1:])

    return eval_step


def train_loop(model_name: str, mesh, train_batches, *,
               eval_batches=None, total_steps: int | None = None,
               learning_rate: float = 1e-5, warmup_steps: int = 0,
               eval_every: int = 0, checkpoint_dir: str | None = None,
               checkpoint_every: int = 0, log_every: int = 10,
               seed: int = 0, log=print):
    """SFT driver: schedule, periodic held-out eval, orbax checkpoints.

    ``train_batches`` yields ``(tokens [B, T], loss_mask [B, T])`` numpy
    arrays (see train/data.batches); ``eval_batches`` a list of the same.
    Returns (final TrainState, history list of metric dicts).
    """
    state, optimizer, fam = init_train_state(
        model_name, mesh, seed=seed, learning_rate=learning_rate,
        total_steps=total_steps, warmup_steps=warmup_steps)
    step_fn = make_train_step(fam.forward, fam.config, optimizer)
    eval_fn = make_eval_step(fam.forward, fam.config)

    history: list[dict] = []
    for i, (tokens, mask) in enumerate(train_batches):
        if total_steps is not None and i >= total_steps:
            break
        state, metrics = step_fn(state, jnp.asarray(tokens),
                                 jnp.asarray(mask))
        rec = {"step": i + 1, "loss": float(metrics["loss"]),
               "grad_norm": float(metrics["grad_norm"])}
        if eval_batches and eval_every and (i + 1) % eval_every == 0:
            losses = [float(eval_fn(state.params, jnp.asarray(t),
                                    jnp.asarray(m)))
                      for t, m in eval_batches]
            rec["eval_loss"] = sum(losses) / len(losses)
        history.append(rec)
        if log_every and (i + 1) % log_every == 0:
            log(rec)
        if checkpoint_dir and checkpoint_every \
                and (i + 1) % checkpoint_every == 0:
            from .checkpoint import save_params

            save_params(checkpoint_dir, state.params, step=i + 1)
    return state, history
