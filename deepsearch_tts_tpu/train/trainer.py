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


def init_train_state(model_name: str, mesh, *, seed: int = 0,
                     learning_rate: float = 1e-5, rules=TRAIN_RULES):
    """Initialize params on the mesh with TRAIN_RULES sharding and wrap in a
    TrainState with AdamW."""
    from ..models.registry import get_model

    fam = get_model(model_name)
    params = fam.init_params(fam.config, jax.random.PRNGKey(seed))
    axes = fam.logical_axes()
    params = shard_pytree(params, axes, mesh, rules)
    optimizer = optax.adamw(learning_rate, weight_decay=0.01)
    opt_state = optimizer.init(params)
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    return state, optimizer, fam
