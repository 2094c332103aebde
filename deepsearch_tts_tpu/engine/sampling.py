"""On-device fused sampling: repetition penalty → temperature → top-k →
top-p → min-p → categorical draw.

These are exactly the sampler knobs the reference forwards over HTTP to its
providers (reference: scripts/deep_search.py:295-316,340-371 — temperature,
top_p, top_k, min_p, repetition_penalty); here they execute on-chip per
decode step for the whole batch, fully inside jit, with per-slot parameters
so heterogeneous requests share one batched step.

Design: everything is masking on a [B, V] logits tile — no dynamic shapes.
top-k uses jax.lax.top_k for the threshold value only; top-p sorts once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingParams(NamedTuple):
    """Per-slot sampler settings, all [B]-shaped device arrays."""

    temperature: jax.Array        # 0 ⇒ greedy
    top_k: jax.Array              # 0 ⇒ disabled
    top_p: jax.Array              # 1.0 ⇒ disabled
    min_p: jax.Array              # 0.0 ⇒ disabled
    repetition_penalty: jax.Array  # 1.0 ⇒ disabled
    # logit-level sequential budget forcing (SURVEY.md §7 stage 7): suppress
    # EOS until the slot has produced min_tokens, forcing continued reasoning
    # on-device instead of a re-prompt round trip.
    min_tokens: jax.Array | None = None        # [B] int32; 0 ⇒ disabled
    tokens_generated: jax.Array | None = None  # [B] int32 running count
    eos_id: int = -1

    @staticmethod
    def make(batch: int, temperature=0.7, top_k=20, top_p=0.8, min_p=0.05,
             repetition_penalty=1.05) -> "SamplingParams":
        f = lambda v: jnp.full((batch,), v, jnp.float32)
        return SamplingParams(f(temperature), jnp.full((batch,), top_k, jnp.int32),
                              f(top_p), f(min_p), f(repetition_penalty))


def apply_repetition_penalty(logits: jax.Array, seen: jax.Array, penalty: jax.Array) -> jax.Array:
    """Divide positive logits (multiply negative) for previously seen tokens.

    seen: [B, V] bool presence of each token in the prompt + generation.
    """
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen, penalized, logits)


def _topk_mask(logits: jax.Array, k: jax.Array, max_k: int = 128) -> jax.Array:
    """Keep the top-k logits per row (k per-row, 0 disables)."""
    max_k = min(max_k, logits.shape[-1])
    vals, _ = jax.lax.top_k(logits, max_k)                    # [B, max_k]
    idx = jnp.clip(k - 1, 0, max_k - 1)
    thresh = jnp.take_along_axis(vals, idx[:, None], axis=1)  # [B, 1]
    keep = (logits >= thresh) | (k[:, None] <= 0)
    return jnp.where(keep, logits, NEG_INF)


def _topp_mask(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus filtering: keep the smallest set of tokens with cum-prob ≥ p."""
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose *preceding* cumulative mass is < p
    keep_sorted = (cum - probs) < top_p[:, None]
    # threshold = smallest kept logit
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1)
    keep = logits >= thresh[:, None]
    return jnp.where(keep, logits, NEG_INF)


def _minp_mask(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    """Drop tokens whose prob < min_p * max_prob."""
    mx = jnp.max(logits, axis=-1, keepdims=True)
    # p_i / p_max = exp(l_i - l_max); keep if >= min_p
    keep = (logits - mx) >= jnp.log(jnp.maximum(min_p[:, None], 1e-10))
    keep = keep | (min_p[:, None] <= 0.0)
    return jnp.where(keep, logits, NEG_INF)


def sample(
    logits: jax.Array,           # [B, V] float32
    params: SamplingParams,
    seen: jax.Array,             # [B, V] bool token-presence
    key: jax.Array,
) -> jax.Array:
    """Draw next tokens [B] int32. temperature<=0 rows decode greedily."""
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, seen, params.repetition_penalty)
    if params.min_tokens is not None and params.eos_id >= 0:
        suppress = params.tokens_generated < params.min_tokens   # [B]
        logits = logits.at[:, params.eos_id].add(
            jnp.where(suppress, NEG_INF, 0.0))
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(params.temperature, 1e-6)[:, None]
    scaled = logits / temp
    scaled = _topk_mask(scaled, params.top_k)
    scaled = _topp_mask(scaled, params.top_p)
    scaled = _minp_mask(scaled, params.min_p)
    gumbel = jax.random.gumbel(key, scaled.shape, jnp.float32)
    sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

    return jnp.where(params.temperature <= 0.0, greedy, sampled)


def update_seen(seen: jax.Array, tokens: jax.Array) -> jax.Array:
    """Mark newly produced tokens [B] in the presence mask [B, V]."""
    B = tokens.shape[0]
    rows = jnp.arange(B)
    return seen.at[rows, tokens].set(True)
