"""Speculative decoding: device-side n-gram drafting for K-token verify steps.

Prompt-lookup / n-gram speculation: agentic deep-search traces are
copy-heavy — tool results are quoted into the final answer, multi-turn
conversations restate earlier spans — so the next K tokens often already
appear somewhere in the sequence. The engine drafts them on device from a
token-history buffer with an n-gram match and verifies all K+1 positions in
ONE forward pass: decode matmuls at serving batch are HBM-bound (each step
reads the full weights for one token per row), so a K+1-token verify row
costs nearly the same weight traffic as a decode row and every accepted
draft is a free token.

Correctness (exact-match acceptance): the verify step samples a token from
the TRUE conditional distribution at every window position (the forward fed
the drafts, so position i is conditioned on d_0..d_{i-1}); a draft is
accepted only when the sample EQUALS it. Conditional on acceptance of the
prefix, each emitted token is therefore an exact sample from the same
distribution sequential decoding would have used — greedy outputs are
bit-identical, and sampled outputs are distribution-identical (the one
documented approximation: within a single ≤K+1-token window the repetition
penalty sees the window-start ``seen`` set).

The reference rents this engine-side concern to its HTTP providers
(reference: scripts/deep_search.py:287-335); vLLM-class servers expose it
as speculative decoding / prompt-lookup. No reference counterpart code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ngram_draft(
    hist: jax.Array,     # [B, S] int32 token history; hist[b, q] = token at
    #                      absolute position q, valid for q <= lens[b]
    lens: jax.Array,     # [B] position of the last emitted token (hist[b,
    #                      lens[b]] is the token about to be fed)
    k: int,              # draft tokens to propose
    n: int = 2,          # n-gram length to match (the last n tokens)
) -> jax.Array:
    """Propose ``k`` draft tokens per row by continuing the most recent
    previous occurrence of the sequence's last ``n``-gram.

    Pure vectorized lookup — O(B*S) compares, trivial next to the verify
    matmuls. Rows with no match fall back to repeating the last token (any
    draft is sound: the verify step accepts only true samples).
    """
    B, S = hist.shape
    # the current n-gram: hist[lens-n+1 .. lens]
    gram = [
        jnp.take_along_axis(
            hist, jnp.clip(lens - (n - 1 - d), 0, S - 1)[:, None], axis=1
        )
        for d in range(n)
    ]  # n arrays of [B, 1]
    M = S - n + 1
    match = jnp.ones((B, M), bool)
    for d in range(n):
        match &= hist[:, d : M + d] == gram[d]
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    # the matched gram must END before the current one starts repeating
    # itself: j + n - 1 <= lens - 1
    valid = j_idx <= (lens - n)[:, None]
    best = jnp.max(jnp.where(match & valid, j_idx, -1), axis=1)  # [B]
    found = best >= 0
    cont = best[:, None] + n + jax.lax.broadcasted_iota(
        jnp.int32, (B, k), 1
    )  # continuation positions after the matched gram
    ok = found[:, None] & (cont <= lens[:, None])
    draft = jnp.take_along_axis(hist, jnp.clip(cont, 0, S - 1), axis=1)
    last = jnp.take_along_axis(hist, jnp.clip(lens, 0, S - 1)[:, None], axis=1)
    return jnp.where(ok, draft, last)


def accept_drafts(
    sampled: jax.Array,   # [B, K+1] true samples at each window position
    draft: jax.Array,     # [B, K] the drafts that were fed
    active: jax.Array,    # [B] rows decoding this step
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact-match acceptance: emit the longest prefix of samples that equal
    their drafts, plus the first mismatching sample (the correction — itself
    a true sample at its position).

    Returns ``(ncons [B] int32 tokens emitted, nxt [B] the last emitted
    token — the next step's input, alive [B, K+1] bool emission mask)``.
    Inactive rows emit 0.
    """
    B, K1 = sampled.shape
    match = sampled[:, : K1 - 1] == draft
    alive = jnp.concatenate(
        [jnp.ones((B, 1), bool), jnp.cumprod(match, axis=1).astype(bool)],
        axis=1,
    )  # alive[:, i] ⇔ position i's token is emitted
    ncons = jnp.where(active, alive.sum(axis=1).astype(jnp.int32), 0)
    nxt = jnp.take_along_axis(
        sampled, jnp.clip(ncons - 1, 0, K1 - 1)[:, None], axis=1
    )[:, 0]
    return ncons, nxt, alive
