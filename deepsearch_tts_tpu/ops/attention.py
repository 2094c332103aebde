"""Attention implementations: XLA reference paths + Pallas dispatch.

Three entry points, each with an ``impl`` switch:

* :func:`causal_attention`  — full causal self-attention (training / no-cache).
* :func:`paged_attention`   — query chunk attends over a paged KV cache
  (serving prefill *and* decode; decode is T=1).

The XLA paths are the correctness reference (and the CPU-test path); the
Pallas kernels in ``ops/flash_attention.py`` / ``ops/paged_attention.py``
are the TPU hot paths. GQA is handled by reshaping query heads into
[kv_heads, group] so the MXU contraction stays large.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _gqa_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """q: [B,T,H,D], k: [B,S,K,D] → scores [B,K,G,T,S] with H = K*G."""
    B, T, H, D = q.shape
    K = k.shape[2]
    G = H // K
    qg = q.reshape(B, T, K, G, D)
    return jnp.einsum("btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32)


def _gqa_out(probs: jax.Array, v: jax.Array, dtype) -> jax.Array:
    """probs: [B,K,G,T,S], v: [B,S,K,D] → [B,T,H,D]."""
    B, K, G, T, S = probs.shape
    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, K * G, v.shape[-1]).astype(dtype)


def causal_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    *, scale: float | None = None, impl: str = "xla",
    ring_mesh=None, ring_axis: str = "tp",
) -> jax.Array:
    """Full causal self-attention. q,k,v: [B,T,{H|K},D] → [B,T,H,D].

    ``impl="ring"`` shards the sequence over ``ring_axis`` of ``ring_mesh``
    and rotates K/V blocks over ICI (ops/ring_attention.py) — the engine's
    long-prefill path (sp aliases tp per parallel/mesh.py)."""
    if impl == "ring" and ring_mesh is not None:
        from .ring_attention import ring_attention
        return ring_attention(q, k, v, mesh=ring_mesh, axis=ring_axis,
                              scale=scale)
    if impl == "ulysses" and ring_mesh is not None:
        from .ulysses import ulysses_attention
        return ulysses_attention(q, k, v, mesh=ring_mesh, axis=ring_axis,
                                 scale=scale)
    if impl == "pallas":
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale, causal=True)
    D = q.shape[-1]
    scale = scale if scale is not None else D ** -0.5
    T, S = q.shape[1], k.shape[1]
    scores = _gqa_scores(q * scale, k)
    mask = jnp.tril(jnp.ones((T, S), dtype=bool), k=S - T)
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return _gqa_out(probs, v, q.dtype)


def paged_attention(
    q: jax.Array,                 # [B, T, H, D] current-chunk queries
    k_pages: jax.Array,           # [N, ps, K, D] this layer's key pages
    v_pages: jax.Array,           # [N, ps, K, D]
    page_table: jax.Array,        # [B, P] int32 page ids (0 = reserved null page)
    seq_lens: jax.Array,          # [B] total valid tokens (incl. current chunk)
    q_positions: jax.Array,       # [B, T] absolute position of each query token
    *, scale: float | None = None, impl: str = "xla",
    k_scales: jax.Array | None = None,   # [N, ps, K] int8-KV dequant scales
    v_scales: jax.Array | None = None,
) -> jax.Array:
    """Attend queries over their sequence's paged KV (causal by position).

    The chunk's own KV must already be written to the pages. Works for
    multi-turn re-prefill (chunk attends to the cached prefix) and decode
    (T=1). XLA path materializes the gathered KV — fine for tests/small
    batches; the Pallas kernel streams pages HBM→VMEM instead.
    """
    if impl in ("pallas", "pallas2", "clamp") and q.shape[1] == 1:
        from .paged_attention import (
            pallas_paged_attention,
            pallas_paged_decode,
            pallas_paged_decode_clamp,
        )

        # "clamp": exact per-row page reads via DMA-eliding clamped index
        # maps (decode only). "pallas2": per-slot page-streaming decode
        # kernel — measured slower than the (B,P)-grid kernel on v5e (DMA
        # latency dominates the tiny per-page compute), opt-in.
        if impl == "clamp":
            return pallas_paged_decode_clamp(
                q, k_pages, v_pages, page_table, seq_lens, scale=scale
            )
        if impl == "pallas2":
            return pallas_paged_decode(
                q, k_pages, v_pages, page_table, seq_lens, scale=scale
            )
        return pallas_paged_attention(
            q, k_pages, v_pages, page_table, seq_lens, q_positions, scale=scale
        )
    # T>1 (re-prefill over a cached prefix): ALWAYS the XLA gather. The
    # Pallas chunked-prefill kernel is a measured-negative archive
    # (ops/paged_attention.py docstring) and its whole-bucket q block
    # overflows scoped VMEM at wide prompt buckets (r4: [16, 2048, 128]
    # → 41MB > 16MB compiling a slot-engine's non-fresh prefill when the
    # engine-wide attn_impl was "pallas").
    B, T, H, D = q.shape
    N, ps, K, _ = k_pages.shape
    P = page_table.shape[1]
    S = P * ps
    scale = scale if scale is not None else D ** -0.5

    if k_scales is not None:
        # int8 KV pools are STORED int32-packed (engine/kvcache.
        # quantize_kv_rows): the gather moves 32-bit words (a raw int8
        # gather lowers to a scalar TPU path, measured ~12x slower), and
        # only the gathered [B, S] context — never the whole pool — is
        # lane-unpacked and dequantized at the consumer.
        from ..engine.kvcache import unpack_int8_rows

        k_ctx = unpack_int8_rows(k_pages[page_table]).reshape(B, S, K, D)
        v_ctx = unpack_int8_rows(v_pages[page_table]).reshape(B, S, K, D)
        ks = k_scales[page_table].reshape(B, S, K, 1)
        vs = v_scales[page_table].reshape(B, S, K, 1)
        k_ctx = (k_ctx.astype(jnp.float32) * ks).astype(q.dtype)
        v_ctx = (v_ctx.astype(jnp.float32) * vs).astype(q.dtype)
    else:
        k_ctx = k_pages[page_table].reshape(B, S, K, D)
        v_ctx = v_pages[page_table].reshape(B, S, K, D)
    return masked_context_attention(q, k_ctx, v_ctx, seq_lens, q_positions,
                                    scale=scale)


def gather_kv_rows(pool: jax.Array, table: jax.Array, max_unroll: int = 32
                   ) -> jax.Array:
    """Collect ``pool[table]`` rows, preferring unrolled dynamic slices.

    XLA's gather on TPU is pathological for large rows: collecting 16 x
    1MB slot rows from a 2.7GB pool measured 248ms for 28 layers where 16
    unrolled ``dynamic_index_in_dim`` slices take 7.7ms (32x) — the gather
    lowers to a slow path instead of row-sized DMAs. ``table`` must have a
    static shape; falls back to the gather beyond ``max_unroll`` entries
    (trace-size blowup inside layer scans)."""
    G, P = table.shape
    if G * P > max_unroll:
        return pool[table]
    rows = [jax.lax.dynamic_index_in_dim(pool, table[g, p], 0,
                                         keepdims=False)
            for g in range(G) for p in range(P)]
    out = jnp.stack(rows).reshape((G, P) + pool.shape[1:])
    # the barrier forces the stacked slices to materialize contiguously
    # instead of fusing into the attention einsum's operand reads — the
    # fused form fed the MXU strided and cost 240ms/28 layers for a 6ms
    # einsum (in-context ablation r4: non-fresh prefill 543ms → 62ms)
    return jax.lax.optimization_barrier(out)


def prefix_chunk_attention(
    q: jax.Array,            # [B, T, H, D] this chunk's queries
    k_old: jax.Array,        # [B, S, K, D] gathered cache (stale at
    v_old: jax.Array,        # positions >= chunk_start — masked off)
    k_new: jax.Array,        # [B, T, K, D] this chunk's fresh keys/values
    v_new: jax.Array,
    chunk_start: jax.Array,  # [B] first valid position of the chunk
    q_positions: jax.Array,  # [B, T] absolute positions; <0 = padding
    *, scale: float | None = None,
) -> jax.Array:
    """Re-prefill attention: cached prefix + the chunk itself, jointly
    softmaxed.

    The cache part is read BEFORE the chunk's KV scatter: gathering from
    the just-scattered (donated, scan-carried) pool measured ~10x slower
    than this split on v5e (571ms vs 57ms per 16x128 group — XLA serializes
    the read against the in-place write); reading the pre-write pool and
    taking the chunk's K/V from registers removes the dependency, and the
    math is identical because old keys at positions >= chunk_start are
    masked off and replaced by the fresh in-register copies."""
    B, T, H, D = q.shape
    S = k_old.shape[1]
    scale = scale if scale is not None else D ** -0.5
    qs = q * scale
    s_old = _gqa_scores(qs, k_old)                      # [B,K,G,T,S]
    s_new = _gqa_scores(qs, k_new)                      # [B,K,G,T,T]
    kpos_old = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    m_old = (kpos_old < chunk_start[:, None])[:, None, None, None, :]
    m_new = ((q_positions[:, None, :] <= q_positions[:, :, None])
             & (q_positions[:, None, :] >= 0))[:, None, None, :, :]
    s = jnp.concatenate([jnp.where(m_old, s_old, NEG_INF),
                         jnp.where(m_new, s_new, NEG_INF)], axis=-1)
    probs = jax.nn.softmax(s, axis=-1)
    out = _gqa_out(probs[..., :S], v_old, jnp.float32) \
        + _gqa_out(probs[..., S:], v_new, jnp.float32)
    return out.astype(q.dtype)


def masked_context_attention(
    q: jax.Array,        # [B, T, H, D]
    k_ctx: jax.Array,    # [B, S, K, D] each row's own context
    v_ctx: jax.Array,
    seq_lens: jax.Array,
    q_positions: jax.Array,
    *, scale: float | None = None,
) -> jax.Array:
    """Causal+length-masked GQA over per-row context buffers.

    Used by the paged XLA path (after gather) and directly by the
    contiguous-slot cache mode, where ``k_ctx`` is a dynamic slice of the
    pool — a fusible op, so no materialized copy of the cache is ever made
    (the gather in the paged path costs a full write+read of the context)."""
    B, T, H, D = q.shape
    S = k_ctx.shape[1]
    scale = scale if scale is not None else D ** -0.5
    scores = _gqa_scores(q * scale, k_ctx)  # [B,K,G,T,S]
    ctx_pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    valid = ctx_pos < seq_lens[:, None]                      # within sequence
    causal = ctx_pos[:, None, :] <= q_positions[:, :, None]  # [B,T,S]
    mask = (valid[:, None, :] & causal)[:, None, None, :, :]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return _gqa_out(probs, v_ctx, q.dtype)
