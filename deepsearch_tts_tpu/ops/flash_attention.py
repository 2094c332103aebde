"""Pallas TPU causal flash attention (prefill / training path).

Online-softmax tiling: grid (batch*kv_head, q_blocks, k_blocks) with the
k-block dimension innermost; running max/denominator and the f32 accumulator
live in VMEM scratch that persists across the sequential k steps, and the
output tile is written once on the final k block. Upper-triangular k blocks
are predicated off with ``pl.when`` so no MXU work is issued for them.

GQA folds the query-head group into the q-tile row dimension ([G·BQ, D]) so
the MXU contraction stays ≥128 rows even for small groups.

This replaces the attention the reference rents via HTTP providers
(SURVEY.md §2.2 — reference has no kernels of its own).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, block_q: int, block_k: int, seq_len: int):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal: skip blocks strictly above the diagonal
    @pl.when(kb * block_k <= (qb + 1) * block_q - 1)
    def _compute():
        q = q_ref[0].astype(jnp.float32) * scale          # [BQ, D]
        k = k_ref[0].astype(jnp.float32)                  # [BK, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [BQ, BK]
        q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        # mask past-diagonal and past-seq_len (block padding may hold garbage)
        s = jnp.where((k_pos <= q_pos) & (k_pos < seq_len), s, NEG_INF)

        m_prev = m_ref[:]                                  # [BQ, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                             # [BQ, BK]
        alpha = jnp.exp(m_prev - m_new)                    # [BQ, 1]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0].astype(jnp.float32)                   # [BK, D]
        # zero padded v rows: 0·garbage (or 0·NaN in interpret mode) would
        # otherwise poison the accumulator through the matmul
        v_row = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(v_row < seq_len, v, 0.0)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(kb == nk - 1)
    def _finish():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, S, K, D]
    v: jax.Array,  # [B, S, K, D]
    *, scale: float | None = None, causal: bool = True,
    block_q: int = 256, block_k: int = 256, interpret: bool | None = None,
) -> jax.Array:
    """Causal flash attention with GQA. Returns [B, T, H, D]."""
    assert causal, "non-causal path not needed by the decoder"
    B, T, H, D = q.shape
    S, K = k.shape[1], k.shape[2]
    G = H // K
    scale = scale if scale is not None else D ** -0.5
    block_q = min(block_q, T * G)
    block_k = min(block_k, S)
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()

    # Grid dim 0 runs over B*H query heads; k/v index maps divide by the GQA
    # group so each query head streams its kv head's tiles.
    qg = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
    kg = k.transpose(0, 2, 1, 3).reshape(B * K, S, D)
    vg = v.transpose(0, 2, 1, 3).reshape(B * K, S, D)

    block_q = min(block_q, T)
    block_k = min(block_k, S)
    grid = (B * H, pl.cdiv(T, block_q), pl.cdiv(S, block_k))

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_q=block_q,
                          block_k=block_k, seq_len=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qb, kb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, qb, kb, G=G: (bh // G, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, qb, kb, G=G: (bh // G, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qb, kb: (bh, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running denom
            pltpu.VMEM((block_q, D), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(qg, kg, vg)
    return out.reshape(B, H, T, D).transpose(0, 2, 1, 3)
