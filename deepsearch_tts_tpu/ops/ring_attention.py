"""Ring attention: sequence-parallel causal attention over a mesh axis.

For prefill beyond one chip's HBM/FLOPs (SURVEY.md §2.3 marks SP/ring ABSENT
in the reference — it truncates long contexts instead), shard the sequence
across a mesh axis: each device keeps its Q chunk resident and the K/V
chunks rotate around the ring via ``ppermute`` (one ICI hop per step) while
an online-softmax accumulator folds each visiting block in. Block-level
causality skips fully-masked (future) blocks' compute.

Works on any mesh axis; validated against single-device full attention on
the CPU test mesh. Compute within a block uses the same GQA reference math
as ops/attention.py (and can dispatch to the Pallas flash kernel per block).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, q_block, k_block, chunk, scale):
    """Scores of one visiting K/V block with block-causal masking.

    q: [B, Tq, H, D]; k/v: [B, Tk, K, D]. Returns (scores_max, exp_scores @ v,
    exp row sums) pieces for online-softmax accumulation.
    """
    B, Tq, H, D = q.shape
    Kh = k.shape[2]
    G = H // Kh
    qg = q.reshape(B, Tq, Kh, G, D)
    s = jnp.einsum("btkgd,bskd->bkgts", qg.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))                      # [B,K,G,Tq,Tk]
    q_pos = q_block * chunk + jax.lax.broadcasted_iota(jnp.int32, (Tq, k.shape[1]), 0)
    k_pos = k_block * chunk + jax.lax.broadcasted_iota(jnp.int32, (Tq, k.shape[1]), 1)
    mask = (k_pos <= q_pos)[None, None, None]
    return jnp.where(mask, s, NEG_INF)


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    *, mesh: Mesh, axis: str = "tp", scale: float | None = None,
) -> jax.Array:
    """Causal attention with q/k/v sequence-sharded over ``axis``.

    q: [B, T, H, D] (global T); returns [B, T, H, D] with the same sharding.
    """
    from jax import shard_map

    D = q.shape[-1]
    scale = scale if scale is not None else D ** -0.5
    n = mesh.shape[axis]
    chunk = q.shape[1] // n

    def local(qc, kc, vc):
        # qc: [B, chunk, H, D] local shard; v may have a different feature
        # dim than q/k (MLA latent rows: D_v = kv_lora_rank)
        B, Tq, H, _ = qc.shape
        Kh = kc.shape[2]
        G = H // Kh
        Dv = vc.shape[-1]
        my = jax.lax.axis_index(axis)

        # mark accumulators device-varying so both cond branches agree on the
        # manual-axes type inside shard_map
        m0 = jax.lax.pcast(jnp.full((B, Kh, G, Tq, 1), NEG_INF, jnp.float32), axis, to="varying")
        l0 = jax.lax.pcast(jnp.zeros((B, Kh, G, Tq, 1), jnp.float32), axis, to="varying")
        a0 = jax.lax.pcast(jnp.zeros((B, Tq, H, Dv), jnp.float32), axis, to="varying")

        def body(step, carry):
            m, l, acc, kb, vb = carry
            src_block = (my - step) % n           # whose K/V we hold now

            def attend(m, l, acc, kb, vb):
                s = _block_attend(qc, kb, vb, my, src_block, chunk, scale)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                pv = jnp.einsum("bkgts,bskd->btkgd", p, vb.astype(jnp.float32))
                pv = pv.reshape(B, Tq, H, Dv)
                alpha_r = alpha.transpose(0, 3, 1, 2, 4).reshape(B, Tq, H, 1)
                return m_new, l_new, acc * alpha_r + pv

            def skip(m, l, acc, kb, vb):
                return m, l, acc

            m, l, acc = jax.lax.cond(src_block <= my, attend, skip,
                                     m, l, acc, kb, vb)
            perm = [(i, (i + 1) % n) for i in range(n)]
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            return m, l, acc, kb, vb

        m, l, acc, _, _ = jax.lax.fori_loop(0, n, body, (m0, l0, a0, kc, vc))
        l_r = jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2, 4).reshape(B, Tq, H, 1)
        return (acc / l_r).astype(qc.dtype)

    spec = P(None, axis, None, None)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
