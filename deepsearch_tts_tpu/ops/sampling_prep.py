"""Pallas TPU fused sampling preparation: one pass over the [B, V] logits.

The sampler's pre-window work (engine/sampling.py) was measured at
~0.45ms/step of the 0.70ms total (micro-bench MB_SAMPLE, r3): repetition
penalty, EOS suppression, temperature scaling, and the full-vocab
logsumexp each materialize or re-read a [B, V] f32 array — ~4 HBM passes
where the math needs one. This kernel fuses them: a single streaming pass
over vocab blocks reads the raw logits + seen mask once, writes the
scaled logits once, and accumulates an online (flash-style) logsumexp in
VMEM scratch. ``approx_max_k`` (the TPU-native exact-window reduction)
then runs over the scaled output as before, and the sampler reuses the
kernel's lse instead of paying another [B, V] pass.

These are exactly the sampler knobs the reference forwards over HTTP
(reference: scripts/deep_search.py:295-316 — temperature, top_p, top_k,
min_p, repetition_penalty); here they execute fused on-chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _prep_kernel(logits_ref, seen_ref, pen_ref, temp_ref, sup_ref,
                 scaled_ref, lse_ref, m_ref, s_ref,
                 *, eos_id: int, block_v: int):
    """Grid (V // block_v,): penalty → EOS suppression → temperature →
    write scaled block; online logsumexp across blocks in VMEM scratch."""
    j = pl.program_id(0)
    nb = pl.num_programs(0)

    x = logits_ref[:].astype(jnp.float32)                  # [B, bv]
    seen = seen_ref[:]
    pen = pen_ref[:]                                       # [B, 1]
    penalized = jnp.where(x > 0, x / pen, x * pen)
    x = jnp.where(seen, penalized, x)
    if eos_id >= 0:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + j * block_v
        x = jnp.where(sup_ref[:] & (col == eos_id), NEG_INF, x)
    x = x / temp_ref[:]
    scaled_ref[:] = x

    bm = jnp.max(x, axis=-1, keepdims=True)                # [B, 1]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = bm
        s_ref[:] = jnp.sum(jnp.exp(x - bm), axis=-1, keepdims=True)

    @pl.when(j > 0)
    def _acc():
        m_new = jnp.maximum(m_ref[:], bm)
        alpha = jnp.exp(m_ref[:] - m_new)
        s_ref[:] = s_ref[:] * alpha + jnp.sum(jnp.exp(x - m_new), axis=-1,
                                              keepdims=True)
        m_ref[:] = m_new

    @pl.when(j == nb - 1)
    def _fin():
        lse_ref[:] = m_ref[:] + jnp.log(jnp.maximum(s_ref[:], 1e-30))


def sampling_prep(
    logits: jax.Array,        # [B, V] raw next-token logits
    seen: jax.Array,          # [B, V] bool token-presence mask
    penalty: jax.Array,       # [B] repetition penalty (1.0 = off)
    temperature: jax.Array,   # [B] pre-clamped > 0
    suppress_eos: jax.Array,  # [B] bool — min_tokens budget forcing
    eos_id: int = -1,
    *, block_v: int = 2048, interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns ``(scaled [B, V] f32, lse [B, 1] f32)`` in one HBM pass."""
    B, V = logits.shape
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    bv = block_v
    while V % bv:
        bv //= 2
    # VMEM residents per grid step, double-buffered by the pipeline:
    # logits f32 in + seen bool in + scaled f32 out ≈ 9 bytes/elem x2.
    # Speculative decode calls this with B*(K+1) rows (engine verify steps
    # sample every window position in one pass) — at 384 rows x bv=2048 the
    # default block overflows the 16MB scoped budget (measured: 18.38M).
    while bv > 256 and 2 * 9 * B * bv > 12 * 2**20:
        bv //= 2
    nb = V // bv

    row = lambda j: (0, 0)
    blk = lambda j: (0, j)
    scaled, lse = pl.pallas_call(
        functools.partial(_prep_kernel, eos_id=eos_id, block_v=bv),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, bv), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, bv), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, bv), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, V), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(logits, seen, penalty[:, None], temperature[:, None],
      suppress_eos[:, None])
    return scaled, lse
