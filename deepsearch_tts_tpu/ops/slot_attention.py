"""Pallas TPU decode attention over the contiguous-slot KV cache.

The paged Pallas kernels (ops/paged_attention.py) lose to XLA's fused
gather because a paged layout forces one small DMA per (row, page) — the
measured clamp kernel moves 128KB per copy and achieves 259GB/s against
the chip's ~560GB/s gather bandwidth. The contiguous-slot cache
(engine ``cache_mode="slot"``: batch row n IS pool row n) removes the
indirection entirely, so a kernel can stream *multi-row* context blocks —
``block_rows × block_ctx × K × D`` ≈ 2MB per DMA — at full HBM bandwidth
while keeping two structural advantages over the XLA path:

* **Exact per-row-block context.** The k/v BlockSpec index maps clamp the
  context-block coordinate at each row block's own ``ceil(max_len/cb)``
  (scalar-prefetched): Mosaic elides the DMA when a block index repeats,
  so a row block of short sequences pays only for the context it has,
  not the engine's global bucket width.
* **No score materialization.** The XLA path writes [B, S] masked scores
  + softmax to HBM between fusions at some shapes; here the online
  softmax state lives in VMEM scratch.

Head-matching uses the same folded layout as ``_paged_kernel``: per row,
``k`` reshapes [cb, K, D] → [cb*K, D] and the [H, cb*K] score matrix is
masked to ``col % K == row_kv`` — the PV contraction then lands directly
in [H, D] with no per-head extraction.

The reference rents attention from vLLM over HTTP (reference:
scripts/lcb_runner/runner/vllm_runner.py:17-33); this kernel exists to
beat the XLA gather path that currently sets the decode roofline
(CLAUDE.md measurement history).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _slot_ctx_block(slot_ctx: int, cap: int = 128) -> int:
    """Largest divisor of ``slot_ctx`` that is ≤ cap and a multiple of 16
    (bf16 sublane tile), so context blocks tile cleanly."""
    best = 0
    b = 16
    while b <= min(slot_ctx, cap):
        if slot_ctx % b == 0:
            best = b
        b += 16
    return best


def _slot_attn_body(sp_ref, lim_ref, q_ref, k_ref, v_ref, o_ref,
                    m_ref, s_ref, acc_ref,
                    *, scale: float, n_kv: int, group: int,
                    block_rows: int, block_ctx: int):
    """Grid (row_blocks, ctx_blocks); ctx innermost so the online-softmax
    scratch accumulates per row block. ``sp_ref`` = [layer, mb_0..mb_nrb):
    mb_i is row block i's clamped context-block count (consumed by the
    index maps); ``lim_ref`` holds per-row valid-key counts. ``v_ref`` may
    be ``k_ref`` itself (MLA latent cache: k == v, single DMA)."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_cb = pl.num_programs(1)
    K, G = n_kv, group
    cb = block_ctx

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mb = sp_ref[1 + i]

    @pl.when(c < mb)
    def _compute():
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (K * G, cb * K), 1)
        row_kv = jax.lax.broadcasted_iota(jnp.int32, (K * G, cb * K), 0) // G
        col_kv = col_ids % K
        tok_pos = c * cb + col_ids // K
        for r in range(block_rows):
            q = q_ref[r].astype(jnp.float32) * scale       # [H, D]
            kf = k_ref[r].reshape(cb * K, -1)              # [cb*K, D]
            vf = v_ref[r].reshape(cb * K, -1)
            s = jax.lax.dot_general(q, kf, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            limit = lim_ref[i * block_rows + r]
            mask = (col_kv == row_kv) & (tok_pos < limit)
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_ref[r]                              # [H, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            pexp = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            s_ref[r] = s_ref[r] * alpha + jnp.sum(pexp, axis=1, keepdims=True)
            pv = jax.lax.dot_general(pexp.astype(vf.dtype), vf,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[r] = acc_ref[r] * alpha + pv           # [H, D]
            m_ref[r] = m_new

    @pl.when(c == n_cb - 1)
    def _fin():
        denom = jnp.maximum(s_ref[:], 1e-30)
        o_ref[:] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _slot_attn_kernel(sp_ref, lim_ref, q_ref, k_ref, v_ref, o_ref,
                      m_ref, s_ref, acc_ref, **kw):
    _slot_attn_body(sp_ref, lim_ref, q_ref, k_ref, v_ref, o_ref,
                    m_ref, s_ref, acc_ref, **kw)


def _slot_attn_kernel_shared(sp_ref, lim_ref, q_ref, k_ref, o_ref,
                             m_ref, s_ref, acc_ref, **kw):
    # k IS v (MLA latent rows): one context DMA feeds both contractions
    _slot_attn_body(sp_ref, lim_ref, q_ref, k_ref, k_ref, o_ref,
                    m_ref, s_ref, acc_ref, **kw)


def _slot_window_body(sp_ref, base_ref, cap_ref, q_ref, k_ref, v_ref, o_ref,
                      m_ref, s_ref, acc_ref,
                      *, scale: float, n_kv: int, group: int,
                      block_rows: int, block_ctx: int, win: int):
    """Windowed variant for speculative verify steps: each slot row carries
    ``win`` query tokens (the draft window) with per-token causal limits.
    The window folds into the score matmul's row dim — one
    [win*H, cb*K] dot per (row, ctx block), so the context DMA is shared by
    all window positions (vs ``win`` separate kernel calls re-reading it).
    Query row w*H+h (window position w) sees keys < min(cap, base + w):
    ``base``/``cap`` are per-slot scalars (t=0 limit and the sequence-length
    clamp), and the per-row limit is derived from iotas in-register — a
    [W, H] → [W*H, 1] reshape of a prefetched vector is a Mosaic
    unsupported shape cast (measured compile failure)."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_cb = pl.num_programs(1)
    K, G = n_kv, group
    cb = block_ctx
    W = win

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mb = sp_ref[1 + i]

    @pl.when(c < mb)
    def _compute():
        H = K * G
        R = W * H
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, cb * K), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, cb * K), 0)
        row_kv = (rows % H) // G
        row_t = rows // H                       # window position per row
        col_kv = col_ids % K
        tok_pos = c * cb + col_ids // K
        for r in range(block_rows):
            q = q_ref[r].reshape(R, -1).astype(jnp.float32) * scale
            kf = k_ref[r].reshape(cb * K, -1)
            vf = v_ref[r].reshape(cb * K, -1)
            s = jax.lax.dot_general(q, kf, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            base = base_ref[i * block_rows + r]
            cap = cap_ref[i * block_rows + r]
            limv = jnp.minimum(cap, base + row_t)
            mask = (col_kv == row_kv) & (tok_pos < limv)
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_ref[r]                                   # [R, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            pexp = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            s_ref[r] = s_ref[r] * alpha + jnp.sum(pexp, axis=1, keepdims=True)
            pv = jax.lax.dot_general(pexp.astype(vf.dtype), vf,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[r] = acc_ref[r] * alpha + pv                # [R, D]
            m_ref[r] = m_new

    @pl.when(c == n_cb - 1)
    def _fin():
        H = K * G
        denom = jnp.maximum(s_ref[:], 1e-30)
        o_ref[:] = (acc_ref[:] / denom).reshape(o_ref.shape).astype(o_ref.dtype)


def _slot_window_kernel(sp_ref, base_ref, cap_ref, q_ref, k_ref, v_ref,
                        o_ref, m_ref, s_ref, acc_ref, **kw):
    _slot_window_body(sp_ref, base_ref, cap_ref, q_ref, k_ref, v_ref, o_ref,
                      m_ref, s_ref, acc_ref, **kw)


def _slot_window_kernel_shared(sp_ref, base_ref, cap_ref, q_ref, k_ref,
                               o_ref, m_ref, s_ref, acc_ref, **kw):
    _slot_window_body(sp_ref, base_ref, cap_ref, q_ref, k_ref, k_ref, o_ref,
                      m_ref, s_ref, acc_ref, **kw)


def slot_window_attention(
    q: jax.Array,        # [B, W, H, D] the verify window's queries
    k_pool: jax.Array,   # [L*N, ps, K, D] flattened slot pools
    v_pool: jax.Array | None,  # None ⇒ v IS k (MLA latent cache)
    seq_lens: jax.Array,  # [B] int32 — valid-key clamp (window keys are in
    #                       the pool already: the engine scatters, then
    #                       attends with seq_lens covering the window)
    base_pos: jax.Array,  # [B] int32 — position of window token 0
    layer: jax.Array,    # traced scalar layer index
    *, n_rows: int, slot_ctx: int, scale: float | None = None,
    block_rows: int = 8, interpret: bool | None = None,
) -> jax.Array:
    """Speculative-verify attention over the contiguous-slot cache.

    Same streaming layout as :func:`slot_attention` but each slot row
    carries a ``W``-token draft window whose queries share the row's
    context DMA. Window causality: query t sees positions
    ``< min(seq_lens, base_pos + t + 1)``, derived in-kernel from two
    per-row scalars. Returns [B, W, H, D]."""
    B, W, H, D = q.shape
    LN, ps, K, Dk = k_pool.shape
    assert Dk == D and LN % n_rows == 0
    G = H // K
    scale = scale if scale is not None else D ** -0.5
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    rb = block_rows
    while B % rb:
        rb //= 2
    cb = _slot_ctx_block(min(slot_ctx, ps))
    if cb == 0 or n_rows % rb or B != n_rows:
        raise ValueError(
            f"slot_window_attention needs B==n_rows ({B} vs {n_rows}), "
            f"divisible row blocks and a tileable slot_ctx ({slot_ctx})")
    n_rb = B // rb
    n_cb = min(slot_ctx, ps) // cb

    cap = jnp.maximum(seq_lens.astype(jnp.int32), 1)
    # base = t=0 limit; row t's limit = min(cap, base + t) (inactive rows,
    # base_pos clamped at 0, attend token 0: deterministic garbage the
    # engine discards — mirrors the T=1 kernel)
    base = jnp.maximum(jnp.minimum(
        cap, jnp.maximum(base_pos.astype(jnp.int32), 0) + 1), 1)
    last = jnp.minimum(cap, base + W - 1)   # widest limit in the window
    mb = jnp.clip(-(-last.reshape(n_rb, rb).max(axis=1) // cb), 1, n_cb)
    sp = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1), mb])
    blocks_per_layer = n_rows // rb

    shared = v_pool is None
    squeeze = K == 1  # MLA: see slot_attention's sublane note
    if squeeze:
        k_pool = k_pool.reshape(LN, ps, D)
        if v_pool is not None:
            v_pool = v_pool.reshape(LN, ps, D)

        def kv_map(i, c, sp, base, cap):
            return (sp[0] * blocks_per_layer + i,
                    jnp.minimum(c, sp[1 + i] - 1), 0)

        kv_block = (rb, cb, D)
    else:
        def kv_map(i, c, sp, base, cap):
            return (sp[0] * blocks_per_layer + i,
                    jnp.minimum(c, sp[1 + i] - 1), 0, 0)

        kv_block = (rb, cb, K, D)
    kv_specs = [pl.BlockSpec(kv_block, kv_map,
                             memory_space=pltpu.VMEM)] * (1 if shared else 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_rb, n_cb),
        in_specs=[
            pl.BlockSpec((rb, W, H, D), lambda i, c, *r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + kv_specs,
        out_specs=pl.BlockSpec((rb, W, H, D), lambda i, c, *r: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rb, W * H, 1), jnp.float32),
            pltpu.VMEM((rb, W * H, 1), jnp.float32),
            pltpu.VMEM((rb, W * H, D), jnp.float32),
        ],
    )
    kernel = _slot_window_kernel_shared if shared else _slot_window_kernel
    operands = (sp, base, cap, q) + ((k_pool,) if shared
                                     else (k_pool, v_pool))
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale, n_kv=K, group=G,
                          block_rows=rb, block_ctx=cb, win=W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W, H, D), q.dtype),
        interpret=interpret,
    )(*operands)
    return out


def slot_attention(
    q: jax.Array,        # [B, H, D] this step's queries (T=1)
    k_pool: jax.Array,   # [L*N, ps, K, D] flattened slot pools (row n of
    v_pool: jax.Array | None,  # layer l at index l*N + n; N == B in slot
    #   mode). None ⇒ v IS k (MLA latent cache) — halves the context DMA.
    limit: jax.Array,    # [B] int32 — valid keys = min(seq_len, pos+1)
    layer: jax.Array,    # traced scalar layer index
    *, n_rows: int, slot_ctx: int, scale: float | None = None,
    block_rows: int = 8, interpret: bool | None = None,
) -> jax.Array:
    """Decode GQA over each row's own contiguous KV slot. Returns [B, H, D].

    Reads at most ``slot_ctx`` positions per row (the engine's context
    bucket), further clamped per row *block* to the block's longest
    sequence — short row blocks skip whole context-block DMAs."""
    B, H, D = q.shape
    LN, ps, K, Dk = k_pool.shape
    assert Dk == D and LN % n_rows == 0
    G = H // K
    scale = scale if scale is not None else D ** -0.5
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    rb = block_rows
    while B % rb:
        rb //= 2
    cb = _slot_ctx_block(min(slot_ctx, ps))
    if cb == 0 or n_rows % rb or B != n_rows:
        raise ValueError(
            f"slot_attention needs B==n_rows ({B} vs {n_rows}), divisible "
            f"row blocks and a tileable slot_ctx (got {slot_ctx})")
    n_rb = B // rb
    n_cb = min(slot_ctx, ps) // cb

    # inactive slots (limit 0) attend token 0: finite deterministic garbage,
    # discarded by the engine — mirrors the XLA path's uniform softmax
    lim = jnp.maximum(limit.astype(jnp.int32), 1)
    mb = jnp.clip(-(-lim.reshape(n_rb, rb).max(axis=1) // cb), 1, n_cb)
    sp = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1), mb])
    blocks_per_layer = n_rows // rb

    shared = v_pool is None
    # K == 1 (MLA latent cache): a [cb, 1, D] block puts the singleton head
    # dim in the SUBLANE slot of the (8, 128) tile — Mosaic pads it 8x and
    # every context DMA reads 8x the bytes (measured: slot MLA 710 tok/s vs
    # paged 5263 even with lane-aligned rows). Squeeze the dim so blocks
    # tile as [cb, D]; the kernel body's reshape to [cb*K, D] is unchanged.
    squeeze = K == 1
    if squeeze:
        k_pool = k_pool.reshape(LN, ps, D)
        if v_pool is not None:
            v_pool = v_pool.reshape(LN, ps, D)

        def kv_map(i, c, sp, lim):
            return (sp[0] * blocks_per_layer + i,
                    jnp.minimum(c, sp[1 + i] - 1), 0)

        kv_block = (rb, cb, D)
    else:
        def kv_map(i, c, sp, lim):
            return (sp[0] * blocks_per_layer + i,
                    jnp.minimum(c, sp[1 + i] - 1), 0, 0)

        kv_block = (rb, cb, K, D)
    kv_specs = [pl.BlockSpec(kv_block, kv_map,
                             memory_space=pltpu.VMEM)] * (1 if shared else 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rb, n_cb),
        in_specs=[
            pl.BlockSpec((rb, H, D), lambda i, c, *r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + kv_specs,
        out_specs=pl.BlockSpec((rb, H, D), lambda i, c, *r: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rb, H, 1), jnp.float32),
            pltpu.VMEM((rb, H, 1), jnp.float32),
            pltpu.VMEM((rb, H, D), jnp.float32),
        ],
    )
    kernel = _slot_attn_kernel_shared if shared else _slot_attn_kernel
    operands = (sp, lim, q) + ((k_pool,) if shared else (k_pool, v_pool))
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale, n_kv=K, group=G,
                          block_rows=rb, block_ctx=cb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(*operands)
    return out
