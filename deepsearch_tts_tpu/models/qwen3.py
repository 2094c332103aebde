"""Qwen3 dense decoder family — pure functional JAX, scan-over-layers.

TPU-first design notes:

* Parameters are *stacked* across layers (leading ``L`` dim) and the forward
  pass is a single ``lax.scan`` — one layer gets traced/compiled regardless of
  depth, and the paged KV pools thread through the scan carry so XLA keeps
  the update in place.
* Every weight carries logical sharding axes (see ``parallel/sharding.py``);
  megatron TP falls out of the rules table: wq/wk/wv/gate/up column-sharded
  over ``tp``, wo/down row-sharded, with XLA inserting the psum.
* Serving and training share the same block code; the attention op switches
  between full-causal (train) and paged (serve).

Architecture facts (per the published Qwen3 family): GQA with per-head
QK-RMSNorm, no attention/MLP biases, SwiGLU, RoPE theta 1e6, tied embeddings
on the small variants. The reference consumes these models via OpenRouter
HTTP (reference: scripts/deep_search.py:453-520); here they run in-house.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops
from ..ops.quant import maybe_int8_dot
from .common import apply_rope, dense_init, rms_norm, rope_angles


@dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden: int = 4096
    n_layers: int = 36
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 128
    intermediate: int = 12288
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    dtype: str = "bfloat16"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


# Published size points of the family (head_dim is 128 across the board).
QWEN3_CONFIGS = {
    "qwen3-0.6b": Qwen3Config(hidden=1024, n_layers=28, n_heads=16, n_kv_heads=8,
                              intermediate=3072, tie_embeddings=True),
    "qwen3-1.7b": Qwen3Config(hidden=2048, n_layers=28, n_heads=16, n_kv_heads=8,
                              intermediate=6144, tie_embeddings=True),
    "qwen3-4b": Qwen3Config(hidden=2560, n_layers=36, n_heads=32, n_kv_heads=8,
                            intermediate=9728, tie_embeddings=True),
    "qwen3-8b": Qwen3Config(hidden=4096, n_layers=36, n_heads=32, n_kv_heads=8,
                            intermediate=12288),
    "qwen3-14b": Qwen3Config(hidden=5120, n_layers=40, n_heads=40, n_kv_heads=8,
                             intermediate=17408),
    "qwen3-32b": Qwen3Config(hidden=5120, n_layers=64, n_heads=64, n_kv_heads=8,
                             intermediate=25600),
    # tiny config for tests/benchmarks
    "qwen3-test": Qwen3Config(vocab_size=512, hidden=128, n_layers=2, n_heads=4,
                              n_kv_heads=2, head_dim=32, intermediate=256,
                              tie_embeddings=True),
}


def init_params(cfg: Qwen3Config, key: jax.Array) -> dict:
    dt = cfg.jnp_dtype
    E, H, K, D, F, L = (cfg.hidden, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim,
                        cfg.intermediate, cfg.n_layers)
    ks = jax.random.split(key, 8)

    def layer_stack(kbase, shape, in_axis=0):
        keys = jax.random.split(kbase, L)
        return jnp.stack([dense_init(k, shape, in_axis=in_axis, dtype=dt) for k in keys])

    params = {
        "embed": dense_init(ks[1], (cfg.vocab_size, E), in_axis=1, dtype=dt),
        "layers": {
            "ln1": jnp.ones((L, E), dt),
            "ln2": jnp.ones((L, E), dt),
            "q_norm": jnp.ones((L, D), dt),
            "k_norm": jnp.ones((L, D), dt),
            "wq": layer_stack(ks[2], (E, H * D)),
            "wk": layer_stack(ks[3], (E, K * D)),
            "wv": layer_stack(ks[4], (E, K * D)),
            "wo": layer_stack(ks[5], (H * D, E)),
            "w_gate": layer_stack(ks[6], (E, F)),
            "w_up": layer_stack(ks[7], (E, F)),
            "w_down": layer_stack(jax.random.fold_in(ks[7], 1), (F, E)),
        },
        "final_norm": jnp.ones((E,), dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense_init(jax.random.fold_in(ks[1], 1), (E, cfg.vocab_size), dtype=dt)
    return params


def logical_axes(cfg: Qwen3Config) -> dict:
    """Pytree of logical-axis tuples mirroring init_params output."""
    lax_ = {
        "ln1": ("layer", "embed"), "ln2": ("layer", "embed"),
        "q_norm": ("layer", None), "k_norm": ("layer", None),
        "wq": ("layer", "embed", "heads"),
        "wk": ("layer", "embed", "kv_heads"),
        "wv": ("layer", "embed", "kv_heads"),
        "wo": ("layer", "heads", "embed"),
        "w_gate": ("layer", "embed", "mlp"),
        "w_up": ("layer", "embed", "mlp"),
        "w_down": ("layer", "mlp", "embed"),
    }
    tree = {"embed": ("vocab", "embed"), "layers": lax_, "final_norm": ("embed",)}
    if not cfg.tie_embeddings:
        tree["lm_head"] = ("embed", "vocab")
    return tree


def _block(cfg: Qwen3Config, lp: dict, x, cos, sin, attend):
    """One decoder layer. ``attend(q, k, v) -> [B,T,H,D]`` is supplied by the
    caller (paged or full-causal)."""
    B, T, E = x.shape
    H, K, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    h = rms_norm(x, lp["ln1"], cfg.rms_eps)
    if "wqkv" in lp:  # packed layout (engine.pack_weights)
        qkv = maybe_int8_dot(h, lp["wqkv"])
        q = qkv[..., : H * D].reshape(B, T, H, D)
        k = qkv[..., H * D : (H + K) * D].reshape(B, T, K, D)
        v = qkv[..., (H + K) * D :].reshape(B, T, K, D)
    else:
        q = maybe_int8_dot(h, lp["wq"]).reshape(B, T, H, D)
        k = maybe_int8_dot(h, lp["wk"]).reshape(B, T, K, D)
        v = maybe_int8_dot(h, lp["wv"]).reshape(B, T, K, D)
    q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
    k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    o = attend(q.astype(x.dtype), k.astype(x.dtype), v)
    o = maybe_int8_dot(o.reshape(B, T, H * D), lp["wo"])
    x = x + o.astype(x.dtype)

    h = rms_norm(x, lp["ln2"], cfg.rms_eps)
    if "w_gateup" in lp:
        F = cfg.intermediate
        gu = maybe_int8_dot(h, lp["w_gateup"])
        g, u = gu[..., :F], gu[..., F:]
    else:
        g = maybe_int8_dot(h, lp["w_gate"])
        u = maybe_int8_dot(h, lp["w_up"])
    mlp = maybe_int8_dot(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                         lp["w_down"])
    return x + mlp.astype(x.dtype)


def forward(
    params: dict,
    cfg: Qwen3Config,
    tokens: jax.Array,            # [B, T] int32
    positions: jax.Array,         # [B, T] int32 absolute; <0 = padding
    *,
    k_pages: jax.Array | None = None,   # [L, N, ps, K, D] serving mode
    v_pages: jax.Array | None = None,
    page_table: jax.Array | None = None,  # [B, P]
    seq_lens: jax.Array | None = None,    # [B]
    logits_indices: jax.Array | None = None,  # [B] position in T to project
    impl: str = "xla",
    slot_decode: bool = False,  # contiguous-slot decode: batch row == pool row
    slot_ctx: int | None = None,  # static context-bucket width: the slot
    # attention reads pool[:, :slot_ctx] — a fused contiguous slice, so
    # early decode moves only the bucket's bytes (engine._slot_buckets)
    fresh_prefill: bool = False,  # no cached prefix: attend over the chunk only
    ring_mesh=None,             # impl="ring": sequence-parallel fresh prefill
    ring_axis: str = "tp",
    k_scales: jax.Array | None = None,  # int8 KV: [L, N, ps, K] f32 scales
    v_scales: jax.Array | None = None,
    fused_decode: bool = False,  # T=1 packed-weight Pallas layer kernels
    attn_ablate: str | None = None,  # perf decomposition (micro_decode):
    #   "skip" = no scatter, attention returns zeros;
    #   "scatter_only" = write KV, attention returns zeros
    lane_tokens: jax.Array | None = None,     # [Tp] in-flight prefill lane:
    #   ONE complete prompt (from position 0, ≤ Tp tokens) per decode step.
    #   Fresh-only by contract: lane attention is causal within the lane
    #   rows themselves and never reads the KV pool. (A pool-reading lane
    #   branch under lax.cond captured the multi-GB pools as conditional
    #   operands and measured 0.5s/step from per-layer pool copies, r4;
    #   chunked/cached prompts take the batched-injected prefill path
    #   instead, which runs at MXU rate.)
    lane_positions: jax.Array | None = None,  # [Tp]; <0 = padding
    lane_table: jax.Array | None = None,      # [P] pages / [1] slot row the
    #   lane tokens' KV is written into
    lane_logit_row: jax.Array | None = None,  # scalar: lane row to project
):
    """Run the decoder.

    Serving mode (pages given): writes the chunk's KV into the paged cache,
    attends over the full cached sequence, returns
    ``(logits [B,(T|1),V], (k_pages, v_pages))``.
    Training mode (pages None): full causal attention, returns
    ``(logits [B,T,V], None)``.

    Prefill lane (decode T=1 only): ``lane_tokens`` ride the decode step as
    ``Tp`` extra rows of ONE sequence — they share every weight read with
    the HBM-bound decode pass (matmuls grow by Tp near-free rows), write
    their KV through the same scatter, and attend causally over their own
    pages via per-row query positions. The returned logits gain one row:
    ``logits[B]`` is the ``lane_logit_row``-th lane token's projection (the
    engine samples a just-completed prompt's first token from it). This is
    how prompt prefill overlaps decode without a separate MXU-bound phase.
    """
    from ..engine.kvcache import (
        quantize_kv_rows,
        write_kv_flat,
        write_scales_flat,
    )

    serving = k_pages is not None
    kv_int8 = serving and k_scales is not None
    lane = lane_tokens is not None
    B_dec = tokens.shape[0]
    if lane:
        assert serving and tokens.shape[1] == 1 \
            and not fresh_prefill, "lane rides the decode step only"
        Tp = lane_tokens.shape[0]
        tokens = jnp.concatenate([tokens, lane_tokens[:, None]], axis=0)
        positions = jnp.concatenate([positions, lane_positions[:, None]],
                                    axis=0)
        if not slot_decode:
            page_table = jnp.concatenate(
                [page_table, jnp.broadcast_to(lane_table[None],
                                              (Tp,) + lane_table.shape)],
                axis=0)
        # slot mode: the synthetic identity table is built below; lane rows
        # write into slot row lane_table[0]'s contiguous buffer
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_angles(jnp.maximum(positions, 0), cfg.head_dim, cfg.rope_theta)

    lp_stack = params["layers"]

    if serving:
        # pools are carried through the layer scan as one flattened buffer
        # and updated by in-place scatter — never sliced per layer or
        # re-stacked as scan outputs (that would copy the whole cache every
        # step; see engine docstring / kvcache.write_kv_flat).
        # slot_decode: the pool is [L, B, max_len, K, D] and batch row n IS
        # pool row n, so attention reads a *dynamic slice* of the pool —
        # fusible, no gather copy. (Prefill over a row subset still goes
        # through the paged/gather path with per-slot tables.)
        L, N = k_pages.shape[0], k_pages.shape[1]
        ps = k_pages.shape[2]
        kpf = k_pages.reshape((L * N,) + k_pages.shape[2:])
        vpf = v_pages.reshape((L * N,) + v_pages.shape[2:])
        if kv_int8:
            ksf = k_scales.reshape((L * N,) + k_scales.shape[2:])
            vsf = v_scales.reshape((L * N,) + v_scales.shape[2:])
        else:
            ksf = vsf = None
        if slot_decode:
            page_table = jnp.arange(B_dec, dtype=jnp.int32)[:, None]
            if lane:
                page_table = jnp.concatenate(
                    [page_table,
                     jnp.broadcast_to(lane_table[None], (Tp, 1))], axis=0)

        # T>1 windows (speculative verify steps, engine spec_k+1 tokens per
        # row) flatten into B*T activation rows through the same fused
        # kernels; attention takes the windowed slot kernel below. Without
        # this the verify step pays the unfused per-layer small-op overhead
        # (measured 1.8x a plain step at B=8).
        use_fused = (fused_decode
                     and (tokens.shape[1] == 1
                          or (slot_decode and not lane
                              and tokens.shape[1] <= 8))
                     and not fresh_prefill
                     and "wqkv" in lp_stack and "w_gateup" in lp_stack)
        fused_i8 = use_fused and isinstance(lp_stack["wqkv"], dict)

        def body(carry, lp):
            if kv_int8:
                x, kpf, vpf, ksf, vsf, layer = carry
            else:
                x, kpf, vpf, layer = carry
                ksf = vsf = None
            table_l = page_table + layer * N

            def attend(q, k, v):
                if attn_ablate == "skip":
                    return (jnp.zeros_like(q), kpf, vpf, ksf, vsf)
                if attn_ablate == "scatter_only":
                    kw, vw = write_kv_flat(kpf, vpf, k, v, positions, table_l)
                    return (jnp.zeros_like(q), kw, vw, ksf, vsf)
                if kv_int8:
                    kq, ks_new = quantize_kv_rows(k)
                    vq, vs_new = quantize_kv_rows(v)
                    kw, vw = write_kv_flat(kpf, vpf, kq, vq, positions, table_l)
                    ksw = write_scales_flat(ksf, ks_new, positions, table_l)
                    vsw = write_scales_flat(vsf, vs_new, positions, table_l)
                else:
                    kw, vw = write_kv_flat(kpf, vpf, k, v, positions, table_l)
                    ksw = vsw = None
                if fresh_prefill:
                    # positions start at 0 ⇒ causal attention over the chunk
                    # itself (no paged read of the empty page budget). Padded
                    # tail tokens produce garbage rows that are never read.
                    # impl="ring" shards the chunk's sequence over the mesh
                    # (long-prefill path, ops/ring_attention.py).
                    out = attn_ops.causal_attention(
                        q, k, v, impl=impl, ring_mesh=ring_mesh,
                        ring_axis=ring_axis)
                elif slot_decode:
                    q_dec = q[:B_dec] if lane else q
                    pos_dec = positions[:B_dec] if lane else positions
                    if impl == "pallas" and q.shape[1] > 1 and not lane:
                        # speculative verify window: per-(row, t) causal
                        # limits, one context DMA shared by the window
                        # (ops/slot_attention.slot_window_attention)
                        from ..ops.slot_attention import (
                            slot_window_attention,
                        )

                        out = slot_window_attention(
                            q_dec, kw, vw, seq_lens, pos_dec[:, 0],
                            layer, n_rows=N,
                            slot_ctx=(slot_ctx if slot_ctx is not None
                                      else kw.shape[1]))
                    elif impl == "pallas" and q.shape[1] == 1:
                        # in-kernel multi-row streaming with per-row-block
                        # context clamping (ops/slot_attention.py) — the
                        # pool is read by the kernel's own index maps, no
                        # XLA-level slice at all
                        from ..ops.slot_attention import slot_attention

                        limit = jnp.minimum(
                            seq_lens, jnp.maximum(pos_dec[:, 0], 0) + 1)
                        out = slot_attention(
                            q_dec[:, 0], kw, vw, limit, layer, n_rows=N,
                            slot_ctx=(slot_ctx if slot_ctx is not None
                                      else kw.shape[1]))[:, None]
                    else:
                        k_ctx = jax.lax.dynamic_slice_in_dim(kw, layer * N, N, 0)
                        v_ctx = jax.lax.dynamic_slice_in_dim(vw, layer * N, N, 0)
                        if slot_ctx is not None:
                            k_ctx = k_ctx[:, :slot_ctx]
                            v_ctx = v_ctx[:, :slot_ctx]
                        out = attn_ops.masked_context_attention(
                            q_dec, k_ctx, v_ctx, seq_lens,
                            jnp.maximum(pos_dec, 0))
                    if lane:
                        # lane rows are ONE whole prompt: causal within the
                        # lane rows (fresh-only contract, see signature) —
                        # prefill genuinely rides decode's HBM-bound weight
                        # reads, with zero pool traffic
                        H_, D_ = q.shape[2], q.shape[3]
                        K_ = cfg.n_kv_heads
                        out_l = attn_ops.causal_attention(
                            q[B_dec:].reshape(1, Tp, H_, D_),
                            k[B_dec:].reshape(1, Tp, K_, D_),
                            v[B_dec:].reshape(1, Tp, K_, D_), impl="xla")
                        out = jnp.concatenate(
                            [out, out_l.reshape(Tp, 1, H_, D_)], axis=0)
                elif lane:
                    # decode rows gather their (bucketed) tables; the lane's
                    # Tp rows are ONE whole prompt, causal within itself
                    # (fresh-only contract — no pool read)
                    out_d = attn_ops.paged_attention(
                        q[:B_dec], kw, vw, table_l[:B_dec], seq_lens,
                        jnp.maximum(positions[:B_dec], 0),
                        impl=impl, k_scales=ksw, v_scales=vsw,
                    )
                    H_, D_ = q.shape[2], q.shape[3]
                    K_ = cfg.n_kv_heads
                    out_l = attn_ops.causal_attention(
                        q[B_dec:].reshape(1, -1, H_, D_),
                        k[B_dec:].reshape(1, -1, K_, D_),
                        v[B_dec:].reshape(1, -1, K_, D_), impl="xla")
                    out = jnp.concatenate(
                        [out_d, out_l.reshape(-1, 1, H_, D_)], axis=0)
                elif q.shape[1] > 1 and not kv_int8:
                    # re-prefill over a cached prefix: gather the prefix
                    # from the PRE-write pool and take the chunk's K/V from
                    # registers (ops/attention.prefix_chunk_attention) —
                    # gathering from the just-scattered pool measured ~10x
                    # slower (XLA serializes read-after-in-place-write)
                    Bq, P = q.shape[0], table_l.shape[1]
                    k_old = attn_ops.gather_kv_rows(kpf, table_l).reshape(
                        Bq, P * ps, K, D)
                    v_old = attn_ops.gather_kv_rows(vpf, table_l).reshape(
                        Bq, P * ps, K, D)
                    out = attn_ops.prefix_chunk_attention(
                        q, k_old, v_old, k, v, positions[:, 0], positions)
                else:
                    out = attn_ops.paged_attention(
                        q, kw, vw, table_l, seq_lens, jnp.maximum(positions, 0),
                        impl=impl, k_scales=ksw, v_scales=vsw,
                    )
                return out, kw, vw, ksw, vsw

            B, T, E = x.shape
            H, K, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
            if use_fused:
                # decode hot path: two Pallas kernels per layer
                # (ops/fused_layer.py) — norms/rope/residuals never leave
                # VMEM, and the *stacked* weight arrays are indexed by the
                # traced layer id inside the kernels' BlockSpec maps, so the
                # scan never materializes per-layer weight slices. Attention
                # stays on the engine-selected paged path.
                from ..ops.fused_layer import (
                    fused_out_mlp_stacked,
                    fused_out_mlp_stacked_i8,
                    fused_qkv_stacked,
                    fused_qkv_stacked_i8,
                )

                # T>1 verify windows flatten into B*T rows: the kernels are
                # pure row-wise matmul+norm+rope, so row count is all that
                # changes (rope cos/sin are already per (row, position))
                BT = B * T
                xf = x.reshape(BT, E)
                cosf = cos.reshape(BT, -1)
                sinf = sin.reshape(BT, -1)
                if fused_i8:
                    # int8 weight blocks + per-channel scales stream through
                    # the BlockSpecs; half the weight HBM per step
                    qf, kf2, vf2 = fused_qkv_stacked_i8(
                        xf, lp_stack["ln1"], lp_stack["wqkv"]["q"],
                        lp_stack["wqkv"]["scales"], lp_stack["q_norm"],
                        lp_stack["k_norm"], cosf, sinf, layer,
                        n_heads=H, n_kv=K, head_dim=D, eps=cfg.rms_eps)
                else:
                    qf, kf2, vf2 = fused_qkv_stacked(
                        xf, lp_stack["ln1"], lp_stack["wqkv"],
                        lp_stack["q_norm"], lp_stack["k_norm"],
                        cosf, sinf, layer,
                        n_heads=H, n_kv=K, head_dim=D, eps=cfg.rms_eps)
                q = qf.reshape(B, T, H, D).astype(x.dtype)
                k = kf2.reshape(B, T, K, D).astype(x.dtype)
                v = vf2.reshape(B, T, K, D).astype(x.dtype)
                o, kpf, vpf, ksf, vsf = attend(q, k, v)
                if fused_i8:
                    x = fused_out_mlp_stacked_i8(
                        o.reshape(BT, H * D).astype(x.dtype), xf,
                        lp_stack["wo"]["q"], lp_stack["wo"]["scales"],
                        lp_stack["ln2"], lp_stack["w_gateup"]["q"],
                        lp_stack["w_gateup"]["scales"],
                        lp_stack["w_down"]["q"],
                        lp_stack["w_down"]["scales"], layer,
                        eps=cfg.rms_eps).reshape(B, T, E)
                else:
                    x = fused_out_mlp_stacked(
                        o.reshape(BT, H * D).astype(x.dtype), xf,
                        lp_stack["wo"], lp_stack["ln2"],
                        lp_stack["w_gateup"], lp_stack["w_down"], layer,
                        eps=cfg.rms_eps).reshape(B, T, E)
                if kv_int8:
                    return (x, kpf, vpf, ksf, vsf, layer + 1), None
                return (x, kpf, vpf, layer + 1), None
            h = rms_norm(x, lp["ln1"], cfg.rms_eps)
            if "wqkv" in lp:  # packed single-chip layout (engine.pack_weights)
                qkv = maybe_int8_dot(h, lp["wqkv"])
                q = qkv[..., : H * D].reshape(B, T, H, D)
                k = qkv[..., H * D : (H + K) * D].reshape(B, T, K, D)
                v = qkv[..., (H + K) * D :].reshape(B, T, K, D)
            else:
                q = maybe_int8_dot(h, lp["wq"]).reshape(B, T, H, D)
                k = maybe_int8_dot(h, lp["wk"]).reshape(B, T, K, D)
                v = maybe_int8_dot(h, lp["wv"]).reshape(B, T, K, D)
            q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            q = apply_rope(q, cos, sin).astype(x.dtype)
            k = apply_rope(k, cos, sin).astype(x.dtype)
            o, kpf, vpf, ksf, vsf = attend(q, k, v.astype(x.dtype))
            o = maybe_int8_dot(o.reshape(B, T, H * D), lp["wo"])
            x = x + o.astype(x.dtype)
            h = rms_norm(x, lp["ln2"], cfg.rms_eps)
            if "w_gateup" in lp:
                F = cfg.intermediate
                gu = maybe_int8_dot(h, lp["w_gateup"])
                g, u = gu[..., :F], gu[..., F:]
            else:
                g = maybe_int8_dot(h, lp["w_gate"])
                u = maybe_int8_dot(h, lp["w_up"])
            mlp = maybe_int8_dot(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                                 lp["w_down"])
            x = x + mlp.astype(x.dtype)
            if kv_int8:
                return (x, kpf, vpf, ksf, vsf, layer + 1), None
            return (x, kpf, vpf, layer + 1), None

        # fused path: weights reach the kernels as closed-over full stacks
        # (indexed by layer id), so the scan carries no xs at all
        xs = None if use_fused else lp_stack
        length = cfg.n_layers if use_fused else None
        if kv_int8:
            (x, kpf, vpf, ksf, vsf, _), _ = jax.lax.scan(
                body, (x, kpf, vpf, ksf, vsf, jnp.zeros((), jnp.int32)),
                xs, length=length)
            k_scales = ksf.reshape(k_scales.shape)
            v_scales = vsf.reshape(v_scales.shape)
        else:
            (x, kpf, vpf, _), _ = jax.lax.scan(
                body, (x, kpf, vpf, jnp.zeros((), jnp.int32)), xs,
                length=length)
        k_pages = kpf.reshape(k_pages.shape)
        v_pages = vpf.reshape(v_pages.shape)
    else:
        def body(x, lp):
            def attend(q, k, v):
                return attn_ops.causal_attention(q, k, v, impl=impl)
            return _block(cfg, lp, x, cos, sin, attend), None

        x, _ = jax.lax.scan(body, x, lp_stack)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    if lane:
        # project decode rows + the one lane row the engine may sample
        # (the just-completed prompt's last token): logits row B_dec
        lane_row = jax.lax.dynamic_index_in_dim(
            x[B_dec:], lane_logit_row, axis=0, keepdims=True)
        x = jnp.concatenate([x[:B_dec], lane_row], axis=0)
    if logits_indices is not None:
        x = jnp.take_along_axis(x, logits_indices[:, None, None], axis=1)  # [B,1,E]
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    if isinstance(head, dict):   # int8 lm_head (ops/quant.maybe_int8_dot)
        from ..ops.quant import int8_matmul

        logits = int8_matmul(x, head["q"], head["scales"]).astype(jnp.float32)
    else:
        logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    if not serving:
        return (logits, None)
    if kv_int8:
        return (logits, (k_pages, v_pages, k_scales, v_scales))
    return (logits, (k_pages, v_pages))
