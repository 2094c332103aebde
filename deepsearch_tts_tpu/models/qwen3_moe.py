"""Qwen3-MoE decoder family (the reference's headline policy model class —
qwen/qwen3-235b-a22b served via OpenRouter, reference README.md:22-40 — here
run in-house).

Same attention stack as the dense family (GQA + per-head QK-RMSNorm + RoPE);
every layer's MLP is a top-8-of-128 SwiGLU MoE with renormalized router
probabilities. Expert weights carry an ``expert`` logical axis which the
serving rules map onto the ``ep`` mesh axis — XLA inserts the all-to-alls
(SURVEY.md §2.3: EP is a first-class build target absent in the reference).

``moe_impl``: 'ragged' (sort + lax.ragged_dot, fast single-slice) or
'capacity' (GShard one-hot einsum, shardable over ep). See ops/moe.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops
from ..ops.moe import moe_capacity, moe_ragged
from ..ops.quant import maybe_int8_dot
from .common import apply_rope, dense_init, rms_norm, rope_angles


@dataclass(frozen=True)
class Qwen3MoeConfig:
    vocab_size: int = 151936
    hidden: int = 4096
    n_layers: int = 94
    n_heads: int = 64
    n_kv_heads: int = 4
    head_dim: int = 128
    n_experts: int = 128
    top_k: int = 8
    moe_intermediate: int = 1536
    norm_topk_prob: bool = True
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    moe_impl: str = "ragged"
    capacity_factor: float = 1.25
    dtype: str = "bfloat16"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


QWEN3_MOE_CONFIGS = {
    # Qwen3-235B-A22B: 94 layers, 64 q heads / 4 kv heads, 128 experts top-8
    "qwen3-235b-a22b": Qwen3MoeConfig(),
    # Qwen3-30B-A3B: 48 layers, 32/4 heads, 128 experts top-8, hidden 2048
    "qwen3-30b-a3b": Qwen3MoeConfig(hidden=2048, n_layers=48, n_heads=32,
                                    n_kv_heads=4, moe_intermediate=768),
    "qwen3-moe-test": Qwen3MoeConfig(vocab_size=512, hidden=64, n_layers=2,
                                     n_heads=4, n_kv_heads=2, head_dim=16,
                                     n_experts=8, top_k=2, moe_intermediate=96),
}


def init_params(cfg: Qwen3MoeConfig, key: jax.Array) -> dict:
    dt = cfg.jnp_dtype
    E, H, K, D, L = cfg.hidden, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.n_layers
    NE, F = cfg.n_experts, cfg.moe_intermediate
    ks = jax.random.split(key, 10)

    def layer_stack(kbase, shape, in_axis=0):
        keys = jax.random.split(kbase, L)
        return jnp.stack([dense_init(k, shape, in_axis=in_axis, dtype=dt) for k in keys])

    def expert_stack(kbase, shape, in_axis):
        keys = jax.random.split(kbase, L)
        return jnp.stack([
            jnp.stack([dense_init(jax.random.fold_in(k, e), shape, in_axis=in_axis,
                                  dtype=dt) for e in range(NE)])
            for k in keys
        ])

    params = {
        "embed": dense_init(ks[0], (cfg.vocab_size, E), in_axis=1, dtype=dt),
        "layers": {
            "ln1": jnp.ones((L, E), dt), "ln2": jnp.ones((L, E), dt),
            "q_norm": jnp.ones((L, D), dt), "k_norm": jnp.ones((L, D), dt),
            "wq": layer_stack(ks[1], (E, H * D)),
            "wk": layer_stack(ks[2], (E, K * D)),
            "wv": layer_stack(ks[3], (E, K * D)),
            "wo": layer_stack(ks[4], (H * D, E)),
            "router": layer_stack(ks[5], (E, NE)),
            "w_gate": expert_stack(ks[6], (E, F), in_axis=0),
            "w_up": expert_stack(ks[7], (E, F), in_axis=0),
            "w_down": expert_stack(ks[8], (F, E), in_axis=0),
        },
        "final_norm": jnp.ones((E,), dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense_init(ks[9], (E, cfg.vocab_size), dtype=dt)
    return params


def logical_axes(cfg: Qwen3MoeConfig) -> dict:
    lax_ = {
        "ln1": ("layer", "embed"), "ln2": ("layer", "embed"),
        "q_norm": ("layer", None), "k_norm": ("layer", None),
        "wq": ("layer", "embed", "heads"),
        "wk": ("layer", "embed", "kv_heads"),
        "wv": ("layer", "embed", "kv_heads"),
        "wo": ("layer", "heads", "embed"),
        "router": ("layer", "embed", None),
        "w_gate": ("layer", "expert", "embed", "expert_mlp"),
        "w_up": ("layer", "expert", "embed", "expert_mlp"),
        "w_down": ("layer", "expert", "expert_mlp", "embed"),
    }
    tree = {"embed": ("vocab", "embed"), "layers": lax_, "final_norm": ("embed",)}
    if not cfg.tie_embeddings:
        tree["lm_head"] = ("embed", "vocab")
    return tree


def _moe_block(cfg: Qwen3MoeConfig, lp: dict, h: jax.Array,
               router_logits: jax.Array | None = None) -> jax.Array:
    B, T, E = h.shape
    x = h.reshape(B * T, E)
    if "w_gateup" in lp:  # packed gate|up (engine.pack_weights)
        w_gate, w_up = lp["w_gateup"], None
    else:
        w_gate, w_up = lp["w_gate"], lp["w_up"]
    if cfg.moe_impl == "ragged":
        out = moe_ragged(x, lp.get("router"), w_gate, w_up, lp["w_down"],
                         cfg.top_k, cfg.norm_topk_prob,
                         router_logits=router_logits)
    else:
        if w_up is None:
            F = lp["w_down"].shape[-2]
            w_gate, w_up = w_gate[..., :F], w_gate[..., F:]
        out = moe_capacity(x, lp["router"], w_gate, w_up, lp["w_down"],
                           cfg.top_k, cfg.norm_topk_prob,
                           capacity_factor=cfg.capacity_factor)
    return out.reshape(B, T, E)


def forward(
    params: dict,
    cfg: Qwen3MoeConfig,
    tokens: jax.Array,
    positions: jax.Array,
    *,
    k_pages: jax.Array | None = None,
    v_pages: jax.Array | None = None,
    page_table: jax.Array | None = None,
    seq_lens: jax.Array | None = None,
    logits_indices: jax.Array | None = None,
    impl: str = "xla",
    slot_decode: bool = False,
    slot_ctx: int | None = None,  # static context-bucket slice (see qwen3.py)
    fresh_prefill: bool = False,
    ring_mesh=None,
    ring_axis: str = "tp",
    fused_decode: bool = False,  # T=1 Pallas attention-side kernels
    lane_tokens: jax.Array | None = None,     # in-flight prefill lane —
    lane_positions: jax.Array | None = None,  # fresh-only whole-prompt
    lane_table: jax.Array | None = None,      # contract, see
    lane_logit_row: jax.Array | None = None,  # models/qwen3.forward
):
    """Same contract as models/qwen3.forward (serving + training modes),
    including the decode-step prefill lane."""
    from ..engine.kvcache import write_kv_flat

    serving = k_pages is not None
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
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_angles(jnp.maximum(positions, 0), cfg.head_dim, cfg.rope_theta)
    H, K, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def attn(lp, x, attend):
        B, T, E = x.shape
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
        o = attend(q, k, v.astype(x.dtype))
        if isinstance(o, tuple):
            o, extra = o[0], o[1:]
        else:
            extra = ()
        o = maybe_int8_dot(o.reshape(B, T, H * D), lp["wo"])
        return x + o.astype(x.dtype), extra

    if serving:
        # pools carried flattened + scatter-updated in place (see qwen3.py)
        L, N = k_pages.shape[0], k_pages.shape[1]
        kpf = k_pages.reshape((L * N,) + k_pages.shape[2:])
        vpf = v_pages.reshape((L * N,) + v_pages.shape[2:])
        if slot_decode:
            page_table = jnp.arange(B_dec, dtype=jnp.int32)[:, None]
            if lane:
                page_table = jnp.concatenate(
                    [page_table,
                     jnp.broadcast_to(lane_table[None], (Tp, 1))], axis=0)

        lp_stack = params["layers"]
        use_fused = (fused_decode and tokens.shape[1] == 1
                     and not fresh_prefill and cfg.moe_impl == "ragged"
                     and "wqkv" in lp_stack and "w_gateup" in lp_stack
                     and not isinstance(lp_stack["wqkv"], dict))

        def make_attend(kpf, vpf, layer, table_l):
            def attend(q, k, v):
                kw, vw = write_kv_flat(kpf, vpf, k, v, positions, table_l)
                if fresh_prefill:
                    out = attn_ops.causal_attention(
                        q, k, v, impl=impl if impl == "ring" else "xla",
                        ring_mesh=ring_mesh, ring_axis=ring_axis)
                elif slot_decode:
                    q_dec = q[:B_dec] if lane else q
                    pos_dec = positions[:B_dec] if lane else positions
                    if impl == "pallas" and q.shape[1] == 1:
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
                        # fresh-only lane: causal within the whole-prompt
                        # lane rows, no pool read (models/qwen3.forward)
                        H_, D_ = q.shape[2], q.shape[3]
                        out_l = attn_ops.causal_attention(
                            q[B_dec:].reshape(1, Tp, H_, D_),
                            k[B_dec:].reshape(1, Tp, K, D_),
                            v[B_dec:].reshape(1, Tp, K, D_), impl="xla")
                        out = jnp.concatenate(
                            [out, out_l.reshape(Tp, 1, H_, D_)], axis=0)
                elif lane:
                    out_d = attn_ops.paged_attention(
                        q[:B_dec], kw, vw, table_l[:B_dec], seq_lens,
                        jnp.maximum(positions[:B_dec], 0), impl=impl)
                    H_, D_ = q.shape[2], q.shape[3]
                    out_l = attn_ops.causal_attention(
                        q[B_dec:].reshape(1, -1, H_, D_),
                        k[B_dec:].reshape(1, -1, K, D_),
                        v[B_dec:].reshape(1, -1, K, D_), impl="xla")
                    out = jnp.concatenate(
                        [out_d, out_l.reshape(-1, 1, H_, D_)], axis=0)
                elif q.shape[1] > 1:
                    # re-prefill: cached prefix read pre-write + in-register
                    # chunk K/V (see models/qwen3.py / ops/attention.py)
                    Bq, P = q.shape[0], table_l.shape[1]
                    ps_ = kpf.shape[1]
                    k_old = attn_ops.gather_kv_rows(kpf, table_l).reshape(
                        Bq, P * ps_, K, D)
                    v_old = attn_ops.gather_kv_rows(vpf, table_l).reshape(
                        Bq, P * ps_, K, D)
                    out = attn_ops.prefix_chunk_attention(
                        q, k_old, v_old, k, v, positions[:, 0], positions)
                else:
                    out = attn_ops.paged_attention(
                        q, kw, vw, table_l, seq_lens, jnp.maximum(positions, 0),
                        impl=impl,
                    )
                return out, kw, vw
            return attend

        def body(carry, lp):
            x, kpf, vpf, layer = carry
            table_l = page_table + layer * N
            attend = make_attend(kpf, vpf, layer, table_l)

            if use_fused:
                # attention half on the dense family's Pallas kernels; the
                # back half (wo+residual+ln2+router) is one kernel; expert
                # FFN stays on ragged_dot over the scanned expert stacks
                from ..ops.fused_layer import (
                    fused_out_router_stacked,
                    fused_qkv_stacked,
                )

                B = x.shape[0]
                qf, kf2, vf2 = fused_qkv_stacked(
                    x[:, 0], lp_stack["ln1"], lp_stack["wqkv"],
                    lp_stack["q_norm"], lp_stack["k_norm"],
                    cos[:, 0], sin[:, 0], layer,
                    n_heads=H, n_kv=K, head_dim=D, eps=cfg.rms_eps)
                q = qf.reshape(B, 1, H, D).astype(x.dtype)
                k = kf2.reshape(B, 1, K, D).astype(x.dtype)
                v = vf2.reshape(B, 1, K, D).astype(x.dtype)
                o, kpf, vpf = attend(q, k, v)
                x2, hn, rl = fused_out_router_stacked(
                    o.reshape(B, H * D).astype(x.dtype), x[:, 0],
                    lp_stack["wo"], lp_stack["ln2"], lp_stack["router"],
                    layer, eps=cfg.rms_eps)
                moe_out = _moe_block(cfg, lp, hn[:, None, :],
                                     router_logits=rl)
                x = (x2 + moe_out[:, 0])[:, None, :]
                return (x, kpf, vpf, layer + 1), None

            x, (kpf, vpf) = attn(lp, x, attend)
            h = rms_norm(x, lp["ln2"], cfg.rms_eps)
            x = x + _moe_block(cfg, lp, h)
            return (x, kpf, vpf, layer + 1), None

        # fused path: attention weights reach the kernels as closed-over
        # stacks (layer-indexed by scalar prefetch); only the expert stacks
        # ride the scan as xs
        xs = ({k: lp_stack[k] for k in ("w_gateup", "w_down")}
              if use_fused else lp_stack)
        (x, kpf, vpf, _), _ = jax.lax.scan(
            body, (x, kpf, vpf, jnp.zeros((), jnp.int32)), xs)
        k_pages = kpf.reshape(k_pages.shape)
        v_pages = vpf.reshape(v_pages.shape)
    else:
        def body(x, lp):
            def attend(q, k, v):
                return attn_ops.causal_attention(q, k, v, impl=impl)
            x, _ = attn(lp, x, attend)
            h = rms_norm(x, lp["ln2"], cfg.rms_eps)
            x = x + _moe_block(cfg, lp, h)
            return x, None

        x, _ = jax.lax.scan(body, x, params["layers"])

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    if lane:
        lane_row = jax.lax.dynamic_index_in_dim(
            x[B_dec:], lane_logit_row, axis=0, keepdims=True)
        x = jnp.concatenate([x[:B_dec], lane_row], axis=0)
    if logits_indices is not None:
        x = jnp.take_along_axis(x, logits_indices[:, None, None], axis=1)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    if isinstance(head, dict):   # int8 lm_head (ops/quant.maybe_int8_dot)
        from ..ops.quant import int8_matmul

        logits = int8_matmul(x, head["q"], head["scales"]).astype(jnp.float32)
    else:
        logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    return (logits, (k_pages, v_pages) if serving else None)
