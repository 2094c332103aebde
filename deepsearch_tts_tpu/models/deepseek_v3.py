"""DeepSeek-V3 / Kimi-K2 family: Multi-head Latent Attention (MLA) + shared
+ grouped-sigmoid-routed MoE.

The reference's auxiliary verifier model is moonshotai/kimi-k2 rented over
OpenRouter (reference README.md:27, model_config/openrouter_price.json);
this module serves that model class in-house.

TPU-first MLA design — *absorbed* weights, latent-only KV cache:

The KV projection compresses to a ``kv_lora_rank`` latent plus one shared
rope key. Instead of expanding per-head K/V (which would make the cache as
big as GQA's), the per-head no-rope key matrix is absorbed into the query
(``q_lat[h] = q_nope[h] @ W_kb[h]``) and the value matrix applied after
attention — so attention runs in MQA form over rows of
``[latent(512) | k_rope(64)]``. The paged cache stores 576 numbers per
token per layer regardless of head count, and the existing paged/flash
attention ops are reused with K=1 (GQA group = all heads) and the true
softmax scale 1/sqrt(qk_nope+qk_rope).

Routing follows DeepSeek-V3 semantics: sigmoid scores + a learned
correction bias for *selection only*, optional group-limited top-k (pick
``topk_group`` device groups by their top-2 score sums, route within),
weights renormalized from the un-biased scores and scaled by
``routed_scaling_factor``; plus always-on shared experts. First
``first_k_dense`` layers use a dense MLP.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops
from ..ops.moe import _expert_ffn_ragged
from ..ops.quant import maybe_int8_dot
from .common import apply_rope, dense_init, rms_norm, rope_angles


@dataclass(frozen=True)
class DeepSeekV3Config:
    vocab_size: int = 129280
    hidden: int = 7168
    n_layers: int = 61
    n_heads: int = 128
    q_lora_rank: int = 1536
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    dense_intermediate: int = 18432
    first_k_dense: int = 3
    n_routed_experts: int = 256
    n_shared_experts: int = 1
    moe_intermediate: int = 2048
    top_k: int = 8
    n_group: int = 8
    topk_group: int = 4
    routed_scaling_factor: float = 2.5
    rope_theta: float = 10_000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    dtype: str = "bfloat16"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    # engine KV-pool layout: MQA-form latent cache. latent_cache tells the
    # engine the model writes/reads ONLY k_pages (one latent row per token);
    # the engine then allocates a 1-page dummy v pool instead of a full one.
    latent_cache: bool = True

    @property
    def n_kv_heads(self) -> int:  # cache heads
        return 1

    @property
    def raw_row_dim(self) -> int:  # latent + rope, the arithmetic width
        return self.kv_lora_rank + self.qk_rope_head_dim

    @property
    def head_dim(self) -> int:
        """Cache ROW width: latent + rope, padded up to the 128-lane TPU
        tile (576 → 640 on real DeepSeek-V3, +11% cache bytes; 288 → 384 on
        the bench config). Unpadded rows made every slot-mode slice
        lane-misaligned and collapsed both slot paths (r3: slot-XLA 909 /
        kernel 377 vs paged 5698 tok/s); rows and pool-facing queries are
        zero-padded so scores and outputs are bit-equivalent."""
        return -(-self.raw_row_dim // 128) * 128

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim


DEEPSEEK_V3_CONFIGS = {
    "deepseek-v3": DeepSeekV3Config(),
    # Kimi-K2: 1T total / 32B active — 64 heads, 384 experts, 1 group
    "kimi-k2": DeepSeekV3Config(n_heads=64, n_routed_experts=384, n_group=1,
                                topk_group=1, first_k_dense=1,
                                rope_theta=50_000.0),
    "deepseek-v3-test": DeepSeekV3Config(
        vocab_size=512, hidden=64, n_layers=3, n_heads=4, q_lora_rank=32,
        kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
        v_head_dim=16, dense_intermediate=128, first_k_dense=1,
        n_routed_experts=8, n_shared_experts=1, moe_intermediate=48,
        top_k=2, n_group=2, topk_group=1, tie_embeddings=True),
}


def init_params(cfg: DeepSeekV3Config, key: jax.Array) -> dict:
    dt = cfg.jnp_dtype
    E, H, L = cfg.hidden, cfg.n_heads, cfg.n_layers
    QL, KL = cfg.q_lora_rank, cfg.kv_lora_rank
    QN, QR, VD = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    NE, F, FD = cfg.n_routed_experts, cfg.moe_intermediate, cfg.dense_intermediate
    SH = cfg.n_shared_experts
    ks = jax.random.split(key, 16)

    LD = cfg.first_k_dense
    LM = L - LD

    def attn_block(base_key, nl):
        k = jax.random.split(base_key, 8)
        def stack(kb, shape):
            keys = jax.random.split(kb, nl)
            return jnp.stack([dense_init(kk, shape, dtype=dt) for kk in keys])
        return {
            "ln1": jnp.ones((nl, E), dt), "ln2": jnp.ones((nl, E), dt),
            "w_qa": stack(k[0], (E, QL)),
            "q_a_norm": jnp.ones((nl, QL), dt),
            "w_qb": stack(k[1], (QL, H * (QN + QR))),
            "w_kva": stack(k[2], (E, KL + QR)),
            "kv_a_norm": jnp.ones((nl, KL), dt),
            "w_kb": stack(k[3], (KL, H * QN)),
            "w_vb": stack(k[4], (KL, H * VD)),
            "wo": stack(k[5], (H * VD, E)),
        }

    def stack_n(kb, nl, shape):
        keys = jax.random.split(kb, nl)
        return jnp.stack([dense_init(kk, shape, dtype=dt) for kk in keys])

    def expert_stack_n(kb, nl, shape):
        keys = jax.random.split(kb, nl)
        return jnp.stack([
            jnp.stack([dense_init(jax.random.fold_in(k, e), shape, dtype=dt)
                       for e in range(NE)]) for k in keys
        ])

    dense_layers = attn_block(ks[1], LD)
    dense_layers.update({
        "d_gate": stack_n(ks[7], LD, (E, FD)),
        "d_up": stack_n(ks[8], LD, (E, FD)),
        "d_down": stack_n(ks[9], LD, (FD, E)),
    })
    moe_layers = attn_block(ks[2], LM)
    moe_layers.update({
        "router": stack_n(ks[10], LM, (E, NE)),
        "router_bias": jnp.zeros((LM, NE), jnp.float32),
        "w_gate": expert_stack_n(ks[11], LM, (E, F)),
        "w_up": expert_stack_n(ks[12], LM, (E, F)),
        "w_down": expert_stack_n(ks[13], LM, (F, E)),
        "s_gate": stack_n(ks[14], LM, (E, F * SH)),
        "s_up": stack_n(ks[15], LM, (E, F * SH)),
        "s_down": stack_n(jax.random.fold_in(ks[15], 1), LM, (F * SH, E)),
    })
    params = {
        "embed": dense_init(ks[0], (cfg.vocab_size, E), in_axis=1, dtype=dt),
        "final_norm": jnp.ones((E,), dt),
        "dense_layers": dense_layers,
        "moe_layers": moe_layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense_init(jax.random.fold_in(ks[0], 1),
                                       (E, cfg.vocab_size), dtype=dt)
    return params


def logical_axes(cfg: DeepSeekV3Config) -> dict:
    attn = {
        "ln1": ("layer", "embed"), "ln2": ("layer", "embed"),
        "w_qa": ("layer", "embed", None), "q_a_norm": ("layer", None),
        "w_qb": ("layer", None, "heads"),
        "w_kva": ("layer", "embed", None), "kv_a_norm": ("layer", None),
        "w_kb": ("layer", None, "heads"), "w_vb": ("layer", None, "heads"),
        "wo": ("layer", "heads", "embed"),
    }
    dense = dict(attn, **{
        "d_gate": ("layer", "embed", "mlp"), "d_up": ("layer", "embed", "mlp"),
        "d_down": ("layer", "mlp", "embed"),
    })
    moe = dict(attn, **{
        "router": ("layer", "embed", None), "router_bias": ("layer", None),
        "w_gate": ("layer", "expert", "embed", "expert_mlp"),
        "w_up": ("layer", "expert", "embed", "expert_mlp"),
        "w_down": ("layer", "expert", "expert_mlp", "embed"),
        "s_gate": ("layer", "embed", "mlp"), "s_up": ("layer", "embed", "mlp"),
        "s_down": ("layer", "mlp", "embed"),
    })
    tree = {"embed": ("vocab", "embed"), "dense_layers": dense,
            "moe_layers": moe, "final_norm": ("embed",)}
    if not cfg.tie_embeddings:
        tree["lm_head"] = ("embed", "vocab")
    return tree


def route_v3(x, router_w, bias, cfg: DeepSeekV3Config):
    """Sigmoid + bias-corrected, group-limited top-k. Returns (weights [T,k],
    expert ids [T,k])."""
    T = x.shape[0]
    logits = jnp.dot(x, router_w, preferred_element_type=jnp.float32)
    scores = jax.nn.sigmoid(logits)                       # [T, NE]
    sel = scores + bias[None, :]
    if cfg.n_group > 1:
        NE, G = cfg.n_routed_experts, cfg.n_group
        per = NE // G
        grp = sel.reshape(T, G, per)
        grp_score = jnp.sum(jax.lax.top_k(grp, min(2, per))[0], axis=-1)  # [T,G]
        _, top_groups = jax.lax.top_k(grp_score, cfg.topk_group)
        gmask = jnp.zeros((T, G), bool)
        gmask = gmask.at[jnp.arange(T)[:, None], top_groups].set(True)
        sel = jnp.where(jnp.repeat(gmask, per, axis=1), sel, -jnp.inf)
    _, top_e = jax.lax.top_k(sel, cfg.top_k)              # selection by biased
    w = jnp.take_along_axis(scores, top_e, axis=1)        # weights by unbiased
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    return (w * cfg.routed_scaling_factor).astype(jnp.float32), top_e.astype(jnp.int32)


def _moe_v3_routed(cfg: DeepSeekV3Config, lp, x):
    """Routed experts only (ragged over sorted assignments); x: [T, E]."""
    w, top_e = route_v3(x, lp["router"], lp["router_bias"], cfg)

    S = x.shape[0] * cfg.top_k
    flat_e = top_e.reshape(S)
    order = jnp.argsort(flat_e, stable=True)
    inv = jnp.argsort(order, stable=True)
    x_sorted = x[order // cfg.top_k]
    group_sizes = jnp.bincount(flat_e, length=cfg.n_routed_experts).astype(jnp.int32)
    y_sorted = _expert_ffn_ragged(x_sorted, lp["w_gate"], lp["w_up"], lp["w_down"],
                                  group_sizes)
    y = y_sorted[inv].reshape(x.shape[0], cfg.top_k, x.shape[1])
    return jnp.sum(y * w.reshape(-1, cfg.top_k, 1).astype(y.dtype), axis=1)


def _moe_v3(cfg: DeepSeekV3Config, lp, h2):
    """Routed (ragged) + shared experts."""
    B, T, E = h2.shape
    x = h2.reshape(B * T, E)
    routed = _moe_v3_routed(cfg, lp, x)

    g = maybe_int8_dot(x, lp["s_gate"])
    u = maybe_int8_dot(x, lp["s_up"])
    shared = maybe_int8_dot(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                            lp["s_down"])
    return (routed.astype(h2.dtype) + shared.astype(h2.dtype)).reshape(B, T, E)


def _dense_mlp(lp, h2):
    g = maybe_int8_dot(h2, lp["d_gate"])
    u = maybe_int8_dot(h2, lp["d_up"])
    return maybe_int8_dot(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                          lp["d_down"]).astype(h2.dtype)


def _mla_qk(cfg: DeepSeekV3Config, lp, h, cos, sin):
    """Queries in absorbed (latent) space + new cache rows for this chunk.

    Returns q_eff [B,T,H,KL+QR] and cache_rows [B,T,1,KL+QR].
    """
    B, T, E = h.shape
    H, KL = cfg.n_heads, cfg.kv_lora_rank
    QN, QR = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim

    qa = rms_norm(maybe_int8_dot(h, lp["w_qa"]), lp["q_a_norm"], cfg.rms_eps)
    q = maybe_int8_dot(qa, lp["w_qb"])
    q = q.reshape(B, T, H, QN + QR)
    q_nope, q_rope = q[..., :QN], q[..., QN:]
    q_rope = apply_rope(q_rope, cos, sin)

    # absorb W_kb: q_lat[b,t,h,l] = sum_n q_nope[b,t,h,n] * W_kb[l, h, n]
    w_kb = lp["w_kb"].reshape(KL, H, QN)
    q_lat = jnp.einsum("bthn,lhn->bthl", q_nope.astype(jnp.float32),
                       w_kb.astype(jnp.float32)).astype(h.dtype)
    q_eff = jnp.concatenate([q_lat, q_rope.astype(h.dtype)], axis=-1)

    kva = maybe_int8_dot(h, lp["w_kva"])
    latent = rms_norm(kva[..., :KL], lp["kv_a_norm"], cfg.rms_eps)
    k_rope = apply_rope(kva[..., None, KL:], cos, sin)        # [B,T,1,QR]
    rows = jnp.concatenate([latent[..., None, :], k_rope.astype(h.dtype)], axis=-1)
    return q_eff, rows


def _mla_out(cfg: DeepSeekV3Config, lp, attn_lat, x_dtype):
    """attn over latent rows [B,T,H,KL] → per-head value up-proj → wo."""
    B, T, H, KL = attn_lat.shape
    VD = cfg.v_head_dim
    w_vb = lp["w_vb"].reshape(KL, H, VD)
    out = jnp.einsum("bthl,lhv->bthv", attn_lat.astype(jnp.float32),
                     w_vb.astype(jnp.float32)).astype(x_dtype)
    return maybe_int8_dot(out.reshape(B, T, H * VD), lp["wo"]).astype(x_dtype)


def forward(
    params: dict,
    cfg: DeepSeekV3Config,
    tokens: jax.Array,
    positions: jax.Array,
    *,
    k_pages: jax.Array | None = None,
    v_pages: jax.Array | None = None,   # unused (MLA caches latent in k_pages)
    page_table: jax.Array | None = None,
    seq_lens: jax.Array | None = None,
    logits_indices: jax.Array | None = None,
    impl: str = "xla",
    slot_decode: bool = False,
    slot_ctx: int | None = None,  # static context-bucket slice (see qwen3.py)
    fresh_prefill: bool = False,
    ring_mesh=None,
    ring_axis: str = "tp",
    fused_decode: bool = False,  # T=1: Pallas MLP-side kernels
):
    """Same serving/training contract as models/qwen3.forward, except the
    cache is latent-only: rows go into k_pages exclusively and v_pages is
    threaded through untouched (the engine allocates it as a 1-page dummy).

    ``fused_decode``: the dense-layer MLPs and the MoE layers' shared
    experts run as one fused Pallas kernel each (ops/fused_layer.
    fused_mlp_stacked, layer-selected by scalar prefetch). MLA's two-stage
    latent attention stays on XLA — its ops are large einsums, not the
    small-op chains the kernels exist to collapse."""
    from ..engine.kvcache import write_rows_flat

    serving = k_pages is not None
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_angles(jnp.maximum(positions, 0), cfg.qk_rope_head_dim,
                           cfg.rope_theta)
    scale = cfg.qk_head_dim ** -0.5
    KL = cfg.kv_lora_rank
    LD = cfg.first_k_dense

    N = k_pages.shape[1] if serving else 0
    if serving and slot_decode:
        page_table = jnp.arange(tokens.shape[0], dtype=jnp.int32)[:, None]

    use_fused = fused_decode and serving and tokens.shape[1] == 1 \
        and not fresh_prefill

    def make_body(tail_fn, serving):
        def body(carry, lp):
            if serving:
                x, kpf, layer = carry
            else:
                x = carry
            h = rms_norm(x, lp["ln1"], cfg.rms_eps)
            q_eff, rows = _mla_qk(cfg, lp, h, cos, sin)
            if serving and cfg.head_dim != cfg.raw_row_dim:
                # zero-pad rows + queries to the 128-lane cache row width
                # (cfg.head_dim docstring): scores gain exact zeros, the
                # value part ([..., :KL]) is untouched — bit-equivalent
                padw = cfg.head_dim - cfg.raw_row_dim
                q_eff = jnp.pad(q_eff, ((0, 0),) * 3 + ((0, padw),))
                rows = jnp.pad(rows, ((0, 0),) * 3 + ((0, padw),))
            if serving:
                table_l = page_table + layer * N
                kpf = write_rows_flat(kpf, rows, positions, table_l)
                if fresh_prefill:
                    attn = attn_ops.causal_attention(
                        q_eff, rows, rows[..., :KL], scale=scale,
                        impl=impl if impl == "ring" else "xla",
                        ring_mesh=ring_mesh, ring_axis=ring_axis)
                elif slot_decode:
                    # cache rows are padded to the 128-lane tile
                    # (cfg.head_dim), so the slot paths tile cleanly — the
                    # r3 gate for misaligned latent rows is gone
                    if impl == "pallas" and q_eff.shape[1] == 1:
                        # shared-pool slot kernel: MLA's latent rows are
                        # both k and v, so one context DMA feeds both
                        # contractions (ops/slot_attention.py)
                        from ..ops.slot_attention import slot_attention

                        limit = jnp.minimum(
                            seq_lens, jnp.maximum(positions[:, 0], 0) + 1)
                        attn = slot_attention(
                            q_eff[:, 0], kpf, None, limit, layer, n_rows=N,
                            slot_ctx=(slot_ctx if slot_ctx is not None
                                      else kpf.shape[1]),
                            scale=scale)[:, None, :, :KL]
                    else:
                        k_ctx = jax.lax.dynamic_slice_in_dim(
                            kpf, layer * N, N, 0)
                        if slot_ctx is not None:
                            k_ctx = k_ctx[:, :slot_ctx]
                        attn = attn_ops.masked_context_attention(
                            q_eff, k_ctx, k_ctx, seq_lens,
                            jnp.maximum(positions, 0), scale=scale)[..., :KL]
                elif q_eff.shape[1] > 1:
                    # re-prefill: latent prefix read pre-write + in-register
                    # chunk rows (see models/qwen3.py / ops/attention.py);
                    # rows serve as both k and v
                    Bq, P = q_eff.shape[0], table_l.shape[1]
                    ps_ = kpf.shape[1]
                    old = attn_ops.gather_kv_rows(kpf, table_l).reshape(
                        Bq, P * ps_, 1, cfg.head_dim)
                    attn = attn_ops.prefix_chunk_attention(
                        q_eff, old, old, rows, rows, positions[:, 0],
                        positions, scale=scale)[..., :KL]
                else:
                    attn = attn_ops.paged_attention(
                        q_eff, kpf, kpf, table_l, seq_lens,
                        jnp.maximum(positions, 0), scale=scale, impl=impl,
                    )[..., :KL]
            else:
                attn = attn_ops.causal_attention(
                    q_eff, rows, rows[..., :KL], scale=scale, impl="xla")
            x = x + _mla_out(cfg, lp, attn, x.dtype)
            x = tail_fn(lp, x, layer if serving else None)
            return ((x, kpf, layer + 1) if serving else x), None
        return body

    def plain_tail(mlp_fn):
        def tail(lp, x, _layer):
            h2 = rms_norm(x, lp["ln2"], cfg.rms_eps)
            return x + mlp_fn(lp, h2)
        return tail

    if use_fused:
        from ..ops.fused_layer import fused_mlp_stacked

        dstack, mstack = params["dense_layers"], params["moe_layers"]

        def dense_tail(lp, x, layer):
            # whole ln2+MLP+residual as one kernel; dense layers lead the
            # stack so the global layer id IS the stack index
            B = x.shape[0]
            return fused_mlp_stacked(
                x[:, 0], dstack["ln2"], dstack["d_gate"], dstack["d_up"],
                dstack["d_down"], layer, eps=cfg.rms_eps)[:, None, :]

        def moe_tail(lp, x, layer):
            B, T, E = x.shape
            h2 = rms_norm(x, lp["ln2"], cfg.rms_eps)
            h2f = h2.reshape(B * T, E)
            routed = _moe_v3_routed(cfg, lp, h2f)
            shared = fused_mlp_stacked(
                h2f, mstack["ln2"], mstack["s_gate"], mstack["s_up"],
                mstack["s_down"], layer - LD, eps=cfg.rms_eps,
                residual=False, norm=False)
            return x + (routed.astype(x.dtype) + shared).reshape(B, T, E)

        dense_body = make_body(dense_tail, serving)
        moe_body = make_body(moe_tail, serving)
    else:
        dense_body = make_body(plain_tail(lambda lp, h2: _dense_mlp(lp, h2)),
                               serving)
        moe_body = make_body(plain_tail(lambda lp, h2: _moe_v3(cfg, lp, h2)),
                             serving)

    if serving:
        L = k_pages.shape[0]
        kpf = k_pages.reshape((L * N,) + k_pages.shape[2:])
        carry = (x, kpf, jnp.zeros((), jnp.int32))
        carry, _ = jax.lax.scan(dense_body, carry, params["dense_layers"])
        (x, kpf, _), _ = jax.lax.scan(moe_body, carry, params["moe_layers"])
        k_pages = kpf.reshape(k_pages.shape)
    else:
        x, _ = jax.lax.scan(dense_body, x, params["dense_layers"])
        x, _ = jax.lax.scan(moe_body, x, params["moe_layers"])

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
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
