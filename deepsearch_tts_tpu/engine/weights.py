"""Weight loading: HF safetensors → this framework's stacked-layer pytrees.

The reference never touches weights (inference is rented over HTTP); this is
the TPU-native replacement. Handles the Qwen3 dense naming scheme
(``model.layers.N.self_attn.q_proj.weight`` etc.), transposes to the
right-multiply convention used by models/qwen3.py, stacks per-layer tensors
along a leading layer axis for the scan-over-layers forward, and casts to
bf16. Falls back to random init when no weights directory is given (tests,
benchmarks).
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _load_safetensors_dir(path: str) -> dict[str, np.ndarray]:
    """Minimal safetensors reader (header = JSON length-prefixed, then raw
    little-endian tensor bytes). No external dependency."""
    import struct

    tensors: dict[str, np.ndarray] = {}
    files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    dtype_map = {
        "F32": np.float32, "F16": np.float16, "BF16": np.uint16,  # bf16 via view
        "I64": np.int64, "I32": np.int32, "U8": np.uint8,
    }
    for fname in sorted(files):
        with open(os.path.join(path, fname), "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen).decode("utf-8"))
            base = 8 + hlen
            for name, meta in header.items():
                if name == "__metadata__":
                    continue
                dt, shape = meta["dtype"], meta["shape"]
                start, end = meta["data_offsets"]
                f.seek(base + start)
                raw = f.read(end - start)
                arr = np.frombuffer(raw, dtype=dtype_map[dt]).reshape(shape)
                if dt == "BF16":
                    # widen bf16 -> f32 via bit shift
                    arr = (arr.astype(np.uint32) << 16).view(np.float32)
                tensors[name] = arr
    return tensors


def convert_qwen3_dense(raw: dict[str, np.ndarray], cfg) -> dict:
    """HF Qwen3 checkpoint → stacked pytree matching models/qwen3.py."""
    L = cfg.n_layers
    dt = jnp.bfloat16

    def get(name):
        return raw[name]

    def stack(fmt, transpose=True):
        mats = []
        for i in range(L):
            w = get(fmt.format(i))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dt)

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dt),
        "final_norm": jnp.asarray(get("model.norm.weight"), dt),
        "layers": {
            "ln1": stack("model.layers.{}.input_layernorm.weight", transpose=False),
            "ln2": stack("model.layers.{}.post_attention_layernorm.weight", transpose=False),
            "q_norm": stack("model.layers.{}.self_attn.q_norm.weight", transpose=False),
            "k_norm": stack("model.layers.{}.self_attn.k_norm.weight", transpose=False),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
    }
    if "lm_head.weight" in raw and not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(raw["lm_head.weight"].T, dt)
    return params


def device_random_params(model_name_or_cfg, seed: int = 0) -> dict:
    """Random init computed ON DEVICE by the family's own ``init_params``
    under a single jit — zero host→device weight transfer.

    The host path (:func:`fast_random_params`) ships the full parameter set
    through the axon tunnel (~60-120s for a 1.5B model); this path compiles
    one init program (a normal remote-compile RTT, served from the
    persistent compilation cache on later bring-ups) and materializes the
    weights at HBM speed. Preferred for TPU bench/probe bring-up."""
    from ..models.registry import get_model

    if isinstance(model_name_or_cfg, str):
        fam = get_model(model_name_or_cfg)
        cfg, init = fam.config, fam.init_params
    else:
        cfg = model_name_or_cfg
        from ..models import deepseek_v3, qwen3, qwen3_moe

        init = (deepseek_v3.init_params if hasattr(cfg, "kv_lora_rank")
                else qwen3_moe.init_params if hasattr(cfg, "n_experts")
                else qwen3.init_params)
    return jax.jit(lambda key: init(cfg, key))(jax.random.PRNGKey(seed))


def fast_random_params(model_name_or_cfg, seed: int = 0) -> dict:
    """Host-side (numpy) random init, transferred to device as bf16.

    jax-random per-parameter init dispatches hundreds of tiny device
    programs — pathological over the axon remote-compile tunnel (each tiny
    op pays a round trip). This path builds everything in numpy, converts to
    bfloat16 ON HOST (a device-side convert would itself be a compiled
    program per distinct shape, and would double the bytes through the
    tunnel), and transfers raw buffers only. Deterministic per seed."""
    import ml_dtypes

    from ..models.registry import get_model

    if isinstance(model_name_or_cfg, str):
        cfg = get_model(model_name_or_cfg).config
    else:
        cfg = model_name_or_cfg
    rng = np.random.default_rng(seed)
    E, H, K, D, L = cfg.hidden, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.n_layers
    np_bf16 = np.dtype(ml_dtypes.bfloat16)

    def mk(*shape, fan_in=None):
        fan = fan_in if fan_in is not None else shape[-2] if len(shape) > 1 else shape[-1]
        a = rng.standard_normal(shape, dtype=np.float32) * np.float32(fan ** -0.5)
        return jnp.asarray(a.astype(np_bf16))

    def ones(*shape):
        return jnp.asarray(np.ones(shape, np_bf16))

    if hasattr(cfg, "kv_lora_rank"):  # DeepSeek-V3/Kimi MLA family
        QL, KL = cfg.q_lora_rank, cfg.kv_lora_rank
        QN, QR, VD = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
        NE, F, FD = (cfg.n_routed_experts, cfg.moe_intermediate,
                     cfg.dense_intermediate)
        SH = cfg.n_shared_experts
        LD = cfg.first_k_dense
        LM = L - LD

        def attn(nl):
            return {
                "ln1": ones(nl, E),
                "ln2": ones(nl, E),
                "w_qa": mk(nl, E, QL),
                "q_a_norm": ones(nl, QL),
                "w_qb": mk(nl, QL, H * (QN + QR)),
                "w_kva": mk(nl, E, KL + QR),
                "kv_a_norm": ones(nl, KL),
                "w_kb": mk(nl, KL, H * QN),
                "w_vb": mk(nl, KL, H * VD),
                "wo": mk(nl, H * VD, E),
            }

        dense_layers = attn(LD)
        dense_layers.update({
            "d_gate": mk(LD, E, FD), "d_up": mk(LD, E, FD),
            "d_down": mk(LD, FD, E),
        })
        moe_layers = attn(LM)
        moe_layers.update({
            "router": mk(LM, E, NE),
            "router_bias": jnp.asarray(np.zeros((LM, NE), np.float32)),
            "w_gate": mk(LM, NE, E, F, fan_in=E),
            "w_up": mk(LM, NE, E, F, fan_in=E),
            "w_down": mk(LM, NE, F, E, fan_in=F),
            "s_gate": mk(LM, E, F * SH), "s_up": mk(LM, E, F * SH),
            "s_down": mk(LM, F * SH, E),
        })
        params = {
            "embed": mk(cfg.vocab_size, E, fan_in=E),
            "final_norm": ones(E,),
            "dense_layers": dense_layers,
            "moe_layers": moe_layers,
        }
        if not cfg.tie_embeddings:
            params["lm_head"] = mk(E, cfg.vocab_size)
        return params

    layers = {
        "ln1": ones(L, E),
        "ln2": ones(L, E),
        "q_norm": ones(L, D),
        "k_norm": ones(L, D),
        "wq": mk(L, E, H * D), "wk": mk(L, E, K * D), "wv": mk(L, E, K * D),
        "wo": mk(L, H * D, E),
    }
    if hasattr(cfg, "n_experts"):     # Qwen3-MoE family
        NE, F = cfg.n_experts, cfg.moe_intermediate
        layers.update({
            "router": mk(L, E, NE),
            "w_gate": mk(L, NE, E, F, fan_in=E),
            "w_up": mk(L, NE, E, F, fan_in=E),
            "w_down": mk(L, NE, F, E, fan_in=F),
        })
    else:
        F = cfg.intermediate
        layers.update({
            "w_gate": mk(L, E, F), "w_up": mk(L, E, F), "w_down": mk(L, F, E),
        })
    params = {
        "embed": mk(cfg.vocab_size, E, fan_in=E),
        "final_norm": ones(E,),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = mk(E, cfg.vocab_size)
    return params


def convert_qwen3_moe(raw: dict[str, np.ndarray], cfg) -> dict:
    """HF Qwen3-MoE checkpoint → stacked pytree (models/qwen3_moe.py)."""
    L, NE = cfg.n_layers, cfg.n_experts
    dt = jnp.bfloat16

    def stack(fmt, transpose=True):
        mats = [raw[fmt.format(i)] for i in range(L)]
        return jnp.asarray(np.stack([m.T if transpose else m for m in mats]), dt)

    def experts(fmt):
        out = []
        for i in range(L):
            out.append(np.stack([raw[fmt.format(i, e)].T for e in range(NE)]))
        return jnp.asarray(np.stack(out), dt)

    params = {
        "embed": jnp.asarray(raw["model.embed_tokens.weight"], dt),
        "final_norm": jnp.asarray(raw["model.norm.weight"], dt),
        "layers": {
            "ln1": stack("model.layers.{}.input_layernorm.weight", False),
            "ln2": stack("model.layers.{}.post_attention_layernorm.weight", False),
            "q_norm": stack("model.layers.{}.self_attn.q_norm.weight", False),
            "k_norm": stack("model.layers.{}.self_attn.k_norm.weight", False),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "router": stack("model.layers.{}.mlp.gate.weight"),
            "w_gate": experts("model.layers.{}.mlp.experts.{}.gate_proj.weight"),
            "w_up": experts("model.layers.{}.mlp.experts.{}.up_proj.weight"),
            "w_down": experts("model.layers.{}.mlp.experts.{}.down_proj.weight"),
        },
    }
    if "lm_head.weight" in raw and not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(raw["lm_head.weight"].T, dt)
    return params


def _deinterleave_rope_cols(w: np.ndarray, r: int) -> np.ndarray:
    """Permute the last ``r`` columns from interleaved (x0,y0,x1,y1,...) to
    half-split (x0,x1,...,y0,y1,...) rope layout.

    Published DeepSeek-V3/Kimi-K2 checkpoints store the rope dims of
    q_b_proj / kv_a_proj_with_mqa interleaved; HF's modeling_deepseek
    un-interleaves the activations at runtime (view(d//2, 2).transpose)
    before rotate_half, and vLLM loads these models with
    is_neox_style=False. Our apply_rope is neox (half-split), so the
    permutation is folded into the weights once at conversion time.
    """
    perm = np.concatenate([np.arange(0, r, 2), np.arange(1, r, 2)])
    out = np.array(w)
    out[..., -r:] = out[..., -r:][..., perm]
    return out


def convert_deepseek_v3(raw: dict[str, np.ndarray], cfg) -> dict:
    """HF DeepSeek-V3/Kimi-K2 checkpoint → two-stack MLA pytree.

    Splits kv_b_proj into the key (absorbed) and value up-projections and
    partitions layers into dense (first_k_dense) and MoE stacks. Rope
    columns of w_qb / w_kva are de-interleaved to neox layout (see
    :func:`_deinterleave_rope_cols`).
    """
    dt = jnp.bfloat16
    H = cfg.n_heads
    QN, VD, KL = cfg.qk_nope_head_dim, cfg.v_head_dim, cfg.kv_lora_rank
    QR = cfg.qk_rope_head_dim
    LD, L = cfg.first_k_dense, cfg.n_layers
    NE, SH = cfg.n_routed_experts, cfg.n_shared_experts

    def g(i, name):
        return raw[f"model.layers.{i}.{name}"]

    def attn_stack(layers):
        out = {k: [] for k in ("ln1", "ln2", "w_qa", "q_a_norm", "w_qb",
                               "w_kva", "kv_a_norm", "w_kb", "w_vb", "wo")}
        for i in layers:
            out["ln1"].append(g(i, "input_layernorm.weight"))
            out["ln2"].append(g(i, "post_attention_layernorm.weight"))
            out["w_qa"].append(g(i, "self_attn.q_a_proj.weight").T)
            out["q_a_norm"].append(g(i, "self_attn.q_a_layernorm.weight"))
            qb = g(i, "self_attn.q_b_proj.weight").T  # [QL, H*(QN+QR)]
            qb = _deinterleave_rope_cols(
                qb.reshape(qb.shape[0], H, QN + QR), QR
            ).reshape(qb.shape)
            out["w_qb"].append(qb)
            out["w_kva"].append(_deinterleave_rope_cols(
                g(i, "self_attn.kv_a_proj_with_mqa.weight").T, QR))
            out["kv_a_norm"].append(g(i, "self_attn.kv_a_layernorm.weight"))
            kvb = g(i, "self_attn.kv_b_proj.weight").T.reshape(KL, H, QN + VD)
            out["w_kb"].append(kvb[:, :, :QN].reshape(KL, H * QN))
            out["w_vb"].append(kvb[:, :, QN:].reshape(KL, H * VD))
            out["wo"].append(g(i, "self_attn.o_proj.weight").T)
        return {k: jnp.asarray(np.stack(v), dt) for k, v in out.items()}

    dense = attn_stack(range(LD))
    dense.update({
        "d_gate": jnp.asarray(np.stack(
            [g(i, "mlp.gate_proj.weight").T for i in range(LD)]), dt),
        "d_up": jnp.asarray(np.stack(
            [g(i, "mlp.up_proj.weight").T for i in range(LD)]), dt),
        "d_down": jnp.asarray(np.stack(
            [g(i, "mlp.down_proj.weight").T for i in range(LD)]), dt),
    })
    moe = attn_stack(range(LD, L))
    moe.update({
        "router": jnp.asarray(np.stack(
            [g(i, "mlp.gate.weight").T for i in range(LD, L)]), dt),
        "router_bias": jnp.asarray(np.stack(
            [g(i, "mlp.gate.e_score_correction_bias") for i in range(LD, L)]),
            jnp.float32),
        "w_gate": jnp.asarray(np.stack(
            [np.stack([g(i, f"mlp.experts.{e}.gate_proj.weight").T
                       for e in range(NE)]) for i in range(LD, L)]), dt),
        "w_up": jnp.asarray(np.stack(
            [np.stack([g(i, f"mlp.experts.{e}.up_proj.weight").T
                       for e in range(NE)]) for i in range(LD, L)]), dt),
        "w_down": jnp.asarray(np.stack(
            [np.stack([g(i, f"mlp.experts.{e}.down_proj.weight").T
                       for e in range(NE)]) for i in range(LD, L)]), dt),
        "s_gate": jnp.asarray(np.stack(
            [g(i, "mlp.shared_experts.gate_proj.weight").T
             for i in range(LD, L)]), dt),
        "s_up": jnp.asarray(np.stack(
            [g(i, "mlp.shared_experts.up_proj.weight").T
             for i in range(LD, L)]), dt),
        "s_down": jnp.asarray(np.stack(
            [g(i, "mlp.shared_experts.down_proj.weight").T
             for i in range(LD, L)]), dt),
    })
    params = {
        "embed": jnp.asarray(raw["model.embed_tokens.weight"], dt),
        "final_norm": jnp.asarray(raw["model.norm.weight"], dt),
        "dense_layers": dense,
        "moe_layers": moe,
    }
    if "lm_head.weight" in raw and not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(raw["lm_head.weight"].T, dt)
    return params


def pack_matmul_params(params: dict) -> dict:
    """Fuse per-layer QKV (and dense gate/up) weights into single matmuls.

    Decode at batch<=64 is launch-overhead-bound per layer: three [B,E]@[E,*]
    projections cost three MXU ops' fixed overhead for the same bytes as
    one. Packing is numerically identity (a concat over output columns) and
    is applied by the engine for single-chip serving only — TP sharding of
    a packed matrix would split q/k/v unevenly across chips. Models accept
    either layout (``wqkv`` / ``w_gateup`` keys take priority when present).
    """
    if "layers" not in params:
        return params  # MLA families keep two-stage projections
    lp = dict(params["layers"])
    if all(k in lp and isinstance(lp[k], jnp.ndarray) for k in ("wq", "wk", "wv")):
        lp["wqkv"] = jnp.concatenate(
            [lp.pop("wq"), lp.pop("wk"), lp.pop("wv")], axis=-1)
    if ("w_gate" in lp and isinstance(lp["w_gate"], jnp.ndarray)
            and lp["w_gate"].ndim in (3, 4)):  # dense [L,E,F] or expert
        # stacks [L,NE,E,F] — packed gate|up halves the ragged_dot count
        lp["w_gateup"] = jnp.concatenate(
            [lp.pop("w_gate"), lp.pop("w_up")], axis=-1)
    out = dict(params)
    out["layers"] = lp
    return out


def unpack_matmul_params(params: dict, cfg) -> dict:
    """Inverse of :func:`pack_matmul_params` (plain-array weights only)."""
    if "layers" not in params:
        return params
    lp = dict(params["layers"])
    if "wqkv" in lp:
        w = lp.pop("wqkv")
        if isinstance(w, dict):
            raise ValueError("cannot unpack int8-quantized packed weights")
        hd = cfg.n_heads * cfg.head_dim
        kd = cfg.n_kv_heads * cfg.head_dim
        lp["wq"], lp["wk"], lp["wv"] = (
            w[..., :hd], w[..., hd:hd + kd], w[..., hd + kd:])
    if "w_gateup" in lp:
        w = lp.pop("w_gateup")
        if isinstance(w, dict):
            raise ValueError("cannot unpack int8-quantized packed weights")
        F = w.shape[-1] // 2
        lp["w_gate"], lp["w_up"] = w[..., :F], w[..., F:]
    out = dict(params)
    out["layers"] = lp
    return out


def load_or_init_params(model_name: str, weights_path: str = "",
                        seed: int = 0) -> tuple[dict, str]:
    """Return (params, resolved model name). Random init when no weights."""
    from ..models.registry import get_model

    fam = get_model(model_name)
    if weights_path:
        raw = _load_safetensors_dir(weights_path)
        cfg = fam.config
        if hasattr(cfg, "kv_lora_rank"):
            return convert_deepseek_v3(raw, cfg), fam.name
        if hasattr(cfg, "n_experts"):
            return convert_qwen3_moe(raw, cfg), fam.name
        return convert_qwen3_dense(raw, cfg), fam.name
    cfg = fam.config
    if getattr(cfg, "custom_init", False):
        # registry-extension families (scripted test models, external
        # plugins) own their init — don't assume qwen3-shaped attributes
        return fam.init_params(cfg, jax.random.PRNGKey(seed)), fam.name
    if not hasattr(cfg, "n_experts") and not hasattr(cfg, "kv_lora_rank"):
        # dense: host-side bulk init — per-parameter jax.random dispatches
        # hundreds of tiny device programs (pathological over remote compile)
        return fast_random_params(cfg, seed=seed), fam.name
    return fam.init_params(cfg, jax.random.PRNGKey(seed)), fam.name
