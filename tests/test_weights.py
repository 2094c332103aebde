"""Checkpoint conversion: synthetic HF-format safetensors → our pytrees →
forward runs and matches expected shapes."""
import json
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _write_safetensors(path, tensors):
    header = {}
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        raw = arr.astype(np.float32).tobytes()
        header[name] = {"dtype": "F32", "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        blobs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


def _dense_ckpt(cfg):
    rng = np.random.default_rng(0)
    t = {}
    E, H, K, D, F = cfg.hidden, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.intermediate
    t["model.embed_tokens.weight"] = rng.standard_normal((cfg.vocab_size, E)) * 0.02
    t["model.norm.weight"] = np.ones((E,))
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones((E,))
        t[p + "post_attention_layernorm.weight"] = np.ones((E,))
        t[p + "self_attn.q_norm.weight"] = np.ones((D,))
        t[p + "self_attn.k_norm.weight"] = np.ones((D,))
        t[p + "self_attn.q_proj.weight"] = rng.standard_normal((H * D, E)) * 0.02
        t[p + "self_attn.k_proj.weight"] = rng.standard_normal((K * D, E)) * 0.02
        t[p + "self_attn.v_proj.weight"] = rng.standard_normal((K * D, E)) * 0.02
        t[p + "self_attn.o_proj.weight"] = rng.standard_normal((E, H * D)) * 0.02
        t[p + "mlp.gate_proj.weight"] = rng.standard_normal((F, E)) * 0.02
        t[p + "mlp.up_proj.weight"] = rng.standard_normal((F, E)) * 0.02
        t[p + "mlp.down_proj.weight"] = rng.standard_normal((E, F)) * 0.02
    return t


def test_dense_roundtrip(tmp_path):
    from deepsearch_tts_tpu.engine.weights import load_or_init_params
    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, forward

    cfg = QWEN3_CONFIGS["qwen3-test"]
    _write_safetensors(tmp_path / "model.safetensors", _dense_ckpt(cfg))
    params, name = load_or_init_params("qwen3-test", str(tmp_path))
    assert params["layers"]["wq"].shape == (cfg.n_layers, cfg.hidden,
                                            cfg.n_heads * cfg.head_dim)
    assert params["layers"]["wq"].dtype == jnp.bfloat16
    tokens = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    logits, _ = forward(params, cfg, tokens, pos)
    assert bool(jnp.isfinite(logits).all())


def test_transpose_convention(tmp_path):
    """HF stores [out, in]; our convention is [in, out] (x @ W)."""
    from deepsearch_tts_tpu.engine.weights import _load_safetensors_dir, convert_qwen3_dense
    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS

    cfg = QWEN3_CONFIGS["qwen3-test"]
    ckpt = _dense_ckpt(cfg)
    _write_safetensors(tmp_path / "m.safetensors", ckpt)
    raw = _load_safetensors_dir(str(tmp_path))
    params = convert_qwen3_dense(raw, cfg)
    hf_wq = ckpt["model.layers.0.self_attn.q_proj.weight"]  # [H*D, E]
    np.testing.assert_allclose(
        np.asarray(params["layers"]["wq"][0], np.float32), hf_wq.T.astype(np.float32),
        rtol=1e-2, atol=1e-2)


def _moe_ckpt(cfg):
    rng = np.random.default_rng(1)
    E, H, K, D = cfg.hidden, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    NE, F = cfg.n_experts, cfg.moe_intermediate
    t = {"model.embed_tokens.weight": rng.standard_normal((cfg.vocab_size, E)) * 0.02,
         "model.norm.weight": np.ones((E,))}
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones((E,))
        t[p + "post_attention_layernorm.weight"] = np.ones((E,))
        t[p + "self_attn.q_norm.weight"] = np.ones((D,))
        t[p + "self_attn.k_norm.weight"] = np.ones((D,))
        t[p + "self_attn.q_proj.weight"] = rng.standard_normal((H * D, E)) * 0.02
        t[p + "self_attn.k_proj.weight"] = rng.standard_normal((K * D, E)) * 0.02
        t[p + "self_attn.v_proj.weight"] = rng.standard_normal((K * D, E)) * 0.02
        t[p + "self_attn.o_proj.weight"] = rng.standard_normal((E, H * D)) * 0.02
        t[p + "mlp.gate.weight"] = rng.standard_normal((NE, E)) * 0.02
        for e in range(NE):
            q = f"{p}mlp.experts.{e}."
            t[q + "gate_proj.weight"] = rng.standard_normal((F, E)) * 0.02
            t[q + "up_proj.weight"] = rng.standard_normal((F, E)) * 0.02
            t[q + "down_proj.weight"] = rng.standard_normal((E, F)) * 0.02
    return t


def test_moe_roundtrip(tmp_path):
    """convert_qwen3_moe: shapes, transpose convention, finite forward
    (regression: the MoE converter had zero coverage in r1)."""
    from deepsearch_tts_tpu.engine.weights import (_load_safetensors_dir,
                                                   convert_qwen3_moe)
    from deepsearch_tts_tpu.models.qwen3_moe import QWEN3_MOE_CONFIGS, forward

    cfg = QWEN3_MOE_CONFIGS["qwen3-moe-test"]
    ckpt = _moe_ckpt(cfg)
    _write_safetensors(tmp_path / "m.safetensors", ckpt)
    params = convert_qwen3_moe(_load_safetensors_dir(str(tmp_path)), cfg)
    L, NE, E, F = cfg.n_layers, cfg.n_experts, cfg.hidden, cfg.moe_intermediate
    assert params["layers"]["w_gate"].shape == (L, NE, E, F)
    assert params["layers"]["router"].shape == (L, E, NE)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["router"][0], np.float32),
        ckpt["model.layers.0.mlp.gate.weight"].T.astype(np.float32), atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["w_down"][1][3], np.float32),
        ckpt["model.layers.1.mlp.experts.3.down_proj.weight"].T.astype(np.float32),
        atol=1e-2)
    tokens = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    logits, _ = forward(params, cfg, tokens, pos)
    assert bool(jnp.isfinite(logits).all())


def _mla_ckpt(cfg):
    rng = np.random.default_rng(2)
    E, H = cfg.hidden, cfg.n_heads
    QL, KL = cfg.q_lora_rank, cfg.kv_lora_rank
    QN, QR, VD = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    NE, F, FD, SH = (cfg.n_routed_experts, cfg.moe_intermediate,
                     cfg.dense_intermediate, cfg.n_shared_experts)
    t = {"model.embed_tokens.weight": rng.standard_normal((cfg.vocab_size, E)) * 0.02,
         "model.norm.weight": np.ones((E,))}
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones((E,))
        t[p + "post_attention_layernorm.weight"] = np.ones((E,))
        t[p + "self_attn.q_a_proj.weight"] = rng.standard_normal((QL, E)) * 0.02
        t[p + "self_attn.q_a_layernorm.weight"] = np.ones((QL,))
        t[p + "self_attn.q_b_proj.weight"] = rng.standard_normal((H * (QN + QR), QL)) * 0.02
        t[p + "self_attn.kv_a_proj_with_mqa.weight"] = rng.standard_normal((KL + QR, E)) * 0.02
        t[p + "self_attn.kv_a_layernorm.weight"] = np.ones((KL,))
        t[p + "self_attn.kv_b_proj.weight"] = rng.standard_normal((H * (QN + VD), KL)) * 0.02
        t[p + "self_attn.o_proj.weight"] = rng.standard_normal((E, H * VD)) * 0.02
        if i < cfg.first_k_dense:
            t[p + "mlp.gate_proj.weight"] = rng.standard_normal((FD, E)) * 0.02
            t[p + "mlp.up_proj.weight"] = rng.standard_normal((FD, E)) * 0.02
            t[p + "mlp.down_proj.weight"] = rng.standard_normal((E, FD)) * 0.02
        else:
            t[p + "mlp.gate.weight"] = rng.standard_normal((NE, E)) * 0.02
            t[p + "mlp.gate.e_score_correction_bias"] = rng.standard_normal((NE,)) * 0.1
            for e in range(NE):
                q = f"{p}mlp.experts.{e}."
                t[q + "gate_proj.weight"] = rng.standard_normal((F, E)) * 0.02
                t[q + "up_proj.weight"] = rng.standard_normal((F, E)) * 0.02
                t[q + "down_proj.weight"] = rng.standard_normal((E, F)) * 0.02
            t[p + "mlp.shared_experts.gate_proj.weight"] = rng.standard_normal((F * SH, E)) * 0.02
            t[p + "mlp.shared_experts.up_proj.weight"] = rng.standard_normal((F * SH, E)) * 0.02
            t[p + "mlp.shared_experts.down_proj.weight"] = rng.standard_normal((E, F * SH)) * 0.02
    return t


def test_mla_roundtrip(tmp_path):
    """convert_deepseek_v3: kv_b split, stacks, finite forward (regression:
    the MLA converter had zero coverage in r1)."""
    from deepsearch_tts_tpu.engine.weights import (_load_safetensors_dir,
                                                   convert_deepseek_v3)
    from deepsearch_tts_tpu.models.deepseek_v3 import DEEPSEEK_V3_CONFIGS, forward

    cfg = DEEPSEEK_V3_CONFIGS["deepseek-v3-test"]
    ckpt = _mla_ckpt(cfg)
    _write_safetensors(tmp_path / "m.safetensors", ckpt)
    params = convert_deepseek_v3(_load_safetensors_dir(str(tmp_path)), cfg)
    H, KL = cfg.n_heads, cfg.kv_lora_rank
    QN, VD = cfg.qk_nope_head_dim, cfg.v_head_dim
    LD, LM = cfg.first_k_dense, cfg.n_layers - cfg.first_k_dense
    assert params["dense_layers"]["w_kb"].shape == (LD, KL, H * QN)
    assert params["moe_layers"]["w_vb"].shape == (LM, KL, H * VD)
    # kv_b split: w_kb row r, head h must equal kv_b rows for head h's K part
    kvb = ckpt["model.layers.0.self_attn.kv_b_proj.weight"].T.reshape(KL, H, QN + VD)
    np.testing.assert_allclose(
        np.asarray(params["dense_layers"]["w_kb"][0], np.float32).reshape(KL, H, QN),
        kvb[:, :, :QN].astype(np.float32), atol=1e-2)
    tokens = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    logits, _ = forward(params, cfg, tokens, pos)
    assert bool(jnp.isfinite(logits).all())


def test_mla_rope_deinterleave():
    """The converter's rope column permutation must reproduce HF
    modeling_deepseek's runtime un-interleave (view(d//2,2).transpose) so
    that our neox apply_rope sees the layout HF's rotate_half sees."""
    from deepsearch_tts_tpu.engine.weights import _deinterleave_rope_cols

    rng = np.random.default_rng(3)
    r, n_in = 8, 16
    W = rng.standard_normal((n_in, 4 + r))  # 4 non-rope cols + r rope cols
    x = rng.standard_normal((n_in,))
    raw = x @ W
    # HF runtime un-interleave of the activation's rope dims
    hf_rope = raw[4:].reshape(r // 2, 2).T.reshape(r)
    ours = x @ _deinterleave_rope_cols(W, r)
    np.testing.assert_allclose(ours[4:], hf_rope, rtol=1e-12)
    np.testing.assert_allclose(ours[:4], raw[:4], rtol=1e-12)


def test_convert_qwen3_moe_roundtrip():
    """Synthesize an HF-named raw dict by inverting the converter's mapping
    from our own init_params, convert, and require exact tree equality —
    covers every key, stacking order, and transpose."""
    import numpy as np

    from deepsearch_tts_tpu.engine.weights import convert_qwen3_moe
    from deepsearch_tts_tpu.models.qwen3_moe import QWEN3_MOE_CONFIGS, init_params

    cfg = QWEN3_MOE_CONFIGS["qwen3-moe-test"]
    params = init_params(cfg, jax.random.PRNGKey(1))
    lp = params["layers"]
    raw = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
    }
    name_map = {
        "ln1": ("input_layernorm.weight", False),
        "ln2": ("post_attention_layernorm.weight", False),
        "q_norm": ("self_attn.q_norm.weight", False),
        "k_norm": ("self_attn.k_norm.weight", False),
        "wq": ("self_attn.q_proj.weight", True),
        "wk": ("self_attn.k_proj.weight", True),
        "wv": ("self_attn.v_proj.weight", True),
        "wo": ("self_attn.o_proj.weight", True),
        "router": ("mlp.gate.weight", True),
    }
    for ours, (hf, transpose) in name_map.items():
        for i in range(cfg.n_layers):
            m = np.asarray(lp[ours][i], np.float32)
            raw[f"model.layers.{i}.{hf}"] = m.T if transpose else m
    for ours, hf in (("w_gate", "gate_proj"), ("w_up", "up_proj"),
                     ("w_down", "down_proj")):
        for i in range(cfg.n_layers):
            for e in range(cfg.n_experts):
                raw[f"model.layers.{i}.mlp.experts.{e}.{hf}.weight"] = \
                    np.asarray(lp[ours][i, e], np.float32).T
    if not cfg.tie_embeddings:
        raw["lm_head.weight"] = np.asarray(params["lm_head"], np.float32).T

    out = convert_qwen3_moe(raw, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(out))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        other = flat_b[path]
        assert np.allclose(np.asarray(leaf, np.float32),
                           np.asarray(other, np.float32), atol=1e-2), path


def test_convert_deepseek_v3_roundtrip():
    """Deepseek/Kimi converter: invert the mapping (incl. re-interleaving
    the rope columns and re-merging kv_b) and require the converter to
    reproduce init_params exactly. Covers the HF-interleaved-rope fix
    (reference loaders: vLLM is_neox_style=False for this family)."""
    import numpy as np

    from deepsearch_tts_tpu.engine.weights import convert_deepseek_v3
    from deepsearch_tts_tpu.models.deepseek_v3 import DEEPSEEK_V3_CONFIGS, init_params

    cfg = DEEPSEEK_V3_CONFIGS["deepseek-v3-test"]
    params = init_params(cfg, jax.random.PRNGKey(2))
    H, QN, QR, VD = (cfg.n_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                     cfg.v_head_dim)
    KL, LD, L = cfg.kv_lora_rank, cfg.first_k_dense, cfg.n_layers

    perm = np.concatenate([np.arange(0, QR, 2), np.arange(1, QR, 2)])
    inv = np.argsort(perm)

    def interleave_last(w, r):
        w = np.array(w)
        w[..., -r:] = w[..., -r:][..., inv]
        return w

    raw = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
    }

    def put_attn(stack, layers):
        for j, i in enumerate(layers):
            pre = f"model.layers.{i}."
            raw[pre + "input_layernorm.weight"] = np.asarray(stack["ln1"][j], np.float32)
            raw[pre + "post_attention_layernorm.weight"] = np.asarray(stack["ln2"][j], np.float32)
            raw[pre + "self_attn.q_a_proj.weight"] = np.asarray(stack["w_qa"][j], np.float32).T
            raw[pre + "self_attn.q_a_layernorm.weight"] = np.asarray(stack["q_a_norm"][j], np.float32)
            qb = np.asarray(stack["w_qb"][j], np.float32)
            qb = interleave_last(qb.reshape(qb.shape[0], H, QN + QR), QR
                                 ).reshape(qb.shape)
            raw[pre + "self_attn.q_b_proj.weight"] = qb.T
            raw[pre + "self_attn.kv_a_proj_with_mqa.weight"] = \
                interleave_last(np.asarray(stack["w_kva"][j], np.float32), QR).T
            raw[pre + "self_attn.kv_a_layernorm.weight"] = np.asarray(stack["kv_a_norm"][j], np.float32)
            kb = np.asarray(stack["w_kb"][j], np.float32).reshape(KL, H, QN)
            vb = np.asarray(stack["w_vb"][j], np.float32).reshape(KL, H, VD)
            raw[pre + "self_attn.kv_b_proj.weight"] = \
                np.concatenate([kb, vb], axis=-1).reshape(KL, H * (QN + VD)).T
            raw[pre + "self_attn.o_proj.weight"] = np.asarray(stack["wo"][j], np.float32).T

    dense, moe = params["dense_layers"], params["moe_layers"]
    put_attn(dense, range(LD))
    put_attn(moe, range(LD, L))
    for j, i in enumerate(range(LD)):
        for ours, hf in (("d_gate", "gate_proj"), ("d_up", "up_proj"),
                         ("d_down", "down_proj")):
            raw[f"model.layers.{i}.mlp.{hf}.weight"] = \
                np.asarray(dense[ours][j], np.float32).T
    for j, i in enumerate(range(LD, L)):
        pre = f"model.layers.{i}.mlp."
        raw[pre + "gate.weight"] = np.asarray(moe["router"][j], np.float32).T
        raw[pre + "gate.e_score_correction_bias"] = np.asarray(moe["router_bias"][j], np.float32)
        for e in range(cfg.n_routed_experts):
            for ours, hf in (("w_gate", "gate_proj"), ("w_up", "up_proj"),
                             ("w_down", "down_proj")):
                raw[f"model.layers.{i}.mlp.experts.{e}.{hf}.weight"] = \
                    np.asarray(moe[ours][j, e], np.float32).T
        for ours, hf in (("s_gate", "gate_proj"), ("s_up", "up_proj"),
                         ("s_down", "down_proj")):
            raw[pre + f"shared_experts.{hf}.weight"] = \
                np.asarray(moe[ours][j], np.float32).T
    if not cfg.tie_embeddings:
        raw["lm_head.weight"] = np.asarray(params["lm_head"], np.float32).T

    out = convert_deepseek_v3(raw, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(out))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        assert np.allclose(np.asarray(leaf, np.float32),
                           np.asarray(flat_b[path], np.float32),
                           atol=1e-2), path


# ------------------------------------------------------- golden-logit parity

def _golden_dir(name):
    import os

    return os.path.join(os.path.dirname(__file__), "fixtures", "golden", name)


@pytest.mark.parametrize("name", ["qwen3-test", "qwen3-moe-test",
                                  "deepseek-v3-test"])
def test_golden_logits_hf_checkpoint_conversion(name):
    """Differential validation of HF-checkpoint conversion (VERDICT r3 #7).

    Fixtures under tests/fixtures/golden/ hold a tiny seeded HF checkpoint
    per family plus logits computed by the *HuggingFace torch*
    implementation in float32 (scripts/gen_golden_fixtures.py) — an
    implementation independent of this repo. A conversion layout bug
    (transpose, rope de-interleave, kv_b split, router bias) produces O(1)
    logit changes and fails here instead of at first deployment.
    Measured bf16-compute gap: maxerr <= 0.038, argmax agreement 1.0."""
    import json
    import os

    import numpy as np

    from deepsearch_tts_tpu.engine.weights import (
        _load_safetensors_dir,
        convert_deepseek_v3,
        convert_qwen3_dense,
        convert_qwen3_moe,
    )

    d = _golden_dir(name)
    if name == "qwen3-test":
        from deepsearch_tts_tpu.models import qwen3 as fam

        cfg, conv, fwd = (fam.QWEN3_CONFIGS[name], convert_qwen3_dense,
                          fam.forward)
    elif name == "qwen3-moe-test":
        from deepsearch_tts_tpu.models import qwen3_moe as fam

        cfg, conv, fwd = (fam.QWEN3_MOE_CONFIGS[name], convert_qwen3_moe,
                          fam.forward)
    else:
        from deepsearch_tts_tpu.models import deepseek_v3 as fam

        cfg, conv, fwd = (fam.DEEPSEEK_V3_CONFIGS[name], convert_deepseek_v3,
                          fam.forward)

    params = conv(_load_safetensors_dir(d), cfg)
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    ids = jnp.asarray([meta["input_ids"]], jnp.int32)
    pos = jnp.arange(ids.shape[1], dtype=jnp.int32)[None]
    logits, _ = fwd(params, cfg, ids, pos)
    ours = np.asarray(logits[0], np.float32)
    expected = np.load(os.path.join(d, "expected_logits.npy"))

    err = np.abs(ours - expected)
    assert err.max() < 0.2, err.max()          # measured <= 0.038 (bf16)
    assert err.mean() < 0.01, err.mean()       # measured <= 0.0025
    agree = (ours.argmax(-1) == expected.argmax(-1)).mean()
    assert agree >= 0.9, agree                 # measured 1.0


@pytest.mark.parametrize("name", ["qwen3-test", "qwen3-moe-test",
                                  "deepseek-v3-test"])
def test_fast_random_params_matches_init_tree(name):
    """Host-numpy init must produce the exact tree the model's own
    init_params does (shapes + dtypes), since every bench/probe bring-up
    uses it in place of the real init."""
    from deepsearch_tts_tpu.engine.weights import fast_random_params
    from deepsearch_tts_tpu.models.registry import get_model

    fam = get_model(name)
    want = jax.eval_shape(lambda k: fam.init_params(fam.config, k),
                          jax.ShapeDtypeStruct((2,), jnp.uint32))
    got = fast_random_params(name, seed=1)
    w = jax.tree_util.tree_map(lambda l: (l.shape, str(l.dtype)), want)
    g = jax.tree_util.tree_map(lambda l: (l.shape, str(l.dtype)), got)
    assert w == g


def test_fast_random_params_deterministic():
    from deepsearch_tts_tpu.engine.weights import fast_random_params

    a = fast_random_params("qwen3-test", seed=3)
    b = fast_random_params("qwen3-test", seed=3)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda x, y: bool((x == y).all()), a, b))


def test_device_random_params_forward_runs():
    """On-device init (zero host->device weight transfer) yields a tree the
    forward pass accepts."""
    from deepsearch_tts_tpu.engine.weights import device_random_params
    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, forward

    cfg = QWEN3_CONFIGS["qwen3-test"]
    params = device_random_params("qwen3-test", seed=0)
    ids = jnp.zeros((1, 4), jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    logits, _ = forward(params, cfg, ids, pos)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert bool(jnp.isfinite(logits.astype(jnp.float32)).all())


def test_compile_cache_toggle(monkeypatch, tmp_path):
    import deepsearch_tts_tpu.compile_cache as cc

    monkeypatch.setattr(cc, "_enabled", None)
    monkeypatch.setenv("DST_COMPILE_CACHE", "0")
    assert cc.enable_persistent_cache() is None
    monkeypatch.setenv("DST_COMPILE_CACHE", str(tmp_path / "jc"))
    got = cc.enable_persistent_cache()
    assert got == str(tmp_path / "jc")
    import os as _os
    assert _os.path.isdir(got)
    # idempotent: second call returns the same dir without re-reading env
    monkeypatch.setenv("DST_COMPILE_CACHE", "elsewhere")
    assert cc.enable_persistent_cache() == got
