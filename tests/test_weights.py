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
