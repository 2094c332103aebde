import jax
import jax.numpy as jnp
import numpy as np

from deepsearch_tts_tpu.ops.attention import causal_attention
from deepsearch_tts_tpu.ops.quant import (
    int8_matmul,
    maybe_int8_dot,
    quantize_int8,
    quantize_params,
)
from deepsearch_tts_tpu.ops.ring_attention import ring_attention


def test_ring_attention_matches_full(mesh8):
    B, T, H, K, D = 2, 32, 4, 2, 16  # T=32 over 4 tp shards → chunk 8
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, H, D)).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, K, D)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, K, D)).astype(jnp.bfloat16)

    ref = causal_attention(q, k, v)
    with mesh8:
        out = ring_attention(q, k, v, mesh=mesh8, axis="tp")
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32), rtol=5e-2, atol=5e-2)


def test_quantize_int8_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32), jnp.float32)
    q, s = quantize_int8(w, interpret=True)
    assert q.dtype == jnp.int8 and s.shape == (1, 32)
    deq = q.astype(jnp.float32) * s
    err = np.abs(np.asarray(deq - w))
    assert err.max() < np.abs(np.asarray(w)).max() / 100  # ~7-bit accuracy


def test_int8_matmul_close_to_bf16():
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64)).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32), jnp.float32)
    ref = jnp.dot(x.astype(jnp.float32), w)
    q, s = quantize_int8(w, interpret=True)
    out = int8_matmul(x, q, s)
    rel = np.abs(np.asarray(out, np.float32) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1.0)
    assert rel.mean() < 0.05


def test_quantize_params_structure():
    params = {
        "embed": jnp.ones((16, 8), jnp.bfloat16),
        "layers": {
            "wq": jnp.ones((2, 8, 16), jnp.bfloat16),   # stacked layer dim
            "ln1": jnp.ones((2, 8), jnp.bfloat16),
        },
    }
    qp = quantize_params(params)
    assert isinstance(qp["layers"]["wq"], dict)
    assert qp["layers"]["wq"]["q"].dtype == jnp.int8
    assert qp["layers"]["wq"]["q"].shape == (2, 8, 16)
    assert qp["layers"]["wq"]["scales"].shape == (2, 1, 16)
    assert isinstance(qp["layers"]["ln1"], jax.Array)   # norms untouched
    assert isinstance(qp["embed"], jax.Array)           # embed untouched

    x = jnp.ones((4, 8), jnp.bfloat16)
    out = maybe_int8_dot(x, qp["layers"]["wq"]["q"] if False else
                         {"q": qp["layers"]["wq"]["q"][0],
                          "scales": qp["layers"]["wq"]["scales"][0]})
    assert out.shape == (4, 16)


def test_int8_engine_generates():
    """End-to-end int8-quantized serving: engine runs and yields sane output
    close to bf16 greedy (tiny model, int8 error may flip late tokens)."""
    import jax

    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models.qwen3 import init_params, QWEN3_CONFIGS

    params = init_params(QWEN3_CONFIGS["qwen3-test"], jax.random.PRNGKey(0))
    eng = Engine("qwen3-test", ByteTokenizer(), params=params, max_slots=2,
                 page_size=4, n_pages=64, max_seq_len=128, decode_chunk_len=4,
                 quantize="int8")
    res = eng.generate(GenerationRequest(prompt_ids=list(range(10, 26)),
                                         max_tokens=6, temperature=0.0,
                                         repetition_penalty=1.0))
    eng.shutdown()
    assert len(res.token_ids) == 6
    assert res.finish_reason in ("stop", "length")


def test_int8_experts_blocked_matches_ragged():
    """Quantized routed experts run the blocked grouped matmul
    (ops/moe._expert_ffn_blocked) and must track the bf16 ragged path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsearch_tts_tpu.ops.moe import moe_ragged
    from deepsearch_tts_tpu.ops.quant import quantize_params

    rng = np.random.default_rng(0)
    T, E, F, NE, K = 24, 32, 48, 8, 2
    x = jnp.asarray(rng.normal(size=(T, E)), jnp.bfloat16)
    router = jnp.asarray(rng.normal(size=(E, NE)), jnp.bfloat16)
    ws = {
        "w_gate": jnp.asarray(rng.normal(size=(NE, E, F)) * 0.2, jnp.bfloat16),
        "w_up": jnp.asarray(rng.normal(size=(NE, E, F)) * 0.2, jnp.bfloat16),
        "w_down": jnp.asarray(rng.normal(size=(NE, F, E)) * 0.2, jnp.bfloat16),
    }
    ref = moe_ragged(x, router, ws["w_gate"], ws["w_up"], ws["w_down"], K)
    wq = quantize_params(ws)
    assert isinstance(wq["w_gate"], dict) and wq["w_gate"]["q"].dtype == jnp.int8
    out = moe_ragged(x, router, wq["w_gate"], wq["w_up"], wq["w_down"], K)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < 0.08, f"relative error {err/scale}"


def test_int8_quantized_logical_axes():
    import jax.numpy as jnp
    import numpy as np

    from deepsearch_tts_tpu.ops.quant import quantize_params, quantized_logical_axes

    params = {"w_gate": jnp.asarray(np.ones((2, 4, 8, 16)), jnp.bfloat16),
              "ln1": jnp.ones((2, 8), jnp.bfloat16)}
    axes = {"w_gate": ("layer", "expert", "embed", "expert_mlp"),
            "ln1": ("layer", "embed")}
    qp = quantize_params(params)
    fixed = quantized_logical_axes(qp, axes)
    assert fixed["w_gate"]["q"] == ("layer", "expert", "embed", "expert_mlp")
    assert fixed["w_gate"]["scales"] == ("layer", "expert", None, "expert_mlp")
    assert tuple(fixed["ln1"]) == ("layer", "embed")


def test_int8_kv_cache_end_to_end():
    """kv_quantize='int8': pools are int8 with per-row scales and greedy
    output tracks the bf16-cache engine (same weights)."""
    import jax
    import jax.numpy as jnp

    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, init_params

    cfg = QWEN3_CONFIGS["qwen3-test"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    tk = ByteTokenizer()
    prompt = list(range(20, 44))
    req = lambda: GenerationRequest(prompt_ids=list(prompt), max_tokens=8,
                                    temperature=0.0, repetition_penalty=1.0)

    ref = Engine("qwen3-test", tk, params=params, max_slots=2, page_size=4,
                 n_pages=64, max_seq_len=128, decode_chunk_len=4,
                 pack_weights=False)
    a = ref.generate(req())
    ref.shutdown()

    eng = Engine("qwen3-test", tk, params=params, max_slots=2, page_size=4,
                 n_pages=64, max_seq_len=128, decode_chunk_len=4,
                 pack_weights=False, kv_quantize="int8")
    # pools stored int32-packed (4 int8 lanes per word)
    assert eng.k_pages.dtype == jnp.int32 and eng.v_pages.dtype == jnp.int32
    assert eng.k_pages.shape[-1] == cfg.head_dim // 4
    assert eng.kv_aux["ks"].shape == eng.k_pages.shape[:-1]
    b = eng.generate(req())
    c = eng.generate(req())
    eng.shutdown()

    assert b.token_ids == c.token_ids          # int8 path is deterministic
    assert len(b.token_ids) == 8
    # int8 KV rounds attention inputs; first tokens should still agree
    assert b.token_ids[0] == a.token_ids[0]


def test_int8_kv_rejected_for_unsupported_modes():
    import jax
    import pytest as _pytest

    from deepsearch_tts_tpu.engine.engine import Engine
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, init_params

    cfg = QWEN3_CONFIGS["qwen3-test"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    with _pytest.raises(ValueError, match="paged cache"):
        Engine("qwen3-test", ByteTokenizer(), params=params, max_slots=2,
               cache_mode="slot", kv_quantize="int8", max_seq_len=64)


def test_int8_fused_engine_matches_unfused():
    """quantize='int8' with forced layer_fusion (int8 fused kernels,
    interpret mode on CPU) tracks the unfused int8 engine greedily."""
    import jax

    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models.qwen3 import Qwen3Config, init_params
    from deepsearch_tts_tpu.models import qwen3, registry

    cfg = Qwen3Config(vocab_size=256, hidden=128, n_layers=2, n_heads=2,
                      n_kv_heads=2, head_dim=128, intermediate=256,
                      tie_embeddings=True)
    registry.register("qwen3-i8fuse-test", cfg, qwen3.init_params,
                      qwen3.forward,
                      lambda cfg=cfg: qwen3.logical_axes(cfg))
    params = init_params(cfg, jax.random.PRNGKey(0))
    req = lambda: GenerationRequest(prompt_ids=[5, 6, 7, 8], max_tokens=6,
                                    temperature=0.0, repetition_penalty=1.0)

    a = Engine("qwen3-i8fuse-test", ByteTokenizer(), params=params,
               max_slots=2, page_size=4, n_pages=32, max_seq_len=32,
               decode_chunk_len=2, quantize="int8", pack_weights=True)
    want = a.generate(req()).token_ids
    a.shutdown()

    b = Engine("qwen3-i8fuse-test", ByteTokenizer(), params=params,
               max_slots=2, page_size=4, n_pages=32, max_seq_len=32,
               decode_chunk_len=2, quantize="int8", layer_fusion=True)
    got = b.generate(req()).token_ids
    b.shutdown()
    assert got == want
