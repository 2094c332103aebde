"""Interpret-mode parity tests for the fused decode-layer Pallas kernels
(ops/fused_layer.py) against the model's XLA op chain."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsearch_tts_tpu.models.common import apply_rope, rms_norm, rope_angles
from deepsearch_tts_tpu.ops.fused_layer import (
    fused_mlp,
    fused_out_mlp,
    fused_qkv,
)

B, E, F, H, K, D = 8, 256, 384, 4, 2, 64
EPS = 1e-6


def _rand(key, shape):
    return (jax.random.normal(key, shape, jnp.float32) * 0.05).astype(jnp.bfloat16)


def test_fused_mlp_matches_xla():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = _rand(ks[0], (B, E))
    ln = jnp.ones((E,), jnp.bfloat16) * 1.1
    wg, wu = _rand(ks[1], (E, F)), _rand(ks[2], (E, F))
    wd = _rand(ks[3], (F, E))

    out = fused_mlp(x, ln, wg, wu, wd, eps=EPS, block_f=128, interpret=True)

    h = rms_norm(x, ln, EPS)
    g = jnp.dot(h, wg, preferred_element_type=jnp.float32)
    u = jnp.dot(h, wu, preferred_element_type=jnp.float32)
    mlp = jnp.dot((jax.nn.silu(g) * u).astype(jnp.bfloat16), wd,
                  preferred_element_type=jnp.float32)
    ref = (x.astype(jnp.float32) + mlp).astype(jnp.bfloat16)

    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.02)


def test_fused_out_mlp_packed_gateup():
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    a = _rand(ks[0], (B, H * D))
    x = _rand(ks[1], (B, E))
    wo = _rand(ks[2], (H * D, E))
    ln = jnp.ones((E,), jnp.bfloat16)
    wg, wu = _rand(ks[3], (E, F)), _rand(ks[4], (E, F))
    wd = _rand(ks[5], (F, E))
    gateup = jnp.concatenate([wg, wu], axis=1)

    ref = fused_out_mlp(a, x, wo, ln, wg, wu, wd, eps=EPS, interpret=True)
    out = fused_out_mlp(a, x, wo, ln, gateup, gateup, wd, eps=EPS,
                        packed_gateup=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.01, atol=0.005)


def test_fused_qkv_matches_xla():
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x = _rand(ks[0], (B, E))
    ln = jnp.ones((E,), jnp.bfloat16)
    wq, wk, wv = (_rand(ks[1], (E, H * D)), _rand(ks[2], (E, K * D)),
                  _rand(ks[3], (E, K * D)))
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    qn = jnp.ones((D,), jnp.bfloat16) * 0.9
    kn = jnp.ones((D,), jnp.bfloat16) * 1.2
    positions = jnp.arange(B, dtype=jnp.int32)[:, None] * 3  # [B, 1]
    cos, sin = rope_angles(positions, D, 10000.0)           # [B, 1, D/2]

    q, k, v = fused_qkv(x, ln, wqkv, qn, kn, cos[:, 0], sin[:, 0],
                        n_heads=H, n_kv=K, head_dim=D, eps=EPS,
                        interpret=True)

    h = rms_norm(x[:, None, :], ln, EPS)                     # [B, 1, E]
    q_ref = jnp.dot(h, wq, preferred_element_type=jnp.bfloat16).reshape(B, 1, H, D)
    k_ref = jnp.dot(h, wk, preferred_element_type=jnp.bfloat16).reshape(B, 1, K, D)
    v_ref = jnp.dot(h, wv, preferred_element_type=jnp.bfloat16).reshape(B, 1, K, D)
    q_ref = apply_rope(rms_norm(q_ref, qn, EPS), cos, sin)
    k_ref = apply_rope(rms_norm(k_ref, kn, EPS), cos, sin)

    np.testing.assert_allclose(np.asarray(q, np.float32),
                               np.asarray(q_ref.reshape(B, H * D), np.float32),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(k, np.float32),
                               np.asarray(k_ref.reshape(B, K * D), np.float32),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(v, np.float32),
                               np.asarray(v_ref.reshape(B, K * D), np.float32),
                               rtol=0.05, atol=0.02)


def test_fused_out_mlp_matches_xla():
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    a = _rand(ks[0], (B, H * D))
    x = _rand(ks[1], (B, E))
    wo = _rand(ks[2], (H * D, E))
    ln = jnp.ones((E,), jnp.bfloat16)
    wg, wu = _rand(ks[3], (E, F)), _rand(ks[4], (E, F))
    wd = _rand(ks[5], (F, E))

    out = fused_out_mlp(a, x, wo, ln, wg, wu, wd, eps=EPS, interpret=True)

    o = jnp.dot(a, wo, preferred_element_type=jnp.float32)
    x2 = (x.astype(jnp.float32) + o).astype(jnp.bfloat16)
    h = rms_norm(x2, ln, EPS)
    g = jnp.dot(h, wg, preferred_element_type=jnp.float32)
    u = jnp.dot(h, wu, preferred_element_type=jnp.float32)
    mlp = jnp.dot((jax.nn.silu(g) * u).astype(jnp.bfloat16), wd,
                  preferred_element_type=jnp.float32)
    ref = (x2.astype(jnp.float32) + mlp).astype(jnp.bfloat16)

    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.02)


def test_engine_layer_fusion_greedy_parity():
    """Engine with layer_fusion=True produces the same greedy tokens as the
    plain XLA decode path (interpret-mode kernels on CPU)."""
    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer

    def req(ids, n):
        return GenerationRequest(prompt_ids=ids, max_tokens=n,
                                 temperature=0.0, top_k=0, top_p=1.0,
                                 min_p=0.0, repetition_penalty=1.0)

    tk = ByteTokenizer()
    ref = Engine("qwen3-test", tk, max_slots=2, page_size=4, n_pages=64,
                 max_seq_len=64, decode_chunk_len=4, seed=0)
    r_ref = ref.generate(req(list(range(40, 52)), 8))
    ref.shutdown()

    eng = Engine("qwen3-test", tk, max_slots=2, page_size=4, n_pages=64,
                 max_seq_len=64, decode_chunk_len=4, seed=0,
                 layer_fusion=True)
    assert eng.packed, "layer_fusion must force packed weights"
    r = eng.generate(req(list(range(40, 52)), 8))
    eng.shutdown()
    assert r.token_ids == r_ref.token_ids, (r.token_ids, r_ref.token_ids)


def test_stacked_kernels_match_plain():
    """Stacked-weight kernels (scalar-prefetch layer select) must agree with
    the 2D reference kernels for every layer index."""
    from deepsearch_tts_tpu.ops.fused_layer import (
        fused_out_mlp_stacked,
        fused_qkv_stacked,
    )

    L = 3
    ks = jax.random.split(jax.random.PRNGKey(4), 8)
    x = _rand(ks[0], (B, E))
    ln1 = _rand(ks[1], (L, E)) + 1.0
    wqkv = _rand(ks[2], (L, E, (H + 2 * K) * D))
    qn = _rand(ks[3], (L, D)) + 1.0
    kn = _rand(ks[4], (L, D)) + 1.0
    positions = jnp.arange(B, dtype=jnp.int32)[:, None]
    cos, sin = rope_angles(positions, D, 10000.0)

    a = _rand(ks[5], (B, H * D))
    wo = _rand(ks[6], (L, H * D, E))
    gateup = _rand(ks[7], (L, E, 2 * F))
    wd = _rand(jax.random.PRNGKey(5), (L, F, E))
    ln2 = jnp.ones((L, E), jnp.bfloat16)

    for l in range(L):
        q_s, k_s, v_s = fused_qkv_stacked(
            x, ln1, wqkv, qn, kn, cos[:, 0], sin[:, 0], jnp.int32(l),
            n_heads=H, n_kv=K, head_dim=D, eps=EPS, interpret=True)
        q_r, k_r, v_r = fused_qkv(
            x, ln1[l], wqkv[l], qn[l], kn[l], cos[:, 0], sin[:, 0],
            n_heads=H, n_kv=K, head_dim=D, eps=EPS, interpret=True)
        for s, r in ((q_s, q_r), (k_s, k_r), (v_s, v_r)):
            np.testing.assert_allclose(np.asarray(s, np.float32),
                                       np.asarray(r, np.float32),
                                       rtol=0.02, atol=0.01)

        out_s = fused_out_mlp_stacked(a, x, wo, ln2, gateup, wd,
                                      jnp.int32(l), eps=EPS, interpret=True)
        out_r = fused_out_mlp(a, x, wo[l], ln2[l], gateup[l], gateup[l],
                              wd[l], eps=EPS, packed_gateup=True,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out_s, np.float32),
                                   np.asarray(out_r, np.float32),
                                   rtol=0.02, atol=0.01)


def test_engine_layer_fusion_int8_kv_parity():
    """layer_fusion composes with int8 KV pages: fused and XLA paths agree
    token-for-token under the same quantized cache."""
    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer

    def req(ids, n):
        return GenerationRequest(prompt_ids=ids, max_tokens=n,
                                 temperature=0.0, top_k=0, top_p=1.0,
                                 min_p=0.0, repetition_penalty=1.0)

    tk = ByteTokenizer()
    kw = dict(max_slots=2, page_size=4, n_pages=64, max_seq_len=64,
              decode_chunk_len=4, seed=0, kv_quantize="int8")
    ref = Engine("qwen3-test", tk, **kw)
    r_ref = ref.generate(req(list(range(10, 26)), 8))
    ref.shutdown()

    eng = Engine("qwen3-test", tk, layer_fusion=True, **kw)
    r = eng.generate(req(list(range(10, 26)), 8))
    eng.shutdown()
    assert r.token_ids == r_ref.token_ids, (r.token_ids, r_ref.token_ids)


def test_stacked_kernels_tpu_geometry():
    """The kernels at a TPU-realistic head_dim=128 geometry (the shapes the
    chip actually runs; the other tests use D=64 for speed)."""
    from deepsearch_tts_tpu.ops.fused_layer import (
        fused_out_mlp_stacked,
        fused_qkv_stacked,
    )

    L, Bq, Eq, Fq, Hq, Kq, Dq = 2, 4, 256, 512, 2, 1, 128
    ks = jax.random.split(jax.random.PRNGKey(7), 8)

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.05).astype(jnp.bfloat16)

    x = rnd(ks[0], (Bq, Eq))
    ln1 = jnp.ones((L, Eq), jnp.bfloat16)
    wqkv = rnd(ks[1], (L, Eq, (Hq + 2 * Kq) * Dq))
    qn = jnp.ones((L, Dq), jnp.bfloat16)
    kn = jnp.ones((L, Dq), jnp.bfloat16)
    positions = jnp.arange(Bq, dtype=jnp.int32)[:, None]
    cos, sin = rope_angles(positions, Dq, 1e6)

    q, k, v = fused_qkv_stacked(x, ln1, wqkv, qn, kn, cos[:, 0], sin[:, 0],
                                jnp.int32(1), n_heads=Hq, n_kv=Kq,
                                head_dim=Dq, eps=EPS, interpret=True)
    assert q.shape == (Bq, Hq * Dq) and k.shape == v.shape == (Bq, Kq * Dq)

    # reference via the model's op chain
    h = rms_norm(x[:, None, :], ln1[1], EPS)
    wq = wqkv[1][:, : Hq * Dq]
    q_ref = jnp.dot(h, wq, preferred_element_type=jnp.bfloat16).reshape(
        Bq, 1, Hq, Dq)
    q_ref = apply_rope(rms_norm(q_ref, qn[1], EPS), cos, sin)
    np.testing.assert_allclose(np.asarray(q, np.float32),
                               np.asarray(q_ref.reshape(Bq, Hq * Dq), np.float32),
                               rtol=0.05, atol=0.02)

    wo = rnd(ks[2], (L, Hq * Dq, Eq))
    gateup = rnd(ks[3], (L, Eq, 2 * Fq))
    wd = rnd(ks[4], (L, Fq, Eq))
    ln2 = jnp.ones((L, Eq), jnp.bfloat16)
    a = rnd(ks[5], (Bq, Hq * Dq))
    out = fused_out_mlp_stacked(a, x, wo, ln2, gateup, wd, jnp.int32(0),
                                eps=EPS, interpret=True)
    o = jnp.dot(a, wo[0], preferred_element_type=jnp.float32)
    x2 = (x.astype(jnp.float32) + o).astype(jnp.bfloat16)
    hh = rms_norm(x2, ln2[0], EPS)
    g = jnp.dot(hh, gateup[0][:, :Fq], preferred_element_type=jnp.float32)
    u = jnp.dot(hh, gateup[0][:, Fq:], preferred_element_type=jnp.float32)
    mlp = jnp.dot((jax.nn.silu(g) * u).astype(jnp.bfloat16), wd[0],
                  preferred_element_type=jnp.float32)
    ref = (x2.astype(jnp.float32) + mlp).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.02)


def test_vmem_gate_matches_block_chooser():
    """fused_vmem_ok must reject exactly the configs _out_mlp_blocks cannot
    fit (ADVICE r2: the old 15MB heuristic admitted qwen3-14b-class shapes
    whose minimum blocks exceed the chooser's 13MB budget)."""
    from types import SimpleNamespace

    from deepsearch_tts_tpu.ops.fused_layer import _out_mlp_blocks, fused_vmem_ok

    small = SimpleNamespace(hidden=2048, intermediate=8960, n_heads=16,
                            head_dim=128)
    assert fused_vmem_ok(small, 64)
    assert _out_mlp_blocks(2048, 8960, 16 * 128, 64) is not None

    # qwen3-14b-class: E=5120, HD=5120, F=17408 at batch 64 — under the old
    # gate this passed (~15.07MB <= 15MB) yet no block candidate fit 13MB
    big = SimpleNamespace(hidden=5120, intermediate=17408, n_heads=40,
                          head_dim=128)
    blocks = _out_mlp_blocks(5120, 17408, 40 * 128, 64)
    assert fused_vmem_ok(big, 64) == (blocks is not None)
    if blocks is None:
        with pytest.raises(ValueError, match="fused_vmem_ok"):
            from deepsearch_tts_tpu.ops.fused_layer import fused_out_mlp_stacked

            fused_out_mlp_stacked(
                jnp.zeros((64, 5120), jnp.bfloat16),
                jnp.zeros((64, 5120), jnp.bfloat16),
                jnp.zeros((2, 5120, 5120), jnp.bfloat16),
                jnp.zeros((2, 5120), jnp.bfloat16),
                jnp.zeros((2, 5120, 2 * 17408), jnp.bfloat16),
                jnp.zeros((2, 17408, 5120), jnp.bfloat16),
                jnp.int32(0), interpret=True)


def test_fused_stacked_i8_matches_xla_int8():
    """int8 fused decode kernels (blocks + scales in the BlockSpecs) match
    the XLA int8 chain (interpret mode)."""
    from deepsearch_tts_tpu.ops.fused_layer import (
        fused_out_mlp_stacked_i8,
        fused_qkv_stacked_i8,
    )
    from deepsearch_tts_tpu.ops.quant import int8_matmul, quantize_params

    L, Bq, Eq, Fq, Hq, Kq, Dq = 2, 4, 256, 384, 2, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(9), 8)
    rnd = lambda k, s: (jax.random.normal(k, s, jnp.float32) * 0.05
                        ).astype(jnp.bfloat16)
    x = rnd(ks[0], (Bq, Eq))
    ln1 = jnp.ones((L, Eq), jnp.bfloat16)
    wqkv = rnd(ks[1], (L, Eq, (Hq + 2 * Kq) * Dq))
    qn = jnp.ones((L, Dq), jnp.bfloat16)
    kn = jnp.ones((L, Dq), jnp.bfloat16)
    positions = jnp.arange(Bq, dtype=jnp.int32)[:, None]
    cos, sin = rope_angles(positions, Dq, 1e6)
    qp = quantize_params({"layers": {"wqkv": wqkv}})["layers"]["wqkv"]

    q_i8, k_i8, v_i8 = fused_qkv_stacked_i8(
        x, ln1, qp["q"], qp["scales"], qn, kn, cos[:, 0], sin[:, 0],
        jnp.int32(1), n_heads=Hq, n_kv=Kq, head_dim=Dq, eps=EPS,
        interpret=True)

    # XLA int8 reference for the v section (no norm/rope applied to v)
    h = rms_norm(x, ln1[1], EPS)
    ref = int8_matmul(h, qp["q"][1], qp["scales"][1])
    v_ref = ref[:, (Hq + Kq) * Dq:]
    np.testing.assert_allclose(np.asarray(v_i8, np.float32),
                               np.asarray(v_ref, np.float32),
                               rtol=0.06, atol=0.03)

    wo = rnd(ks[2], (L, Hq * Dq, Eq))
    gateup = rnd(ks[3], (L, Eq, 2 * Fq))
    wd = rnd(ks[4], (L, Fq, Eq))
    ln2 = jnp.ones((L, Eq), jnp.bfloat16)
    a = rnd(ks[5], (Bq, Hq * Dq))
    qs = quantize_params({"layers": {"wo": wo, "w_gateup": gateup,
                                     "w_down": wd}})["layers"]
    out = fused_out_mlp_stacked_i8(
        a, x, qs["wo"]["q"], qs["wo"]["scales"], ln2,
        qs["w_gateup"]["q"], qs["w_gateup"]["scales"],
        qs["w_down"]["q"], qs["w_down"]["scales"], jnp.int32(0), eps=EPS,
        interpret=True)

    o = int8_matmul(a, qs["wo"]["q"][0], qs["wo"]["scales"][0])
    x2 = (x.astype(jnp.float32) + o.astype(jnp.float32)).astype(jnp.bfloat16)
    hh = rms_norm(x2, ln2[0], EPS)
    gu = int8_matmul(hh, qs["w_gateup"]["q"][0], qs["w_gateup"]["scales"][0])
    g, u = gu[:, :Fq].astype(jnp.float32), gu[:, Fq:].astype(jnp.float32)
    mlp = int8_matmul((jax.nn.silu(g) * u).astype(jnp.bfloat16),
                      qs["w_down"]["q"][0], qs["w_down"]["scales"][0])
    ref = (x2.astype(jnp.float32) + mlp.astype(jnp.float32)
           ).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.06, atol=0.03)
