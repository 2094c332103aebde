import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsearch_tts_tpu.ops.attention import causal_attention, paged_attention
from deepsearch_tts_tpu.ops.flash_attention import flash_attention
from deepsearch_tts_tpu.ops.paged_attention import pallas_paged_attention


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)


@pytest.mark.parametrize("T,H,K,D,bq,bk", [
    (16, 4, 2, 32, 8, 8),
    (12, 4, 4, 32, 8, 8),   # MHA (G=1), non-divisible T
])
def test_flash_matches_xla(T, H, K, D, bq, bk):
    B = 2
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(ks[0], (B, T, H, D))
    k = _rand(ks[1], (B, T, K, D))
    v = _rand(ks[2], (B, T, K, D))
    ref = causal_attention(q, k, v, impl="xla")
    out = flash_attention(q, k, v, block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32), rtol=5e-2, atol=5e-2
    )


def test_paged_kernel_decode_matches_xla():
    B, H, K, D, ps, NP, P = 2, 4, 2, 32, 4, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    k_pages = _rand(ks[0], (NP, ps, K, D))
    v_pages = _rand(ks[1], (NP, ps, K, D))
    q = _rand(ks[2], (B, 1, H, D))
    table = jnp.array([[3, 5, 0, 0], [7, 2, 9, 0]], jnp.int32)
    seq_lens = jnp.array([6, 11], jnp.int32)
    q_pos = (seq_lens - 1)[:, None]

    ref = paged_attention(q, k_pages, v_pages, table, seq_lens, q_pos, impl="xla")
    out = pallas_paged_attention(q, k_pages, v_pages, table, seq_lens, q_pos,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32), rtol=5e-2, atol=5e-2
    )


def test_paged_kernel_chunk_matches_xla():
    """T>1 chunked prefill over pages (fresh prefill: chunk starts at 0)."""
    B, T, H, K, D, ps, NP, P = 1, 8, 4, 2, 32, 4, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = _rand(ks[2], (B, T, H, D))
    k_pages = _rand(ks[0], (NP, ps, K, D))
    v_pages = _rand(ks[1], (NP, ps, K, D))
    table = jnp.array([[1, 2, 0, 0]], jnp.int32)
    seq_lens = jnp.array([T], jnp.int32)
    q_pos = jnp.arange(T, dtype=jnp.int32)[None, :]

    ref = paged_attention(q, k_pages, v_pages, table, seq_lens, q_pos, impl="xla")
    out = pallas_paged_attention(q, k_pages, v_pages, table, seq_lens, q_pos,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32), rtol=5e-2, atol=5e-2
    )


def test_paged_kernel_resume_chunk():
    """Re-prefill: a chunk whose positions start mid-sequence (prefix cached)."""
    B, T, H, K, D, ps, NP = 1, 4, 2, 2, 32, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = _rand(ks[2], (B, T, H, D))
    k_pages = _rand(ks[0], (NP, ps, K, D))
    v_pages = _rand(ks[1], (NP, ps, K, D))
    table = jnp.array([[4, 6, 8, 0]], jnp.int32)
    start = 6
    seq_lens = jnp.array([start + T], jnp.int32)
    q_pos = (start + jnp.arange(T, dtype=jnp.int32))[None, :]

    ref = paged_attention(q, k_pages, v_pages, table, seq_lens, q_pos, impl="xla")
    out = pallas_paged_attention(q, k_pages, v_pages, table, seq_lens, q_pos,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32), rtol=5e-2, atol=5e-2
    )


def test_paged_decode_v2_matches_xla():
    """Per-slot page-streaming decode kernel (grid B, fori over pages)."""
    from deepsearch_tts_tpu.ops.paged_attention import pallas_paged_decode

    B, H, K, D, ps, NP = 3, 4, 2, 32, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    k_pages = _rand(ks[0], (NP, ps, K, D))
    v_pages = _rand(ks[1], (NP, ps, K, D))
    q = _rand(ks[2], (B, 1, H, D))
    table = jnp.array([[3, 5, 0, 0], [7, 2, 9, 0], [1, 0, 0, 0]], jnp.int32)
    seq_lens = jnp.array([6, 11, 2], jnp.int32)
    q_pos = (seq_lens - 1)[:, None]

    ref = paged_attention(q, k_pages, v_pages, table, seq_lens, q_pos, impl="xla")
    out = pallas_paged_decode(q, k_pages, v_pages, table, seq_lens, interpret=True)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32), rtol=5e-2, atol=5e-2)


def test_clamped_decode_matches_xla():
    """Exact-read clamped decode kernel vs the XLA gather (interpret)."""
    import numpy as _np

    from deepsearch_tts_tpu.ops.attention import paged_attention
    from deepsearch_tts_tpu.ops.paged_attention import pallas_paged_decode_clamp

    B, K, G, D, ps, P = 3, 2, 2, 32, 4, 4
    H = K * G
    rng = _np.random.default_rng(3)
    N = B * P + 1
    kp = jnp.asarray(rng.standard_normal((N, ps, K, D)) * 0.3, jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((N, ps, K, D)) * 0.3, jnp.bfloat16)
    table = jnp.asarray(
        _np.arange(1, B * P + 1, dtype=_np.int32).reshape(B, P))
    lens = jnp.asarray([5, 16, 9], jnp.int32)   # partial/full/odd pages
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.3, jnp.bfloat16)
    qpos = (lens - 1)[:, None]

    want = paged_attention(q, kp, vp, table, lens, qpos, impl="xla")
    got = pallas_paged_decode_clamp(q, kp, vp, table, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.02)


def test_slot_attention_matches_xla():
    """Slot-cache decode kernel vs masked_context_attention (interpret):
    multi-layer pool indexing, mixed row lengths crossing context-block
    boundaries, slot_ctx bucket narrower than the pool."""
    import numpy as _np

    from deepsearch_tts_tpu.ops.attention import masked_context_attention
    from deepsearch_tts_tpu.ops.slot_attention import slot_attention

    L, B, ps, K, G, D = 3, 8, 64, 2, 2, 32
    H = K * G
    slot_ctx = 48   # bucket < ps; cb divisor search must land on 16
    rng = _np.random.default_rng(7)
    kpf = jnp.asarray(rng.standard_normal((L * B, ps, K, D)) * 0.3,
                      jnp.bfloat16)
    vpf = jnp.asarray(rng.standard_normal((L * B, ps, K, D)) * 0.3,
                      jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.bfloat16)
    # lengths: short rows (block-clamp path), bucket-edge, crossing blocks
    lens = jnp.asarray([1, 5, 17, 48, 33, 2, 16, 47], jnp.int32)
    pos = lens - 1

    for layer in range(L):
        kl = kpf[layer * B:(layer + 1) * B, :slot_ctx]
        vl = vpf[layer * B:(layer + 1) * B, :slot_ctx]
        want = masked_context_attention(
            q[:, None], kl, vl, lens, pos[:, None])[:, 0]
        got = slot_attention(q, kpf, vpf, jnp.minimum(lens, pos + 1),
                             jnp.int32(layer), n_rows=B, slot_ctx=slot_ctx,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.05, atol=0.02)


def test_slot_window_attention_matches_masked_reference():
    """Speculative verify windows: per-(row, t) causal limits vs the XLA
    masked path the unfused spec program uses. Window keys already sit in
    the pool (the engine scatters before attending), so the reference is
    masked_context_attention with q_positions = base + t."""
    import numpy as _np

    from deepsearch_tts_tpu.ops.attention import masked_context_attention
    from deepsearch_tts_tpu.ops.slot_attention import slot_window_attention

    L, B, ps, K, G, D, W = 2, 8, 64, 2, 2, 32, 3
    H = K * G
    slot_ctx = 48
    rng = _np.random.default_rng(13)
    kpf = jnp.asarray(rng.standard_normal((L * B, ps, K, D)) * 0.3,
                      jnp.bfloat16)
    vpf = jnp.asarray(rng.standard_normal((L * B, ps, K, D)) * 0.3,
                      jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, W, H, D)) * 0.3, jnp.bfloat16)
    # base position of each row's window start (last accepted token);
    # mixed: short rows, crossing context blocks, near the bucket edge
    base = jnp.asarray([0, 4, 16, 43, 32, 1, 15, 40], jnp.int32)
    pos = base[:, None] + jnp.arange(W)[None, :]          # [B, W]
    seq_lens = base + W   # every window key is in-sequence

    for layer in range(L):
        kl = kpf[layer * B:(layer + 1) * B, :slot_ctx]
        vl = vpf[layer * B:(layer + 1) * B, :slot_ctx]
        want = masked_context_attention(q, kl, vl, seq_lens, pos)
        got = slot_window_attention(
            q, kpf, vpf, seq_lens, base,
            jnp.int32(layer), n_rows=B, slot_ctx=slot_ctx, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.05, atol=0.02)


def test_slot_window_attention_shared_pool():
    """MLA windows: shared pool (k IS v, K=1 sublane squeeze) + windowed
    limits."""
    import numpy as _np

    from deepsearch_tts_tpu.ops.attention import masked_context_attention
    from deepsearch_tts_tpu.ops.slot_attention import slot_window_attention

    L, B, ps, H, D, W = 2, 4, 32, 6, 48, 4
    rng = _np.random.default_rng(17)
    pool = jnp.asarray(rng.standard_normal((L * B, ps, 1, D)) * 0.3,
                       jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, W, H, D)) * 0.3, jnp.bfloat16)
    base = jnp.asarray([0, 7, 16, 27], jnp.int32)
    pos = base[:, None] + jnp.arange(W)[None, :]
    seq_lens = base + W
    scale = 0.21

    for layer in range(L):
        kl = pool[layer * B:(layer + 1) * B]
        want = masked_context_attention(q, kl, kl, seq_lens, pos,
                                        scale=scale)
        got = slot_window_attention(
            q, pool, None, seq_lens, base,
            jnp.int32(layer), n_rows=B, slot_ctx=ps, scale=scale,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.05, atol=0.02)


def test_slot_attention_shared_pool_matches_xla():
    """MLA-style shared pool (k IS v, K=1): one-operand kernel vs the XLA
    masked path."""
    import numpy as _np

    from deepsearch_tts_tpu.ops.attention import masked_context_attention
    from deepsearch_tts_tpu.ops.slot_attention import slot_attention

    L, B, ps, H, D = 2, 8, 32, 6, 48   # K=1 latent rows
    rng = _np.random.default_rng(11)
    pool = jnp.asarray(rng.standard_normal((L * B, ps, 1, D)) * 0.3,
                       jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.bfloat16)
    lens = jnp.asarray([1, 3, 17, 32, 9, 2, 16, 31], jnp.int32)
    scale = 0.17

    for layer in range(L):
        kl = pool[layer * B:(layer + 1) * B]
        want = masked_context_attention(
            q[:, None], kl, kl, lens, (lens - 1)[:, None], scale=scale)[:, 0]
        got = slot_attention(q, pool, None, lens, jnp.int32(layer),
                             n_rows=B, slot_ctx=ps, scale=scale,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.05, atol=0.02)
