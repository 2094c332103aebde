import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsearch_tts_tpu.engine.kvcache import PageAllocator, init_kv_pages
from deepsearch_tts_tpu.models import get_model
from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, forward, init_params

CFG = QWEN3_CONFIGS["qwen3-test"]
PS = 4  # page size
NPAGES = 32


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def _paged_setup(B, max_pages):
    k_pages, v_pages = init_kv_pages(CFG.n_layers, NPAGES, PS, CFG.n_kv_heads, CFG.head_dim)
    alloc = PageAllocator(NPAGES, PS)
    tables = np.zeros((B, max_pages), np.int32)
    return k_pages, v_pages, alloc, tables


def test_train_forward_shape(params):
    tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % CFG.vocab_size
    pos = jnp.tile(jnp.arange(6, dtype=jnp.int32), (2, 1))
    logits, cache = forward(params, CFG, tokens, pos)
    assert logits.shape == (2, 6, CFG.vocab_size)
    assert cache is None
    assert bool(jnp.isfinite(logits).all())


def test_paged_prefill_matches_full(params):
    """Prefill through the paged path must reproduce full-attention logits."""
    B, T = 2, 7
    key = jax.random.PRNGKey(1)
    tokens = jax.random.randint(key, (B, T), 0, CFG.vocab_size, jnp.int32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

    full_logits, _ = forward(params, CFG, tokens, pos)

    k_pages, v_pages, alloc, tables = _paged_setup(B, max_pages=4)
    for b in range(B):
        pages = alloc.alloc(alloc.pages_for_tokens(T))
        tables[b, : len(pages)] = pages
    seq_lens = jnp.full((B,), T, jnp.int32)
    paged_logits, (k_pages, v_pages) = forward(
        params, CFG, tokens, pos,
        k_pages=k_pages, v_pages=v_pages,
        page_table=jnp.asarray(tables), seq_lens=seq_lens,
    )
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(paged_logits), rtol=5e-2, atol=6e-2
    )


def test_paged_decode_matches_full(params):
    """Prefill T tokens, then decode 3 more one at a time; logits must track
    the full-attention forward over the growing sequence."""
    B, T, EXTRA = 1, 5, 3
    key = jax.random.PRNGKey(2)
    all_tokens = jax.random.randint(key, (B, T + EXTRA), 0, CFG.vocab_size, jnp.int32)

    k_pages, v_pages, alloc, tables = _paged_setup(B, max_pages=4)
    pages = alloc.alloc(alloc.pages_for_tokens(T + EXTRA))
    tables[0, : len(pages)] = pages
    table = jnp.asarray(tables)

    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    _, (k_pages, v_pages) = forward(
        params, CFG, all_tokens[:, :T], pos,
        k_pages=k_pages, v_pages=v_pages, page_table=table,
        seq_lens=jnp.full((B,), T, jnp.int32),
    )

    for step in range(EXTRA):
        cur = T + step
        tok = all_tokens[:, cur : cur + 1]
        posd = jnp.full((B, 1), cur, jnp.int32)
        dec_logits, (k_pages, v_pages) = forward(
            params, CFG, tok, posd,
            k_pages=k_pages, v_pages=v_pages, page_table=table,
            seq_lens=jnp.full((B,), cur + 1, jnp.int32),
        )
        full_logits, _ = forward(
            params, CFG, all_tokens[:, : cur + 1],
            jnp.tile(jnp.arange(cur + 1, dtype=jnp.int32), (B, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(dec_logits[:, -1]), np.asarray(full_logits[:, -1]),
            rtol=5e-2, atol=6e-2,
        )


def test_padding_positions_do_not_corrupt(params):
    """Padded tail (-1 positions) must not affect real tokens' logits."""
    B, T = 1, 4
    tokens = jnp.array([[5, 6, 7, 8]], jnp.int32)
    pos = jnp.array([[0, 1, 2, 3]], jnp.int32)

    k_pages, v_pages, alloc, tables = _paged_setup(B, 4)
    tables[0, :2] = alloc.alloc(2)
    table = jnp.asarray(tables)
    ref, _ = forward(params, CFG, tokens, pos, k_pages=k_pages, v_pages=v_pages,
                     page_table=table, seq_lens=jnp.array([4], jnp.int32))

    # same content padded out to T=6 with junk tokens at padding positions
    k_pages2, v_pages2, alloc2, tables2 = _paged_setup(B, 4)
    tables2[0, :2] = alloc2.alloc(2)
    tokens_p = jnp.array([[5, 6, 7, 8, 99, 99]], jnp.int32)
    pos_p = jnp.array([[0, 1, 2, 3, -1, -1]], jnp.int32)
    out, _ = forward(params, CFG, tokens_p, pos_p, k_pages=k_pages2, v_pages=v_pages2,
                     page_table=jnp.asarray(tables2), seq_lens=jnp.array([4], jnp.int32))
    np.testing.assert_allclose(
        np.asarray(ref[:, :4]), np.asarray(out[:, :4]), rtol=5e-2, atol=6e-2
    )


def test_logits_indices_slice(params):
    B, T = 2, 6
    tokens = jnp.zeros((B, T), jnp.int32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    k_pages, v_pages, alloc, tables = _paged_setup(B, 4)
    for b in range(B):
        tables[b, :2] = alloc.alloc(2)
    logits, _ = forward(params, CFG, tokens, pos, k_pages=k_pages, v_pages=v_pages,
                        page_table=jnp.asarray(tables),
                        seq_lens=jnp.full((B,), T, jnp.int32),
                        logits_indices=jnp.array([5, 5], jnp.int32))
    assert logits.shape == (B, 1, CFG.vocab_size)


def test_page_allocator_refcounts():
    alloc = PageAllocator(n_pages=8, page_size=4)
    assert alloc.num_free == 7  # page 0 reserved
    a = alloc.alloc(3)
    assert 0 not in a
    alloc.share(a)
    alloc.free(a)
    assert alloc.num_free == 4  # still referenced once
    alloc.free(a)
    assert alloc.num_free == 7
    with pytest.raises(MemoryError):
        alloc.alloc(99)


def test_registry():
    fam = get_model("qwen3-test")
    assert fam.config.hidden == 128
    axes = fam.logical_axes()
    assert axes["layers"]["wq"] == ("layer", "embed", "heads")


def test_fresh_prefill_matches_paged(params):
    """fresh_prefill (chunk-causal attention, pages written but not read)
    must equal the paged prefill logits for a prefix-free prompt."""
    B, T = 2, 7
    key = jax.random.PRNGKey(9)
    tokens = jax.random.randint(key, (B, T), 0, CFG.vocab_size, jnp.int32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))

    k1, v1, alloc1, t1 = _paged_setup(B, 4)
    for b in range(B):
        t1[b, :2] = alloc1.alloc(2)
    ref, (k1, v1) = forward(params, CFG, tokens, pos, k_pages=k1, v_pages=v1,
                            page_table=jnp.asarray(t1),
                            seq_lens=jnp.full((B,), T, jnp.int32))

    k2, v2, alloc2, t2 = _paged_setup(B, 4)
    for b in range(B):
        t2[b, :2] = alloc2.alloc(2)
    out, (k2, v2) = forward(params, CFG, tokens, pos, k_pages=k2, v_pages=v2,
                            page_table=jnp.asarray(t2),
                            seq_lens=jnp.full((B,), T, jnp.int32),
                            fresh_prefill=True)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32), rtol=5e-2, atol=6e-2)
    # the pages must hold identical KV (decode continues from them)
    np.testing.assert_allclose(np.asarray(k1, np.float32),
                               np.asarray(k2, np.float32), rtol=1e-2, atol=1e-2)
