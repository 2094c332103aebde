import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsearch_tts_tpu.models.deepseek_v3 import (
    DEEPSEEK_V3_CONFIGS,
    forward,
    init_params,
    route_v3,
)

CFG = DEEPSEEK_V3_CONFIGS["deepseek-v3-test"]


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def test_route_v3_weights_normalized():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (6, CFG.hidden)).astype(jnp.bfloat16)
    rw = jax.random.normal(jax.random.fold_in(key, 1),
                           (CFG.hidden, CFG.n_routed_experts)).astype(jnp.bfloat16)
    bias = jnp.zeros((CFG.n_routed_experts,), jnp.float32)
    w, e = route_v3(x, rw, bias, CFG)
    assert w.shape == (6, CFG.top_k) and e.shape == (6, CFG.top_k)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)),
                               CFG.routed_scaling_factor, rtol=1e-4)


def test_route_v3_bias_affects_selection_not_weights():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, CFG.hidden)).astype(jnp.bfloat16)
    rw = jax.random.normal(jax.random.fold_in(key, 1),
                           (CFG.hidden, CFG.n_routed_experts)).astype(jnp.bfloat16)
    big_bias = jnp.zeros((CFG.n_routed_experts,), jnp.float32).at[3].set(100.0)
    w, e = route_v3(x, rw, big_bias, CFG)
    assert bool((e == 3).any())  # expert 3 force-selected by bias


def test_mla_train_forward(params):
    tokens = jnp.arange(10, dtype=jnp.int32).reshape(2, 5)
    pos = jnp.tile(jnp.arange(5, dtype=jnp.int32), (2, 1))
    logits, cache = forward(params, CFG, tokens, pos)
    assert logits.shape == (2, 5, CFG.vocab_size)
    assert cache is None
    assert bool(jnp.isfinite(logits).all())


def test_mla_paged_matches_full(params):
    from deepsearch_tts_tpu.engine.kvcache import PageAllocator, init_kv_pages

    B, T, PS, NP = 1, 6, 4, 16
    tokens = jax.random.randint(jax.random.PRNGKey(5), (B, T), 0,
                                CFG.vocab_size, jnp.int32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    full, _ = forward(params, CFG, tokens, pos)

    # MLA cache layout: heads=1, row dim = kv_lora + rope (cfg properties)
    k_pages, v_pages = init_kv_pages(CFG.n_layers, NP, PS, CFG.n_kv_heads,
                                     CFG.head_dim)
    alloc = PageAllocator(NP, PS)
    table = np.zeros((B, 4), np.int32)
    table[0, :2] = alloc.alloc(2)
    paged, _ = forward(params, CFG, tokens, pos, k_pages=k_pages,
                       v_pages=v_pages, page_table=jnp.asarray(table),
                       seq_lens=jnp.full((B,), T, jnp.int32))
    np.testing.assert_allclose(np.asarray(full, np.float32),
                               np.asarray(paged, np.float32), rtol=5e-2, atol=6e-2)


def test_mla_decode_step(params):
    from deepsearch_tts_tpu.engine.kvcache import PageAllocator, init_kv_pages

    B, T, PS, NP = 1, 4, 4, 16
    toks = jax.random.randint(jax.random.PRNGKey(6), (B, T + 1), 0,
                              CFG.vocab_size, jnp.int32)
    k_pages, v_pages = init_kv_pages(CFG.n_layers, NP, PS, CFG.n_kv_heads,
                                     CFG.head_dim)
    alloc = PageAllocator(NP, PS)
    table = np.zeros((B, 4), np.int32)
    table[0, :2] = alloc.alloc(2)
    table = jnp.asarray(table)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    _, (k_pages, v_pages) = forward(params, CFG, toks[:, :T], pos,
                                    k_pages=k_pages, v_pages=v_pages,
                                    page_table=table,
                                    seq_lens=jnp.full((B,), T, jnp.int32))
    dec, _ = forward(params, CFG, toks[:, T:], jnp.full((B, 1), T, jnp.int32),
                     k_pages=k_pages, v_pages=v_pages, page_table=table,
                     seq_lens=jnp.full((B,), T + 1, jnp.int32))
    full, _ = forward(params, CFG, toks,
                      jnp.tile(jnp.arange(T + 1, dtype=jnp.int32), (B, 1)))
    np.testing.assert_allclose(np.asarray(dec[:, -1], np.float32),
                               np.asarray(full[:, -1], np.float32),
                               rtol=5e-2, atol=6e-2)


def test_registry_has_kimi():
    from deepsearch_tts_tpu.models import get_model

    fam = get_model("kimi-k2")
    assert fam.config.n_routed_experts == 384
    assert fam.config.n_kv_heads == 1  # MLA latent cache


def test_mla_fresh_prefill_matches_paged(params):
    from deepsearch_tts_tpu.engine.kvcache import PageAllocator, init_kv_pages

    B, T, PS, NP = 1, 6, 4, 16
    tokens = jax.random.randint(jax.random.PRNGKey(8), (B, T), 0,
                                CFG.vocab_size, jnp.int32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    outs = []
    for fresh in (False, True):
        k_pages, v_pages = init_kv_pages(CFG.n_layers, NP, PS, CFG.n_kv_heads,
                                         CFG.head_dim)
        alloc = PageAllocator(NP, PS)
        table = np.zeros((B, 4), np.int32)
        table[0, :2] = alloc.alloc(2)
        out, _ = forward(params, CFG, tokens, pos, k_pages=k_pages,
                         v_pages=v_pages, page_table=jnp.asarray(table),
                         seq_lens=jnp.full((B,), T, jnp.int32),
                         fresh_prefill=fresh)
        outs.append(np.asarray(out, np.float32))
    np.testing.assert_allclose(outs[0], outs[1], rtol=5e-2, atol=6e-2)
