"""Ulysses sequence-parallel attention parity (ops/ulysses.py).

Both GQA redistribution modes are validated against single-device causal
attention on the CPU test mesh, plus the causal_attention impl dispatch
used by the engine's long-prefill routing (sp_impl="ulysses")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsearch_tts_tpu.ops.attention import causal_attention
from deepsearch_tts_tpu.ops.ulysses import ulysses_attention


def _qkv(B, T, H, K, D, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, T, H, D)).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, K, D)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, K, D)).astype(jnp.bfloat16)
    return q, k, v


def test_ulysses_split_kv_heads(mesh8):
    # Kh % n == 0: kv heads all_to_all alongside the query heads
    B, T, H, K, D = 2, 32, 8, 4, 16   # tp=4 → 2 q heads + 1 kv head local
    q, k, v = _qkv(B, T, H, K, D)
    ref = causal_attention(q, k, v)
    with mesh8:
        out = ulysses_attention(q, k, v, mesh=mesh8, axis="tp")
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_ulysses_replicated_kv_heads(mesh8):
    # n % Kh == 0 (MQA-ish): kv heads all-gathered, one head sliced locally
    B, T, H, K, D = 2, 32, 8, 2, 16   # tp=4, 2 kv heads → replication path
    q, k, v = _qkv(B, T, H, K, D, seed=1)
    ref = causal_attention(q, k, v)
    with mesh8:
        out = ulysses_attention(q, k, v, mesh=mesh8, axis="tp")
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_ulysses_impl_dispatch(mesh8):
    # the engine's prefill path reaches ulysses through causal_attention
    B, T, H, K, D = 1, 16, 4, 4, 8
    q, k, v = _qkv(B, T, H, K, D, seed=2)
    ref = causal_attention(q, k, v)
    with mesh8:
        out = causal_attention(q, k, v, impl="ulysses", ring_mesh=mesh8,
                               ring_axis="tp")
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_ulysses_rejects_bad_heads(mesh8):
    q, k, v = _qkv(1, 16, 6, 3, 8)    # 6 % 4 != 0
    with pytest.raises(ValueError):
        with mesh8:
            ulysses_attention(q, k, v, mesh=mesh8, axis="tp")
