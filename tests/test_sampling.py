import jax
import jax.numpy as jnp
import numpy as np

from deepsearch_tts_tpu.engine.sampling import (
    SamplingParams,
    apply_repetition_penalty,
    sample,
    update_seen,
)

V = 64


def _params(B, **kw):
    return SamplingParams.make(B, **kw)


def test_greedy_when_temp_zero():
    logits = jnp.zeros((2, V)).at[0, 7].set(5.0).at[1, 3].set(5.0)
    p = _params(2, temperature=0.0)
    seen = jnp.zeros((2, V), bool)
    toks = sample(logits, p, seen, jax.random.PRNGKey(0))
    assert toks.tolist() == [7, 3]


def test_topk_1_is_greedy_even_with_temp():
    logits = jnp.zeros((1, V)).at[0, 9].set(3.0)
    p = _params(1, temperature=1.0, top_k=1, top_p=1.0, min_p=0.0)
    toks = sample(logits, p, jnp.zeros((1, V), bool), jax.random.PRNGKey(1))
    assert toks.tolist() == [9]


def test_topp_excludes_tail():
    # one dominant token (p≈0.97); top_p=0.5 must always pick it
    logits = jnp.zeros((1, V)).at[0, 11].set(8.0)
    p = _params(1, temperature=1.0, top_k=0, top_p=0.5, min_p=0.0)
    for s in range(5):
        toks = sample(logits, p, jnp.zeros((1, V), bool), jax.random.PRNGKey(s))
        assert toks.tolist() == [11]


def test_min_p_filters():
    # two likely tokens, rest tiny; min_p=0.5 keeps only within 2x of max
    logits = jnp.full((1, V), -10.0).at[0, 1].set(2.0).at[0, 2].set(1.9)
    p = _params(1, temperature=1.0, top_k=0, top_p=1.0, min_p=0.5)
    seen = jnp.zeros((1, V), bool)
    toks = {int(sample(logits, p, seen, jax.random.PRNGKey(s))[0]) for s in range(20)}
    assert toks <= {1, 2}


def test_repetition_penalty_sign():
    logits = jnp.array([[2.0, -2.0, 0.5]])
    seen = jnp.array([[True, True, False]])
    out = apply_repetition_penalty(logits, seen, jnp.array([2.0]))
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, -4.0, 0.5])


def test_update_seen():
    seen = jnp.zeros((2, V), bool)
    seen = update_seen(seen, jnp.array([5, 6], jnp.int32))
    assert bool(seen[0, 5]) and bool(seen[1, 6]) and not bool(seen[0, 6])


def test_sampling_respects_distribution():
    # temperature sampling from two equal logits should hit both
    logits = jnp.full((1, V), -30.0).at[0, 0].set(1.0).at[0, 1].set(1.0)
    p = _params(1, temperature=1.0, top_k=0, top_p=1.0, min_p=0.0,
                repetition_penalty=1.0)
    seen = jnp.zeros((1, V), bool)
    draws = {int(sample(logits, p, seen, jax.random.PRNGKey(s))[0]) for s in range(30)}
    assert draws == {0, 1}


def test_fused_sampling_prep_matches_xla_path():
    """ops/sampling_prep.py (interpret mode) must reproduce the XLA chain:
    penalty -> EOS suppression -> temperature -> scaled + full-vocab lse."""
    import numpy as np

    from deepsearch_tts_tpu.ops.sampling_prep import sampling_prep

    rng = np.random.default_rng(0)
    B, V = 4, 4096
    logits = jnp.asarray(rng.standard_normal((B, V)) * 3, jnp.float32)
    seen = jnp.asarray(rng.random((B, V)) < 0.1)
    pen = jnp.asarray([1.0, 1.05, 1.2, 1.1], jnp.float32)
    temp = jnp.asarray([1.0, 0.7, 0.3, 1e-6], jnp.float32)
    suppress = jnp.asarray([True, False, True, False])
    eos = 17

    scaled, lse = sampling_prep(logits, seen, pen, temp, suppress, eos,
                                interpret=True)

    ref = jnp.where(seen, jnp.where(logits > 0, logits / pen[:, None],
                                    logits * pen[:, None]), logits)
    ref = ref.at[:, eos].add(jnp.where(suppress, -1e30, 0.0))
    ref = ref / temp[:, None]
    assert jnp.allclose(scaled, ref, rtol=1e-5, atol=1e-5)
    m = ref.max(axis=-1, keepdims=True)
    ref_lse = m + jnp.log(jnp.sum(jnp.exp(ref - m), axis=-1, keepdims=True))
    assert jnp.allclose(lse, ref_lse, rtol=1e-5, atol=1e-4)


def test_sample_fused_path_matches_default():
    """End-to-end sample() with fuse_prep forced on (interpret kernel) must
    pick the same tokens as the XLA chain."""
    import numpy as np

    rng = np.random.default_rng(1)
    B, V = 4, 4096
    logits = jnp.asarray(rng.standard_normal((B, V)) * 4, jnp.float32)
    seen = jnp.asarray(rng.random((B, V)) < 0.05)
    params = SamplingParams.make(B, temperature=0.7, top_k=20, top_p=0.8,
                                 min_p=0.05, repetition_penalty=1.05)
    key = jax.random.PRNGKey(0)
    a = sample(logits, params, seen, key, fuse_prep=False)
    b = sample(logits, params, seen, key, fuse_prep=True)
    assert jnp.array_equal(a, b)

    greedy = params._replace(temperature=jnp.zeros((B,), jnp.float32))
    ga = sample(logits, greedy, seen, key, fuse_prep=False)
    gb = sample(logits, greedy, seen, key, fuse_prep=True)
    assert jnp.array_equal(ga, gb)
