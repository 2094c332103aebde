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
