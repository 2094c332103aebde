"""Speculative decoding (n-gram drafting + K-token verify) tests.

The engine-level contract: a speculative engine produces bit-identical
greedy outputs to a plain engine (exact-match acceptance emits only true
samples), accepts >1 token/step on self-repeating sequences, and composes
with the engine's stop handling, slot parking, and concurrency machinery.

No reference counterpart (the reference rents inference over HTTP,
scripts/deep_search.py:287-335); this is vLLM-class serving capability.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
from deepsearch_tts_tpu.engine.speculative import accept_drafts, ngram_draft
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer


# ------------------------------------------------------------ unit: drafting

def test_ngram_draft_finds_most_recent_continuation():
    # history: ... (7 8) 9 1 ... (7 8) 5 6 | current gram (7 8) at the end
    hist = np.zeros((2, 32), np.int32)
    row = [3, 7, 8, 9, 1, 2, 7, 8, 5, 6, 4, 7, 8]
    hist[0, : len(row)] = row
    lens = np.array([len(row) - 1, 0], np.int32)  # last token = hist[12] = 8
    d = np.asarray(ngram_draft(jnp.asarray(hist), jnp.asarray(lens), k=3, n=2))
    # most recent prior (7 8) is at positions 6-7 → continuation 5, 6, 4
    assert d[0].tolist() == [5, 6, 4]


def test_ngram_draft_no_match_falls_back_to_last_token():
    hist = np.zeros((1, 16), np.int32)
    hist[0, :5] = [1, 2, 3, 4, 5]
    lens = np.array([4], np.int32)
    d = np.asarray(ngram_draft(jnp.asarray(hist), jnp.asarray(lens), k=2, n=2))
    assert d[0].tolist() == [5, 5]


def test_ngram_draft_continuation_clipped_at_history_end():
    # the match continuation would run past the last valid position
    hist = np.zeros((1, 16), np.int32)
    hist[0, :6] = [7, 8, 9, 1, 7, 8]   # gram (7 8) matches at 0; cont = 9, 1
    lens = np.array([5], np.int32)
    d = np.asarray(ngram_draft(jnp.asarray(hist), jnp.asarray(lens), k=4, n=2))
    # positions 2,3 valid (9, 1); 4,5 are <= lens so also valid (7, 8)
    assert d[0].tolist() == [9, 1, 7, 8]


def test_accept_drafts_prefix_rule():
    sampled = jnp.asarray([[5, 6, 7, 8], [5, 9, 7, 8], [1, 2, 3, 4]])
    draft = jnp.asarray([[5, 6, 7], [5, 6, 7], [9, 9, 9]])
    active = jnp.asarray([True, True, False])
    ncons, nxt, alive = accept_drafts(sampled, draft, active)
    # row 0: all 3 drafts match → 4 tokens, last = 8
    # row 1: first matches, second (9 != 6) is the correction → 2, last = 9
    # row 2: inactive → 0
    assert np.asarray(ncons).tolist() == [4, 2, 0]
    assert np.asarray(nxt).tolist()[:2] == [8, 9]
    assert np.asarray(alive)[1].tolist() == [True, True, False, False]


# -------------------------------------------------------- engine integration

@pytest.fixture(scope="module")
def engines():
    tk = ByteTokenizer()
    spec = Engine("qwen3-test", tk, max_slots=4, page_size=4, n_pages=128,
                  max_seq_len=128, decode_chunk_len=4, seed=0,
                  cache_mode="slot", speculative="ngram", spec_k=3)
    ref = Engine("qwen3-test", tk, max_slots=4, page_size=4, n_pages=128,
                 max_seq_len=128, decode_chunk_len=4, seed=0,
                 cache_mode="slot")
    yield spec, ref
    spec.shutdown()
    ref.shutdown()


def _greedy(p, n=16, **kw):
    return GenerationRequest(prompt_ids=p, max_tokens=n, temperature=0.0,
                             repetition_penalty=1.0, **kw)


def test_greedy_bit_identical_to_plain_engine(engines):
    spec, ref = engines
    for prompt in ([10, 20, 30, 40, 50], [1, 2, 3, 1, 2, 3, 1, 2],
                   [9, 9, 9, 9], list(range(64, 96))):
        r1 = spec.generate(_greedy(prompt, n=24))
        r2 = ref.generate(_greedy(prompt, n=24))
        assert r1.token_ids == r2.token_ids
        assert r1.finish_reason == r2.finish_reason
        assert r1.completion_tokens == r2.completion_tokens


def test_acceptance_beats_one_token_per_step(engines):
    spec, _ = engines
    # random-init greedy decode settles into cycles → the n-gram draft hits
    t0 = dict(spec.stats)
    spec.generate(_greedy([10, 20, 30, 40, 50], n=32))
    dt = spec.stats["decode_tokens"] - t0["decode_tokens"]
    ds = spec.stats["slot_steps"] - t0["slot_steps"]
    assert dt / max(ds, 1) > 1.0
    assert "spec_tokens_per_step" in spec.telemetry()


def test_sampled_decode_deterministic_per_seed():
    # two fresh engines with the same seed must produce identical sampled
    # streams (the rng is engine state, so a shared fixture won't do)
    req = lambda: GenerationRequest(
        prompt_ids=[5, 6, 7, 8], max_tokens=12, temperature=0.8, top_k=20,
        top_p=0.9, repetition_penalty=1.05)
    outs = []
    for _ in range(2):
        eng = Engine("qwen3-test", ByteTokenizer(), max_slots=4, page_size=4,
                     n_pages=128, max_seq_len=128, decode_chunk_len=4, seed=0,
                     cache_mode="slot", speculative="ngram", spec_k=3)
        try:
            outs.append((eng.generate(req()).token_ids,
                         eng.generate(req()).token_ids))
        finally:
            eng.shutdown()
    assert len(outs[0][0]) == 12
    assert outs[0] == outs[1]


def test_concurrent_spec_requests_match_sequential(engines):
    spec, ref = engines
    prompts = [[i, i + 1, i + 2, i + 3] for i in range(5, 37, 8)]
    futs = [spec.submit(_greedy(p, n=10)) for p in prompts]
    results = [f.result(timeout=300) for f in futs]
    for p, r in zip(prompts, results):
        assert r.token_ids == ref.generate(_greedy(p, n=10)).token_ids


def test_max_tokens_exact(engines):
    spec, _ = engines
    r = spec.generate(_greedy([7, 8, 9], n=5))
    assert r.completion_tokens == 5
    assert len(r.token_ids) == 5
    assert r.finish_reason == "length"


def test_eos_mid_window(engines):
    spec, ref = engines
    tk = spec.tokenizer
    # drive until natural EOS (or length) and compare the cut point exactly
    prompt = tk.encode("abc")
    r1 = spec.generate(_greedy(prompt, n=40))
    r2 = ref.generate(_greedy(prompt, n=40))
    assert r1.token_ids == r2.token_ids
    assert r1.finish_reason == r2.finish_reason


def test_stop_sequence_respected(engines):
    spec, ref = engines
    tk = spec.tokenizer
    prompt = tk.encode("q")
    base = ref.generate(_greedy(prompt, n=8))
    stop_txt = tk.decode(base.token_ids[3:4])
    r = spec.generate(GenerationRequest(
        prompt_ids=prompt, max_tokens=20, temperature=0.0,
        repetition_penalty=1.0, stop=(stop_txt,)))
    assert r.finish_reason in ("stop", "length")
    assert stop_txt not in r.text


def test_min_tokens_eos_suppression(engines):
    spec, ref = engines
    prompt = [40, 41, 42]
    r_ref = ref.generate(GenerationRequest(
        prompt_ids=prompt, max_tokens=30, temperature=0.0,
        repetition_penalty=1.0, min_tokens=25))
    r = spec.generate(GenerationRequest(
        prompt_ids=prompt, max_tokens=30, temperature=0.0,
        repetition_penalty=1.0, min_tokens=25))
    assert r.token_ids == r_ref.token_ids
    assert r.completion_tokens >= 25 or r.finish_reason == "length"


def test_spec_with_slot_parking_multiturn(engines):
    spec, ref = engines
    turn1 = [3, 1, 4, 1, 5, 9, 2, 6]
    a1 = spec.generate(_greedy(turn1, n=8))
    b1 = ref.generate(_greedy(turn1, n=8))
    assert a1.token_ids == b1.token_ids
    hits0 = spec.stats["slot_park_hits"]
    turn2 = turn1 + a1.token_ids + [7, 7]
    a2 = spec.generate(_greedy(turn2, n=8))
    b2 = ref.generate(_greedy(turn1 + b1.token_ids + [7, 7], n=8))
    assert spec.stats["slot_park_hits"] > hits0   # re-entered the parked row
    assert a2.cached_prompt_tokens > 0
    assert a2.token_ids == b2.token_ids


def test_spec_layer_fusion_matches_unfused():
    """Verify steps through the fused T>1 path (flattened-window layer
    kernels + slot_window_attention, interpret mode on CPU) must reproduce
    the fused NON-speculative engine's greedy stream exactly: the windowed
    kernels process each position with the same per-row math and the same
    online-softmax block order as the T=1 kernels, so exact-match
    acceptance keeps greedy bit-identity within the fused impl. (Cross-impl
    token equality — fused vs XLA — is NOT asserted: near-ties on a
    random-init model can flip, CLAUDE.md.)"""
    tk = ByteTokenizer()
    kw = dict(max_slots=4, page_size=4, n_pages=128, max_seq_len=128,
              decode_chunk_len=4, seed=0, cache_mode="slot",
              layer_fusion=True, attn_impl="pallas")
    ref = Engine("qwen3-test", tk, **kw)
    eng = Engine("qwen3-test", tk, speculative="ngram", spec_k=3, **kw)
    assert eng.packed, "layer_fusion must force packed weights"
    try:
        for prompt in ([10, 20, 30, 40, 50], [1, 2, 3, 1, 2, 3, 1, 2],
                       list(range(64, 96))):
            r1 = eng.generate(_greedy(prompt, n=24))
            r2 = ref.generate(_greedy(prompt, n=24))
            assert r1.token_ids == r2.token_ids
            assert r1.finish_reason == r2.finish_reason
        # the fused path must still accept drafts (cycling greedy decode)
        t0 = dict(eng.stats)
        eng.generate(_greedy([10, 20, 30, 40, 50], n=32))
        dt = eng.stats["decode_tokens"] - t0["decode_tokens"]
        ds = eng.stats["slot_steps"] - t0["slot_steps"]
        assert dt / max(ds, 1) > 1.0
    finally:
        eng.shutdown()
        ref.shutdown()


def test_constructor_validation():
    tk = ByteTokenizer()
    with pytest.raises(ValueError, match="slot"):
        Engine("qwen3-test", tk, cache_mode="paged", speculative="ngram")
    with pytest.raises(ValueError, match="unknown speculative"):
        Engine("qwen3-test", tk, cache_mode="slot", speculative="medusa")
    with pytest.raises(ValueError, match="lane"):
        Engine("qwen3-test", tk, cache_mode="slot", speculative="ngram",
               prefill_lane=16)
