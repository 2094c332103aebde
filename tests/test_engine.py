import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
from deepsearch_tts_tpu.engine.stopping import StopState
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, forward, init_params

CFG = QWEN3_CONFIGS["qwen3-test"]


@pytest.fixture(scope="module")
def engine():
    tk = ByteTokenizer()
    eng = Engine(
        "qwen3-test", tk, max_slots=4, page_size=4, n_pages=128,
        max_seq_len=128, decode_chunk_len=4, seed=0,
    )
    yield eng
    eng.shutdown()


def _greedy_req(prompt_ids, max_tokens=8, **kw):
    return GenerationRequest(
        prompt_ids=prompt_ids, max_tokens=max_tokens, temperature=0.0,
        repetition_penalty=1.0, **kw,
    )


def test_greedy_matches_oracle_first_token(engine):
    prompt = [10, 20, 30, 40, 50]
    res = engine.generate(_greedy_req(prompt, max_tokens=4))
    toks = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, _ = forward(engine.params, CFG, toks, pos)
    oracle_first = int(jnp.argmax(logits[0, -1]))
    assert res.token_ids[0] == oracle_first
    assert res.prompt_tokens == len(prompt)
    assert res.completion_tokens == len(res.token_ids) == 4
    assert res.finish_reason == "length"


def test_greedy_deterministic(engine):
    prompt = [1, 2, 3, 4, 5, 6, 7]
    r1 = engine.generate(_greedy_req(prompt, max_tokens=10))
    r2 = engine.generate(_greedy_req(prompt, max_tokens=10))
    assert r1.token_ids == r2.token_ids


def test_concurrent_requests(engine):
    prompts = [[i, i + 1, i + 2, i + 3] for i in range(5, 45, 8)]
    futs = [engine.submit(_greedy_req(p, max_tokens=6)) for p in prompts]
    results = [f.result(timeout=300) for f in futs]
    assert all(len(r.token_ids) == 6 for r in results)
    # concurrency must not change greedy outputs
    again = [engine.generate(_greedy_req(p, max_tokens=6)) for p in prompts]
    for r1, r2 in zip(results, again):
        assert r1.token_ids == r2.token_ids


def test_prefix_cache_reuse(engine):
    prompt = list(range(30, 60))  # long enough for several full pages
    r1 = engine.generate(_greedy_req(prompt, max_tokens=6))
    hits_before = engine.prefix_cache.hits
    r2 = engine.generate(_greedy_req(prompt, max_tokens=6))
    assert engine.prefix_cache.hits > hits_before
    assert r2.cached_prompt_tokens > 0
    assert r1.token_ids == r2.token_ids  # page sharing must not change logits


def test_max_tokens_respected(engine):
    res = engine.generate(_greedy_req([7, 8, 9], max_tokens=3))
    assert res.completion_tokens == 3 and res.finish_reason == "length"


def test_stop_state_cross_token_boundary():
    st = StopState(stop_sequences=("STOP",), eos_ids=(), max_tokens=100)
    for tok, piece in enumerate(["hello S", "TO", "P world"]):
        done = st.feed(tok, piece)
    assert done and st.finish_reason == "stop"
    assert st.text == "hello "


def test_stop_state_include_stop_str():
    st = StopState(stop_sequences=("</x>",), eos_ids=(), max_tokens=100,
                   include_stop_str=True)
    st.feed(0, "abc</x>def")
    assert st.text == "abc</x>"


def test_stop_state_eos():
    st = StopState(stop_sequences=(), eos_ids=(99,), max_tokens=100)
    assert st.feed(99, "<eos>")
    assert st.finish_reason == "stop"


def test_engine_stop_sequence(engine):
    # engine must cut the text at the stop sequence even mid-chunk
    tk = engine.tokenizer
    prompt = tk.encode("q")
    res = engine.generate(GenerationRequest(
        prompt_ids=prompt, max_tokens=20, temperature=0.0,
        repetition_penalty=1.0,
        stop=(tk.decode(engine.generate(_greedy_req(prompt, max_tokens=3)).token_ids[2:3]),),
    ))
    assert res.finish_reason in ("stop", "length")


def test_telemetry(engine):
    t = engine.telemetry()
    assert t["requests"] > 0 and t["decode_tokens"] > 0
    assert "prefix_cache" in t


def test_oversized_max_tokens_does_not_gut_prompt_or_kill_engine():
    """Regression (ADVICE r1, high): a request whose max_tokens+1 >=
    max_seq_len used to flip the truncation slice positive, overflow the
    prefill bucket, and crash the whole engine loop — failing unrelated
    in-flight requests. Now: the bad request degrades gracefully and a
    concurrent request is unaffected."""
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=4, page_size=4,
                 n_pages=256, max_seq_len=128, decode_chunk_len=4, seed=0)
    bad = GenerationRequest(prompt_ids=list(range(1, 201)) , max_tokens=128,
                            temperature=0.0, repetition_penalty=1.0)
    good = _greedy_req([5, 6, 7, 8], max_tokens=6)
    fb, fg = eng.submit(bad), eng.submit(good)
    rg = fg.result(timeout=300)
    rb = fb.result(timeout=300)
    eng.shutdown()
    assert len(rg.token_ids) == 6                       # unaffected
    assert rb.completion_tokens > 0                     # degraded, not dead
    assert rb.finish_reason in ("stop", "length")


def test_prefill_group_failure_isolated():
    """A poisoned prefill group fails only its own futures; the engine keeps
    serving (per-group error isolation in _admit)."""
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=4, page_size=4,
                 n_pages=128, max_seq_len=128, decode_chunk_len=4, seed=0)
    orig = eng._prefill_group_dispatch
    calls = {"n": 0}

    def boom(bucket, grp):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected prefill failure")
        return orig(bucket, grp)

    eng._prefill_group_dispatch = boom
    f1 = eng.submit(_greedy_req([1, 2, 3], max_tokens=4))
    import concurrent.futures

    with pytest.raises(RuntimeError, match="injected"):
        f1.result(timeout=300)
    # engine thread must still be alive and serving
    r2 = eng.generate(_greedy_req([4, 5, 6], max_tokens=4))
    eng.shutdown()
    assert len(r2.token_ids) == 4


def test_warmup_precompiles_and_preserves_outputs():
    """warmup() must not change served results (dummy work is dropped), and
    must leave the prefill jit cache populated for the warmed shapes."""
    tk = ByteTokenizer()
    ref = Engine("qwen3-test", tk, max_slots=4, page_size=4, n_pages=128,
                 max_seq_len=128, decode_chunk_len=4, seed=0)
    r_ref = ref.generate(_greedy_req([9, 8, 7, 6, 5], max_tokens=6))
    ref.shutdown()

    eng = Engine("qwen3-test", tk, max_slots=4, page_size=4, n_pages=128,
                 max_seq_len=128, decode_chunk_len=4, seed=0)
    eng.warmup(prompt_lens=(5,), group_sizes=(1, 4))
    # prefix-reusing engines (the default: paged + prefix cache) warm the
    # NON-fresh program universally (r4: one variant per shape keeps the
    # lazy-compile tail short on axon)
    assert ((16, 1, False, False) in eng._jit_cache
            and (16, 4, False, False) in eng._jit_cache)
    r = eng.generate(_greedy_req([9, 8, 7, 6, 5], max_tokens=6))
    eng.shutdown()
    assert r.token_ids == r_ref.token_ids


def test_fresh_prefill_path_used_and_correct():
    """Regression (ADVICE r1, medium): the fresh_prefill flag is actually
    passed into the model forward (it was dead — computed but dropped).
    r4: prefix-REUSING engines run the non-fresh program universally (one
    variant per shape, short lazy-compile tail), so the fresh path is
    asserted on a prefix-less engine and the non-fresh path on the
    default; first tokens must match the oracle on both."""
    from deepsearch_tts_tpu.models.qwen3 import forward as q3_forward

    def make_spy(flags):
        def spy(params, cfg, tokens, positions, **kw):
            if kw.get("k_pages") is not None and tokens.shape[1] > 1:
                flags.append(kw.get("fresh_prefill", False))
            return q3_forward(params, cfg, tokens, positions, **kw)
        return spy

    toks = jnp.asarray([list(range(20, 40))], jnp.int32)
    pos = jnp.arange(20, dtype=jnp.int32)[None]

    flags_fresh: list = []
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=2, page_size=4,
                 n_pages=128, max_seq_len=128, decode_chunk_len=4, seed=0,
                 enable_prefix_cache=False)
    eng.forward = make_spy(flags_fresh)
    r1 = eng.generate(_greedy_req(list(range(20, 40)), max_tokens=6))
    logits, _ = forward(eng.params, CFG, toks, pos)
    oracle = int(jnp.argmax(logits[0, -1]))
    eng.shutdown()
    assert flags_fresh and flags_fresh[0] is True, flags_fresh
    assert r1.token_ids[0] == oracle

    flags_cached: list = []
    eng2 = Engine("qwen3-test", ByteTokenizer(), max_slots=2, page_size=4,
                  n_pages=128, max_seq_len=128, decode_chunk_len=4, seed=0)
    eng2.forward = make_spy(flags_cached)
    r2 = eng2.generate(_greedy_req(list(range(20, 40)), max_tokens=6))
    eng2.shutdown()
    assert flags_cached and flags_cached[0] is False, flags_cached
    assert r2.token_ids[0] == oracle
    assert r2.token_ids == r1.token_ids


def test_pipelined_decode_matches_serial():
    """Speculative chunk-ahead dispatch must not change outputs: mixed-length
    greedy requests through a pipelined engine equal a serial engine's."""
    tk = ByteTokenizer()
    prompts = [[7, 8, 9, 10, 11], [30, 31], [50, 51, 52, 53, 54, 55, 56],
               [90, 91, 92]]
    lens = [17, 3, 9, 25]  # straddle several chunk boundaries

    outs = {}
    for flag in (True, False):
        eng = Engine("qwen3-test", tk, max_slots=4, page_size=4, n_pages=128,
                     max_seq_len=128, decode_chunk_len=4, seed=0,
                     pipeline_decode=flag)
        futs = [eng.submit(_greedy_req(p, max_tokens=n))
                for p, n in zip(prompts, lens)]
        outs[flag] = [f.result(timeout=600) for f in futs]
        eng.shutdown()
    for a, b in zip(outs[True], outs[False]):
        assert a.token_ids == b.token_ids
        assert a.finish_reason == b.finish_reason
        assert len(a.token_ids) == a.completion_tokens


def test_submit_many_atomic_batch():
    tk = ByteTokenizer()
    eng = Engine("qwen3-test", tk, max_slots=4, page_size=4, n_pages=128,
                 max_seq_len=128, decode_chunk_len=4, seed=0)
    try:
        reqs = [_greedy_req([i, i + 1, i + 2], max_tokens=5) for i in range(4)]
        futs = eng.submit_many(reqs)
        results = [f.result(timeout=600) for f in futs]
        assert all(len(r.token_ids) == 5 for r in results)
        # equals per-request submission
        singles = [eng.generate(_greedy_req([i, i + 1, i + 2], max_tokens=5))
                   for i in range(4)]
        for a, b in zip(results, singles):
            assert a.token_ids == b.token_ids
    finally:
        eng.shutdown()


def test_prefill_group_token_budget_cap():
    """Long buckets must cap the prefill group width: the fresh-prefill
    causal path scores [G, H, T, T] in f32, so rows x bucket per dispatch is
    bounded by PREFILL_TOKEN_BUDGET (16x2048-token groups OOM real HBM)."""
    tk = ByteTokenizer()
    eng = Engine("qwen3-test", tk, max_slots=4, page_size=16, n_pages=256,
                 max_seq_len=2048, decode_chunk_len=4)
    assert eng._group_cap(16) == eng.MAX_PREFILL_GROUP
    assert eng._group_cap(1024) == max(1, eng.PREFILL_TOKEN_BUDGET // 1024)
    assert eng._group_cap(2048) == max(1, eng.PREFILL_TOKEN_BUDGET // 2048)
    assert eng._group_cap(10 * eng.PREFILL_TOKEN_BUDGET) == 1
    # an actual long-prompt admission goes through the capped path
    r = eng.generate(GenerationRequest(
        prompt_ids=list(range(50)) * 12, max_tokens=4, temperature=0.0,
        top_k=0, top_p=1.0, min_p=0.0, repetition_penalty=1.0))
    assert len(r.token_ids) == 4
    eng.shutdown()


def test_chunk_trim_matches_untrimmed_greedy():
    """chunk_trim dispatches a half-length decode chunk when a row is within
    half a chunk of its known max_tokens completion. Chunk partitioning must
    not change per-step math: greedy outputs are bit-identical to the
    untrimmed engine, and the trimmed engine must actually trim."""
    tk = ByteTokenizer()
    kw = dict(max_slots=4, page_size=4, n_pages=64, max_seq_len=64,
              decode_chunk_len=8, seed=0, cache_mode="slot",
              context_buckets=False)
    eng_a = Engine("qwen3-test", tk, **kw)
    eng_b = Engine("qwen3-test", tk, chunk_trim=True, **kw)
    eng_b.warmup()
    try:
        prompts = [[i, i + 1, i + 2, i + 3] for i in range(5, 37, 8)]
        # max_tokens just past a chunk boundary -> the tail dispatch trims
        lens = [9, 11, 13, 10]
        fa = [eng_a.submit(_greedy_req(p, max_tokens=n))
              for p, n in zip(prompts, lens)]
        ra = [f.result(timeout=600) for f in fa]
        fb = [eng_b.submit(_greedy_req(p, max_tokens=n))
              for p, n in zip(prompts, lens)]
        rb = [f.result(timeout=600) for f in fb]
        for a, b in zip(ra, rb):
            assert a.token_ids == b.token_ids
            assert a.completion_tokens == b.completion_tokens
        assert eng_b.stats["trim_chunks"] > 0
        assert eng_a.stats["trim_chunks"] == 0
    finally:
        eng_a.shutdown()
        eng_b.shutdown()
