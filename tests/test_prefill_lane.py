"""In-flight chunked prefill (the engine's prefill lane).

With ``prefill_lane=N``, prompts arriving while decode runs stream N
tokens per decode step through the same forward pass instead of stalling
decode with dedicated prefill dispatches (models/qwen3.forward lane args;
engine _plan_lane/_lane_arrays). These tests pin: token-identical greedy
outputs vs the lane-less engine, actual lane usage, multi-chunk prompts,
aborts mid-stream, and cold-burst fallback to batched prefill.
"""
import threading

import numpy as np
import pytest

from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, init_params

import jax


def _greedy(prompt_ids, max_tokens=8, **kw):
    return GenerationRequest(prompt_ids=prompt_ids, max_tokens=max_tokens,
                             temperature=0.0, repetition_penalty=1.0, **kw)


@pytest.fixture(scope="module")
def shared_params():
    return init_params(QWEN3_CONFIGS["qwen3-test"], jax.random.PRNGKey(0))


def _mk_engine(params, lane=0):
    return Engine("qwen3-test", ByteTokenizer(), params=params, max_slots=4,
                  page_size=4, n_pages=128, max_seq_len=128,
                  decode_chunk_len=4, seed=0, prefill_lane=lane,
                  enable_prefix_cache=False)


def _run_staggered(eng):
    """One long request starts decoding; three more arrive mid-decode."""
    first_delta = threading.Event()
    f0 = eng.submit(_greedy([1, 2, 3, 4, 5, 6], max_tokens=24,
                            on_delta=lambda _t: first_delta.set()))
    assert first_delta.wait(timeout=300)
    prompts = [list(range(10, 10 + n)) for n in (5, 9, 14)]
    futs = [eng.submit(_greedy(p, max_tokens=6)) for p in prompts]
    return [f0.result(timeout=600)] + [f.result(timeout=600) for f in futs]


def test_lane_outputs_match_laneless_engine(shared_params):
    a = _mk_engine(shared_params, lane=0)
    try:
        want = _run_staggered(a)
    finally:
        a.shutdown()
    b = _mk_engine(shared_params, lane=16)
    try:
        got = _run_staggered(b)
        stats = dict(b.stats)
    finally:
        b.shutdown()
    assert stats["lane_tokens"] > 0, "lane never engaged"
    for w, g in zip(want, got):
        assert w.token_ids == g.token_ids
        assert g.finish_reason == w.finish_reason


def test_lane_multi_chunk_prompt(shared_params):
    """A prompt longer than the lane width is NOT lane-eligible (fresh-only
    one-shot contract, r4): it takes batched-injected prefill mid-decode
    and still decodes token-identically."""
    long_prompt = list(np.random.default_rng(1).integers(1, 250, size=60))
    a = _mk_engine(shared_params, lane=0)
    try:
        wref = a.generate(_greedy(long_prompt, max_tokens=6))
        first_delta = threading.Event()
        a.submit(_greedy([7, 8, 9], max_tokens=30,
                         on_delta=lambda _t: first_delta.set()))
        first_delta.wait(timeout=300)
        want = a.generate(_greedy(long_prompt, max_tokens=6))
        assert want.token_ids == wref.token_ids
    finally:
        a.shutdown()

    b = _mk_engine(shared_params, lane=16)
    try:
        first_delta = threading.Event()
        b.submit(_greedy([7, 8, 9], max_tokens=30,
                         on_delta=lambda _t: first_delta.set()))
        assert first_delta.wait(timeout=300)
        got = b.generate(_greedy(long_prompt, max_tokens=6))
        # 60 tokens > Tp=16: went through batched prefill, not the lane
        assert b.stats["lane_tokens"] == 0
    finally:
        b.shutdown()
    assert got.token_ids == want.token_ids


def test_lane_abort_mid_stream(shared_params):
    eng = _mk_engine(shared_params, lane=16)
    try:
        first_delta = threading.Event()
        f0 = eng.submit(_greedy([3, 4, 5], max_tokens=40,
                                on_delta=lambda _t: first_delta.set()))
        assert first_delta.wait(timeout=300)
        victim = eng.submit(_greedy(list(range(20, 30)), max_tokens=6,
                                    request_id="lane-victim"))
        eng.abort("lane-victim")
        assert f0.result(timeout=600).completion_tokens == 40
        import concurrent.futures

        # the abort may land before the one-shot lane entry dispatches
        # (future cancelled) or after it activated (finish_reason aborted)
        try:
            r = victim.result(timeout=600)
            assert r.finish_reason == "aborted"
        except concurrent.futures.CancelledError:
            pass
        # engine healthy afterwards; no page leak
        r = eng.generate(_greedy([9, 9, 9], max_tokens=4))
        assert r.completion_tokens == 4
        held = len(eng.allocator._refs)
        assert eng.allocator.num_free + held == eng.n_pages - 1
    finally:
        eng.shutdown()


def test_lane_max_act_override(shared_params):
    """lane_max_act sizes in-program activations per chunk to the expected
    churn; outputs stay identical to the lane-less engine at any value."""
    a = _mk_engine(shared_params, lane=0)
    try:
        want = _run_staggered(a)
    finally:
        a.shutdown()
    b = Engine("qwen3-test", ByteTokenizer(), params=shared_params,
               max_slots=4, page_size=4, n_pages=128, max_seq_len=128,
               decode_chunk_len=4, seed=0, prefill_lane=16, lane_max_act=2,
               enable_prefix_cache=False)
    try:
        assert b.LANE_MAX_ACT == 2 and Engine.LANE_MAX_ACT == 8
        got = _run_staggered(b)
        assert b.stats["lane_tokens"] > 0
    finally:
        b.shutdown()
    for w, g in zip(want, got):
        assert w.token_ids == g.token_ids


def test_cold_burst_uses_batched_prefill(shared_params):
    """With nothing decoding, a burst takes the batched prefill path (lane
    admission requires active decode rows)."""
    eng = _mk_engine(shared_params, lane=4)
    try:
        futs = eng.submit_many([_greedy([i, i + 1, i + 2], max_tokens=4)
                                for i in range(4)])
        rs = [f.result(timeout=600) for f in futs]
        assert all(r.completion_tokens == 4 for r in rs)
    finally:
        eng.shutdown()


def test_lane_moe_family():
    """The MoE family supports the lane too (same contract): staggered
    outputs match the lane-less MoE engine."""
    from deepsearch_tts_tpu.models.qwen3_moe import (
        QWEN3_MOE_CONFIGS,
        init_params as moe_init,
    )

    params = moe_init(QWEN3_MOE_CONFIGS["qwen3-moe-test"],
                      jax.random.PRNGKey(0))

    def mk(lane):
        return Engine("qwen3-moe-test", ByteTokenizer(), params=params,
                      max_slots=3, page_size=4, n_pages=64, max_seq_len=64,
                      decode_chunk_len=4, seed=0, prefill_lane=lane,
                      enable_prefix_cache=False)

    def run(eng):
        first = threading.Event()
        f0 = eng.submit(_greedy([1, 2, 3], max_tokens=16,
                                on_delta=lambda _t: first.set()))
        assert first.wait(timeout=300)
        f1 = eng.submit(_greedy(list(range(20, 31)), max_tokens=5))
        return f0.result(timeout=600).token_ids, f1.result(timeout=600).token_ids

    a = mk(0)
    try:
        want = run(a)
    finally:
        a.shutdown()
    b = mk(16)
    try:
        got = run(b)
        assert b.stats["lane_tokens"] > 0
    finally:
        b.shutdown()
    assert got == want


# ----------------------------------------------------------- slot-mode lane

def _mk_slot_engine(params, lane=0):
    return Engine("qwen3-test", ByteTokenizer(), params=params, max_slots=4,
                  page_size=4, n_pages=128, max_seq_len=128,
                  decode_chunk_len=4, seed=0, prefill_lane=lane,
                  cache_mode="slot")


def test_slot_lane_outputs_match_laneless_slot_engine(shared_params):
    """Slot-cache lane (r4): prompts stream through decode steps writing
    into the slot row's contiguous buffer; greedy outputs must be
    token-identical to the lane-less slot engine."""
    a = _mk_slot_engine(shared_params, lane=0)
    try:
        want = _run_staggered(a)
    finally:
        a.shutdown()
    b = _mk_slot_engine(shared_params, lane=16)
    try:
        got = _run_staggered(b)
        stats = dict(b.stats)
    finally:
        b.shutdown()
    for w, g in zip(want, got):
        assert w.token_ids == g.token_ids
    assert stats["lane_tokens"] > 0          # the lane actually carried work


def test_slot_lane_matches_paged_engine(shared_params):
    """Cross-layout check: slot+lane greedy outputs equal paged lane-less."""
    a = _mk_engine(shared_params, lane=0)
    try:
        want = _run_staggered(a)
    finally:
        a.shutdown()
    b = _mk_slot_engine(shared_params, lane=16)
    try:
        got = _run_staggered(b)
    finally:
        b.shutdown()
    for w, g in zip(want, got):
        assert w.token_ids == g.token_ids


def test_fresh_lane_one_shot_prompts(shared_params):
    """Wide lane (Tp >= prompt): each prompt prefills causally within ONE
    decode step (lane_fresh path — no KV-pool read). Token-identical to the
    lane-less engine in both cache layouts."""
    for mk in (_mk_engine, _mk_slot_engine):
        a = mk(shared_params, lane=0)
        try:
            want = _run_staggered(a)
        finally:
            a.shutdown()
        b = mk(shared_params, lane=16)   # prompts are 5/9/14 tokens
        try:
            got = _run_staggered(b)
            stats = dict(b.stats)
        finally:
            b.shutdown()
        for w, g in zip(want, got):
            assert w.token_ids == g.token_ids
        assert stats["lane_tokens"] > 0
