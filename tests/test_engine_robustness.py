"""Engine robustness battery: abort mid-flight, KV exhaustion under
sustained load, and concurrent server streams.

The reference's failure story is retry ladders around rented HTTP inference
(SURVEY.md §5); owning the engine means owning these failure modes. These
tests pin: aborts release slots without corrupting later greedy output,
page exhaustion defers (not drops) admissions and never leaks pages, a
prompt that can never fit fails loudly, and the OpenAI server survives a
burst of concurrent SSE streams.
"""
import asyncio
import concurrent.futures
import json
import threading
import urllib.request

import numpy as np
import pytest

from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer


def _greedy(prompt_ids, max_tokens=8, **kw):
    return GenerationRequest(prompt_ids=prompt_ids, max_tokens=max_tokens,
                             temperature=0.0, repetition_penalty=1.0, **kw)


@pytest.fixture()
def small_engine():
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=4, page_size=4,
                 n_pages=128, max_seq_len=128, decode_chunk_len=4, seed=0)
    yield eng
    eng.shutdown()


def test_abort_mid_generation_frees_slot_and_keeps_engine_sane(small_engine):
    eng = small_engine
    # baseline greedy output with a clean engine
    baseline = eng.generate(_greedy([9, 8, 7, 6], max_tokens=6)).token_ids

    got_delta = threading.Event()
    rid = "abort-me"

    def on_delta(_piece):
        if not got_delta.is_set():
            got_delta.set()
            eng.abort(rid)

    fut = eng.submit(_greedy([1, 2, 3, 4], max_tokens=100,
                             request_id=rid, on_delta=on_delta))
    res = fut.result(timeout=300)
    assert got_delta.is_set()
    assert res.finish_reason == "aborted"
    assert res.completion_tokens < 100

    # all slots are free again and pages were released
    assert all(not s.active and s.req is None for s in eng.slots)
    # the abort must not have poisoned KV/prefix state for later requests
    after = eng.generate(_greedy([9, 8, 7, 6], max_tokens=6)).token_ids
    assert after == baseline


def test_abort_queued_request_cancels_future():
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=1, page_size=4,
                 n_pages=64, max_seq_len=128, decode_chunk_len=4, seed=0)
    try:
        running = eng.submit(_greedy([5, 6, 7], max_tokens=40,
                                     request_id="running"))
        queued = eng.submit(_greedy([8, 9, 10], max_tokens=4,
                                    request_id="queued"))
        eng.abort("queued")
        assert running.result(timeout=300).completion_tokens == 40
        with pytest.raises(concurrent.futures.CancelledError):
            queued.result(timeout=300)
    finally:
        eng.shutdown()


def test_kv_exhaustion_defers_admissions_under_sustained_load():
    """More in-flight demand than the page pool holds: admissions defer
    until pages free, every request still completes in full, and the pool
    ends clean (no leaked pages)."""
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=4, page_size=4,
                 n_pages=32, max_seq_len=128, decode_chunk_len=4, seed=0)
    try:
        # each request needs ~11 of the 32 pages → at most 2 run at once
        rng = np.random.default_rng(0)
        prompts = [[int(x) for x in rng.integers(1, 200, size=24)]
                   for _ in range(12)]
        futs = eng.submit_many([_greedy(p, max_tokens=16) for p in prompts])
        results = [f.result(timeout=600) for f in futs]
        # memory pressure must never truncate a generation: every request
        # either used its full token budget or stopped on a genuine EOS
        # (preempted sequences are requeued with their progress intact)
        for r in results:
            assert (r.completion_tokens == 16 and r.finish_reason == "length"
                    ) or r.finish_reason == "stop", (
                r.completion_tokens, r.finish_reason)

        # page accounting is clean: with every slot idle, a page is either
        # free or refcounted by the prefix cache — none vanished
        assert all(not s.active and s.req is None for s in eng.slots)
        held = len(eng.allocator._refs)
        assert eng.allocator.num_free + held == eng.n_pages - 1  # page 0 never handed out

        # engine still serves fresh work
        r = eng.generate(_greedy([3, 1, 4, 1, 5], max_tokens=4))
        assert r.completion_tokens == 4
    finally:
        eng.shutdown()


def test_preempted_sequence_resumes_token_identical():
    """Force a mid-decode preemption and check the resumed generation is
    token-identical to the same request run without memory pressure."""
    prompt_a = list(range(40, 60))
    prompt_b = list(range(140, 160))

    ref = Engine("qwen3-test", ByteTokenizer(), max_slots=2, page_size=4,
                 n_pages=128, max_seq_len=128, decode_chunk_len=4, seed=0)
    try:
        want_a = ref.generate(_greedy(prompt_a, max_tokens=24)).token_ids
        want_b = ref.generate(_greedy(prompt_b, max_tokens=24)).token_ids
    finally:
        ref.shutdown()

    # 19 usable pages: both admit, but decode growth exhausts the pool and
    # one sequence must be preempted and later resumed
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=2, page_size=4,
                 n_pages=20, max_seq_len=128, decode_chunk_len=4, seed=0)
    try:
        futs = eng.submit_many([_greedy(prompt_a, max_tokens=24),
                                _greedy(prompt_b, max_tokens=24)])
        got_a, got_b = [f.result(timeout=600) for f in futs]
        assert eng.stats["preemptions"] >= 1
        assert got_a.token_ids == want_a
        assert got_b.token_ids == want_b
        assert got_a.completion_tokens == got_b.completion_tokens == 24
    finally:
        eng.shutdown()


def test_impossible_prompt_fails_loudly_not_silently():
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=2, page_size=4,
                 n_pages=16, max_seq_len=256, decode_chunk_len=4, seed=0)
    try:
        too_big = list(range(1, 201))  # needs ~51 pages of a 16-page pool
        with pytest.raises(MemoryError):
            eng.submit(_greedy(too_big, max_tokens=4)).result(timeout=300)
        # a feasible request afterwards is unaffected
        ok = eng.generate(_greedy([1, 2, 3], max_tokens=4))
        assert ok.completion_tokens == 4
    finally:
        eng.shutdown()


def test_server_concurrent_sse_streams(small_engine):
    """Burst of concurrent streaming chat requests: every stream must
    terminate with [DONE], carry a finish_reason, and match its request."""
    from deepsearch_tts_tpu.engine.server import OpenAIServer

    n_streams = 6

    async def go():
        server = OpenAIServer(small_engine, port=18471)
        await server.start()
        loop = asyncio.get_running_loop()

        def post(i):
            req = urllib.request.Request(
                "http://127.0.0.1:18471/v1/chat/completions",
                data=json.dumps({
                    "messages": [{"role": "user", "content": f"q{i}"}],
                    "max_tokens": 6, "temperature": 0.0,
                    "stream": True,
                }).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.read().decode()

        try:
            return await asyncio.gather(
                *(loop.run_in_executor(None, post, i) for i in range(n_streams)))
        finally:
            await server.stop()

    raws = asyncio.run(go())
    assert len(raws) == n_streams
    for raw in raws:
        events = [ln[6:] for ln in raw.splitlines() if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        finish = [c for c in chunks if c["choices"][0]["finish_reason"]]
        assert finish and finish[-1]["choices"][0]["finish_reason"] in (
            "stop", "length")
    # engine loop survived the burst
    r = small_engine.generate(_greedy([2, 4, 6], max_tokens=3))
    assert r.completion_tokens == 3
