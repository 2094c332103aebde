"""End-to-end multi-turn prefix reuse: the flagship serving feature.

A trajectory leaves the batch (tool call), returns with the conversation
grown by one turn, and must re-enter reusing the cached prefix pages
(SURVEY.md §7(b)). The reference pays full prefill per turn at its
providers; here cached_prompt_tokens > 0 on the second turn.
"""
import asyncio

import pytest

from deepsearch_tts_tpu.agents.client import EngineClient
from deepsearch_tts_tpu.engine.engine import Engine
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def engine():
    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=2, page_size=4,
                 n_pages=512, max_seq_len=1024, decode_chunk_len=4)
    yield eng
    eng.shutdown()


def test_multiturn_conversation_hits_prefix_cache(engine):
    client = EngineClient(engine, default_opts={"max_tokens": 6,
                                                "temperature": 0.0,
                                                "repetition_penalty": 1.0})
    messages = [
        {"role": "system", "content": "You are a helpful search assistant with a long system prompt " * 3},
        {"role": "user", "content": "What is the capital of France, and can you verify it?"},
    ]

    async def turn(msgs):
        return await client.chat(msgs)

    r1 = asyncio.run(turn(messages))
    reused_before = engine.prefix_cache.stats()["tokens_reused"]

    # turn 2: same conversation + assistant turn + tool result (the
    # decode→tool→re-prefill cycle)
    messages = messages + [
        {"role": "assistant", "content": r1.content or "thinking"},
        {"role": "tool", "content": "Paris is the capital of France."},
    ]
    r2 = asyncio.run(turn(messages))
    reused_after = engine.prefix_cache.stats()["tokens_reused"]

    assert reused_after > reused_before, "second turn must reuse cached prefix pages"
    assert engine.prefix_cache.stats()["hits"] >= 1


def test_prefix_reuse_does_not_change_output(engine):
    client = EngineClient(engine, default_opts={"max_tokens": 6,
                                                "temperature": 0.0,
                                                "repetition_penalty": 1.0})
    msgs = [{"role": "user", "content": "Deterministic prompt for cache check " * 4}]

    r1 = asyncio.run(client.chat(msgs))   # cold
    r2 = asyncio.run(client.chat(msgs))   # warm (full-prefix hit minus tail)
    assert r1.content == r2.content


# ------------------------------------------------------ slot prefix parking

def test_slot_prefix_parking_reenters_own_row():
    """Slot-mode multi-turn re-entry (r4): a finished sequence's KV parks in
    its slot row; a returning trajectory whose prompt extends it re-admits
    into that row token-exactly, prefilling only the suffix."""
    import jax

    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, init_params

    params = init_params(QWEN3_CONFIGS["qwen3-test"], jax.random.PRNGKey(0))

    def greedy(ids, n=6):
        return GenerationRequest(prompt_ids=ids, max_tokens=n,
                                 temperature=0.0, repetition_penalty=1.0)

    eng = Engine("qwen3-test", ByteTokenizer(), params=params, max_slots=4,
                 page_size=4, n_pages=128, max_seq_len=128,
                 decode_chunk_len=4, seed=0, cache_mode="slot",
                 enable_prefix_cache=True)
    try:
        p1 = list(range(30, 60))
        r1 = eng.generate(greedy(p1))
        # turn 2: conversation so far + a "tool result" suffix
        p2 = p1 + r1.token_ids + [7, 8, 9, 11]
        r2 = eng.generate(greedy(p2))
        # usable is conservative by one token (final kept token's KV may
        # not have been fed before the chunk ended)
        assert r2.cached_prompt_tokens == \
            len(p1) + max(len(r1.token_ids) - 1, 0)
        assert eng.stats["slot_park_hits"] == 1
        assert eng.stats["slot_park_tokens"] == r2.cached_prompt_tokens

        # a diverging prompt matches only the shared token prefix
        p3 = p1[:10] + [99, 98, 97]
        r3 = eng.generate(greedy(p3))
        assert r3.cached_prompt_tokens == 10
    finally:
        eng.shutdown()

    # token identity: parked re-entry must decode the same tokens as a cold
    # engine prefilled from scratch
    cold = Engine("qwen3-test", ByteTokenizer(), params=params, max_slots=4,
                  page_size=4, n_pages=128, max_seq_len=128,
                  decode_chunk_len=4, seed=0, cache_mode="slot",
                  enable_prefix_cache=False)
    try:
        assert cold.generate(greedy(p2)).token_ids == r2.token_ids
    finally:
        cold.shutdown()


def test_slot_parking_prefers_unparked_rows():
    """Admission uses unparked rows first so parked KV survives; when all
    rows are parked, the least-recently-parked is evicted."""
    import jax

    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, init_params

    params = init_params(QWEN3_CONFIGS["qwen3-test"], jax.random.PRNGKey(0))

    def greedy(ids, n=4):
        return GenerationRequest(prompt_ids=ids, max_tokens=n,
                                 temperature=0.0, repetition_penalty=1.0)

    eng = Engine("qwen3-test", ByteTokenizer(), params=params, max_slots=2,
                 page_size=4, n_pages=64, max_seq_len=64,
                 decode_chunk_len=4, seed=0, cache_mode="slot",
                 enable_prefix_cache=True)
    try:
        a = [1, 2, 3, 4, 5, 6, 7, 8]
        b = [20, 21, 22, 23, 24, 25]
        ra = eng.generate(greedy(a))
        rb = eng.generate(greedy(b))          # takes the unparked row
        assert eng.stats["slot_park_hits"] == 0
        # both rows now parked; re-entry on conversation A must hit row A
        r2 = eng.generate(greedy(a + ra.token_ids + [9]))
        assert r2.cached_prompt_tokens > 0
        assert eng.stats["slot_park_hits"] == 1
    finally:
        eng.shutdown()


def test_seen_keep_reentry_matches_upload_path():
    """Park-hit re-entries reuse the row's device-resident seen mask
    (engine.seen_keep, r5): the prefill program rebuilds the presence mask
    on device from the parked row + a small clear list instead of a
    [Gp, V] host upload. With an ACTIVE repetition penalty the sampled
    tokens must match the upload path (seen_keep=False) token-for-token —
    including after a mid-chunk stop left post-stop garbage in the mask
    and after a partial (diverging) park match falls back to the upload
    path."""
    import jax

    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, init_params

    params = init_params(QWEN3_CONFIGS["qwen3-test"], jax.random.PRNGKey(0))

    def req(ids, n=6):
        return GenerationRequest(prompt_ids=ids, max_tokens=n,
                                 temperature=0.0, repetition_penalty=1.3)

    outs = []
    for keep_on in (True, False):
        eng = Engine("qwen3-test", ByteTokenizer(), params=params,
                     max_slots=4, page_size=4, n_pages=128, max_seq_len=128,
                     decode_chunk_len=4, seed=0, cache_mode="slot",
                     enable_prefix_cache=True)
        eng.seen_keep = keep_on
        try:
            p1 = list(range(30, 60))
            r1 = eng.generate(req(p1))
            # full-match re-entry (keep path when enabled)
            p2 = p1 + r1.token_ids + [7, 8, 9, 11]
            r2 = eng.generate(req(p2))
            assert r2.cached_prompt_tokens > 0
            # third turn: chains keep-path lives (mask invariant must hold
            # across consecutive keep re-entries)
            p3 = p2 + r2.token_ids + [13, 17]
            r3 = eng.generate(req(p3))
            # diverging prompt: partial park match (upload fallback)
            p4 = p1[:10] + [99, 98, 97]
            r4 = eng.generate(req(p4))
            outs.append((r1.token_ids, r2.token_ids, r3.token_ids,
                         r4.token_ids))
            if keep_on:
                assert eng.stats["seen_keep_rows"] >= 2
        finally:
            eng.shutdown()
    assert outs[0] == outs[1], \
        "seen_keep device-derived mask must be bit-exact vs the upload path"
