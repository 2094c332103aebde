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
