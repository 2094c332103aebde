import asyncio
import json
import urllib.request

import pytest


@pytest.fixture(scope="module")
def engine():
    from deepsearch_tts_tpu.engine.engine import Engine
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer

    eng = Engine("qwen3-test", ByteTokenizer(), max_slots=2, page_size=4,
                 n_pages=64, max_seq_len=128, decode_chunk_len=4)
    yield eng
    eng.shutdown()


def test_on_delta_callback(engine):
    from deepsearch_tts_tpu.engine.engine import GenerationRequest

    pieces = []
    res = engine.generate(GenerationRequest(
        prompt_ids=[1, 2, 3], max_tokens=5, temperature=0.0,
        repetition_penalty=1.0, on_delta=pieces.append))
    assert "".join(pieces) == res.text
    assert len(pieces) >= 1


def test_sse_streaming(engine):
    from deepsearch_tts_tpu.engine.server import OpenAIServer

    async def go():
        server = OpenAIServer(engine, port=18233)
        await server.start()
        loop = asyncio.get_running_loop()

        def post():
            req = urllib.request.Request(
                "http://127.0.0.1:18233/v1/chat/completions",
                data=json.dumps({
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 8, "min_tokens": 6, "temperature": 0.0,
                    "stream": True,
                }).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.read().decode()

        raw = await loop.run_in_executor(None, post)
        await server.stop()
        return raw

    raw = asyncio.run(go())
    events = [line[6:] for line in raw.splitlines() if line.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    finish = [c for c in chunks if c["choices"][0]["finish_reason"]]
    assert finish and finish[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    text = "".join(c["choices"][0]["delta"].get("content", "") for c in chunks)
    assert len(text) >= 1
