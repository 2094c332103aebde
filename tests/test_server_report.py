import asyncio
import json
import urllib.request

import pytest

from deepsearch_tts_tpu.agents.client import ChatResponse, CompletionResponse, FakeClient
from deepsearch_tts_tpu.agents.report import generate_report
from deepsearch_tts_tpu.agents.websearch import WebSearchTool
from deepsearch_tts_tpu.web.fetch import PageFetcher
from deepsearch_tts_tpu.web.replay import ReplaySearchBackend, replay_fetcher, synthetic_store


def test_openai_server_end_to_end():
    """HTTP chat completion against the tiny-model engine via the server."""
    from deepsearch_tts_tpu.engine.engine import Engine
    from deepsearch_tts_tpu.engine.server import OpenAIServer
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer

    engine = Engine("qwen3-test", ByteTokenizer(), max_slots=2, page_size=4,
                    n_pages=64, max_seq_len=128, decode_chunk_len=4)

    async def go():
        server = OpenAIServer(engine, port=18231)
        await server.start()
        loop = asyncio.get_running_loop()

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:18231{path}", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read().decode())

        out = await loop.run_in_executor(None, post, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0,
        })
        assert out["object"] == "chat.completion"
        assert out["choices"][0]["message"]["role"] == "assistant"
        assert out["usage"]["completion_tokens"] >= 1

        out2 = await loop.run_in_executor(None, post, "/v1/completions", {
            "prompt": "abc", "max_tokens": 3, "temperature": 0.0,
        })
        assert out2["object"] == "text_completion"
        assert out2["choices"][0]["finish_reason"] in ("stop", "length")

        # health endpoint
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:18231{path}",
                                        timeout=60) as r:
                return json.loads(r.read().decode())
        health = await loop.run_in_executor(None, get, "/v1/models")
        assert health["data"][0]["id"]
        await server.stop()

    asyncio.run(go())
    engine.shutdown()


def test_report_agent_pipeline():
    plan = {"title": "T", "sections": [
        {"name": "Background", "goal": "context"},
        {"name": "Conclusion", "goal": "answer"},
    ]}

    def handler(messages, tools):
        prompt = messages[-1]["content"]
        if "Return a JSON object" in prompt:
            return ChatResponse(type="normal", content=json.dumps(plan))
        if "Write the complete markdown" in prompt:
            name = "Background" if "Background" in prompt else "Conclusion"
            return ChatResponse(type="normal", content=f"## {name}\nBody text.")
        if "List any factual claims" in prompt:
            return ChatResponse(type="normal", content="OK")
        if "concise, informative title" in prompt:
            return ChatResponse(type="normal", content="Final Title")
        if "Polish the draft" in prompt:
            return ChatResponse(type="normal", content="# Report\npolished")
        return ChatResponse(type="normal", content="text")

    client = FakeClient(handler=handler)
    store = synthetic_store({"q Background": "A fact.", "q Conclusion": "B fact."})
    aux = FakeClient(handler=lambda m, t: ChatResponse(
        type="normal", content="**Final Information**: evidence."))
    tool = WebSearchTool(ReplaySearchBackend(store),
                         PageFetcher(raw_fetch=replay_fetcher(store)),
                         aux, use_explorer=False)

    res = asyncio.run(generate_report("q", client, tool))
    assert res.title == "Final Title"
    assert "polished" in res.report
    assert len(res.sections) == 2
    assert res.sections[0]["name"] == "Background"


def test_report_agent_edit_loop():
    plan = {"title": "T", "sections": [{"name": "S", "goal": "g"}]}
    calls = {"edit": 0}

    def handler(messages, tools):
        prompt = messages[-1]["content"]
        if "Return a JSON object" in prompt:
            return ChatResponse(type="normal", content=json.dumps(plan))
        if "Write the complete markdown" in prompt:
            return ChatResponse(type="normal", content="## S\ndraft")
        if "List any factual claims" in prompt:
            return ChatResponse(type="normal", content="claim X unsupported")
        if "address the reviewer feedback" in prompt:
            calls["edit"] += 1
            return ChatResponse(type="normal", content="## S\nfixed")
        return ChatResponse(type="normal", content="final")

    store = synthetic_store({"q S": "fact"})
    aux = FakeClient(handler=lambda m, t: ChatResponse(
        type="normal", content="**Final Information**: e"))
    tool = WebSearchTool(ReplaySearchBackend(store),
                         PageFetcher(raw_fetch=replay_fetcher(store)),
                         aux, use_explorer=False)
    res = asyncio.run(generate_report("q", FakeClient(handler=handler), tool))
    assert calls["edit"] == 1
    assert res.sections[0]["text"] == "## S\nfixed"
