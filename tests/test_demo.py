"""Demo wiring: the backend selector must drive the backend it names.

Round-1 review flagged the Streamlit app for ignoring its selector and
always running a scripted fake; the wiring is now shared between the
terminal and Streamlit front ends (cli/demo.build_demo_session), so these
tests prove each selector value constructs — and streams from — the real
thing. reference: demo/run_demo.py (UI), demo/run_logit.py:342-419 (agent).
"""
import asyncio

from deepsearch_tts_tpu.agents.client import EngineClient
from deepsearch_tts_tpu.cli.demo import build_demo_session
from deepsearch_tts_tpu.demo.inband import run_inband_agent


async def _collect(question, env, client, aux, tool, limit=50):
    events = []
    async for ev in run_inband_agent(question, env, client, aux, tool):
        events.append(ev)
        if len(events) >= limit:
            break
    return events


def test_fake_backend_streams_search_and_final():
    env, client, aux, tool = build_demo_session(
        "fake", question="what is the demo fact?")
    events = asyncio.run(_collect("what is the demo fact?", env, client, aux, tool))
    kinds = [e.kind for e in events]
    assert "search" in kinds and "result" in kinds
    assert kinds[-1] == "final"
    assert "demo answer" in events[-1].payload


def test_engine_backend_builds_real_engine_and_streams():
    """backend='engine' must construct an in-process Engine and stream real
    decoded tokens through the in-band agent loop."""
    env, client, aux, tool = build_demo_session(
        "engine", model_name="qwen3-test", aux_model_name="qwen3-test",
        extra_args=["--engine_max_slots", "2", "--engine_page_size", "4",
                    "--engine_pages", "256", "--engine_max_seq_len", "512"])
    assert isinstance(client, EngineClient)
    try:
        env.max_tokens = 16  # tiny decode budget for CPU
        events = asyncio.run(_collect("hello", env, client, aux, tool))
        assert events, "engine demo produced no events"
        assert events[0].kind == "text" and len(events[0].payload) > 0
        assert events[-1].kind == "final"
    finally:
        client.engine.shutdown()


def test_http_backend_builds_http_client():
    from deepsearch_tts_tpu.agents.client import HTTPClient

    env, client, aux, tool = build_demo_session("http")
    assert isinstance(client, HTTPClient)
    assert isinstance(aux, HTTPClient)
