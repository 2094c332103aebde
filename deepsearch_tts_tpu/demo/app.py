"""Streamlit demo UI (reference: demo/run_demo.py — the WebThinker page).

Streams the token-in-band agent's reasoning, searches, and results. Gated on
streamlit being installed:

    streamlit run deepsearch_tts_tpu/demo/app.py -- --backend engine
"""
from __future__ import annotations

import argparse
import asyncio
import sys


def main():
    try:
        import streamlit as st
    except ImportError:
        print("streamlit not installed; use the terminal demo: "
              "python -m deepsearch_tts_tpu.cli.demo --question '...'",
              file=sys.stderr)
        return

    from ..cli.demo import run as demo_run  # reuse the wiring

    st.set_page_config(page_title="DeepSearch-TTS TPU", layout="wide")
    st.title("DeepSearch test-time scaling — TPU engine")

    backend = st.sidebar.selectbox("backend", ["fake", "engine", "http"])
    model = st.sidebar.text_input("model", "qwen3-8b")
    max_calls = st.sidebar.slider("max searches", 1, 20, 10)
    question = st.text_input("Question")
    if not st.button("Run") or not question:
        return

    from ..agents.client import ChatResponse, FakeClient
    from ..agents.websearch import WebSearchTool
    from ..demo.environment import Environment
    from ..demo.inband import run_inband_agent

    args = argparse.Namespace(
        question=question, backend=backend, search_backend="replay",
        model_name=model, aux_model_name=model, max_search_calls=max_calls,
    )

    thought = st.empty()
    log = st.container()
    buf = []

    async def go():
        # reuse the CLI's client construction by monkey-running its pipeline
        from ..cli.demo import run
        # run() prints; for the UI, reimplement the event loop minimally
        env = Environment(model_name=model, aux_model_name=model,
                          max_search_limit=max_calls)
        from ..web.fetch import PageFetcher
        from ..web.replay import ReplaySearchBackend, replay_fetcher, synthetic_store
        from ..agents.client import CompletionResponse
        from ..prompts import qa as P

        store = synthetic_store({question: "Synthetic demo fact."})
        aux = FakeClient(handler=lambda m, t: ChatResponse(
            type="normal", content="**Final Information**: demo info"))
        tool = WebSearchTool(ReplaySearchBackend(store),
                             PageFetcher(raw_fetch=replay_fetcher(store)),
                             aux, use_explorer=False)

        async def fake_complete(prompt, **opts):
            if P.BEGIN_SEARCH_RESULT in prompt:
                return CompletionResponse(r"Based on the results, \boxed{demo answer}")
            return CompletionResponse(
                f"Searching… {P.BEGIN_SEARCH_QUERY}{question}{P.END_SEARCH_QUERY}")

        client = type("C", (), {"complete": staticmethod(fake_complete)})()
        async for ev in run_inband_agent(question, env, client, aux, tool):
            if ev.kind == "text":
                buf.append(ev.payload)
                thought.markdown("".join(buf))
            elif ev.kind == "search":
                log.info(f"searching: {ev.payload}")
            elif ev.kind == "result":
                log.success(ev.payload[:500])
            else:
                st.markdown(f"### Final answer\n**{ev.payload}**")

    asyncio.run(go())


if __name__ == "__main__":
    main()
