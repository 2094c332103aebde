import asyncio

from deepsearch_tts_tpu.agents.client import CompletionResponse
from deepsearch_tts_tpu.agents.explorer import _repair_dropped_stop, run_explorer
from deepsearch_tts_tpu.prompts import qa as P
from deepsearch_tts_tpu.web.fetch import PageFetcher
from deepsearch_tts_tpu.web.replay import ReplaySearchBackend, replay_fetcher, synthetic_store


class ScriptedCompleter:
    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = 0

    async def complete(self, prompt, **opts):
        self.calls += 1
        if self.responses:
            return CompletionResponse(self.responses.pop(0))
        return CompletionResponse("**Final Information**: nothing more.")


def _web():
    store = synthetic_store({"eiffel tower height": "The Eiffel Tower is 330m tall."})
    return ReplaySearchBackend(store), PageFetcher(raw_fetch=replay_fetcher(store))


def test_repair_dropped_stop():
    s = f"I will search {P.BEGIN_SEARCH_QUERY}eiffel height"
    assert _repair_dropped_stop(s).endswith(P.END_SEARCH_QUERY)
    ok = f"{P.BEGIN_SEARCH_QUERY}q{P.END_SEARCH_QUERY}"
    assert _repair_dropped_stop(ok) == ok
    assert _repair_dropped_stop("plain text") == "plain text"


def test_explorer_search_then_finish():
    backend, fetcher = _web()
    aux = ScriptedCompleter([
        f"Let me check. {P.BEGIN_SEARCH_QUERY}eiffel tower height{P.END_SEARCH_QUERY}",
        "**Final Information**: The Eiffel Tower is 330m tall.",
    ])
    res = asyncio.run(run_explorer(
        "tower height", "find the height", "initial results...",
        aux_client=aux, search_backend=backend, fetcher=fetcher))
    assert res.n_searches == 1
    assert "330m" in res.analysis
    assert P.BEGIN_SEARCH_RESULT in res.analysis


def test_explorer_dedups_repeat_query():
    backend, fetcher = _web()
    aux = ScriptedCompleter([
        f"{P.BEGIN_SEARCH_QUERY}same query{P.END_SEARCH_QUERY}",
        f"{P.BEGIN_SEARCH_QUERY}same query{P.END_SEARCH_QUERY}",
        "**Final Information**: done.",
    ])
    res = asyncio.run(run_explorer(
        "q", "i", "results", aux_client=aux, search_backend=backend,
        fetcher=fetcher))
    assert res.n_searches == 1
    assert "already searched" in res.analysis


def test_explorer_click_link():
    store = synthetic_store({"q": "Fact sentence."})
    url = next(iter(store.pages))
    backend = ReplaySearchBackend(store)
    fetcher = PageFetcher(raw_fetch=replay_fetcher(store))
    aux = ScriptedCompleter([
        f"{P.BEGIN_CLICK_LINK}{url}{P.END_CLICK_LINK}",
        "</think>\n**Final Information**: page says Fact sentence.",
        "**Final Information**: overall, Fact sentence.",
    ])
    res = asyncio.run(run_explorer(
        "q", "i", "results", aux_client=aux, search_backend=backend,
        fetcher=fetcher))
    assert res.n_clicks == 1
    assert P.BEGIN_CLICK_RESULT in res.analysis


def test_explorer_forced_finish_on_budget():
    backend, fetcher = _web()
    # model keeps emitting new searches; budget forces a final summary
    aux = ScriptedCompleter([
        f"{P.BEGIN_SEARCH_QUERY}q{i}{P.END_SEARCH_QUERY}" for i in range(12)
    ] + ["forced summary text"])
    res = asyncio.run(run_explorer(
        "q", "i", "results", aux_client=aux, search_backend=backend,
        fetcher=fetcher, max_interactions=3))
    assert "**Final Information**" in res.analysis
