"""Hermetic agent tests: FakeClient for the models, synthetic replay web."""
import asyncio
import json

import pytest

from deepsearch_tts_tpu.agents.client import ChatResponse, FakeClient, make_tool_call
from deepsearch_tts_tpu.agents.policy import PolicyAgent
from deepsearch_tts_tpu.agents.runner import BatchRunner
from deepsearch_tts_tpu.agents.tracing import RunStatistics, TokenUsage, calculate_cost
from deepsearch_tts_tpu.agents.websearch import WebSearchTool
from deepsearch_tts_tpu.web.fetch import PageFetcher
from deepsearch_tts_tpu.web.replay import ReplaySearchBackend, replay_fetcher, synthetic_store


def make_web(facts=None):
    store = synthetic_store(facts or {
        "capital of france": "Paris is the capital of France.",
    })
    backend = ReplaySearchBackend(store)
    fetcher = PageFetcher(raw_fetch=replay_fetcher(store))
    return backend, fetcher


def make_search_tool(aux_script=None, use_explorer=False, stats=None):
    backend, fetcher = make_web()
    aux = FakeClient(handler=lambda m, t: ChatResponse(
        type="normal",
        content="</think>\n**Final Information**: Paris is the capital of France.",
    )) if aux_script is None else aux_script
    return WebSearchTool(backend, fetcher, aux, top_k=5, stats=stats,
                         use_explorer=use_explorer)


def test_solve_direct_answer():
    client = FakeClient(script=[
        ChatResponse(type="normal", content=r"Thinking... \boxed{42}",
                     finish_reason="stop"),
    ])
    agent = PolicyAgent(client)
    res = asyncio.run(agent.solve("What is 6x7?"))
    assert res.answer == "42"
    assert res.messages[0]["role"] == "system"
    assert res.messages[-1]["role"] == "assistant"


def test_solve_with_tool_call():
    client = FakeClient(script=[
        ChatResponse(type="tool", content="", tool_calls=[
            make_tool_call("deep_websearch", {
                "search_query": "capital of france",
                "search_intent": "find the capital",
            })]),
        ChatResponse(type="normal", content=r"\boxed{Paris}", finish_reason="stop"),
    ])
    tool = make_search_tool(use_explorer=False)
    agent = PolicyAgent(client, search_tool=tool, max_search_calls=3)
    res = asyncio.run(agent.solve("What is the capital of France?"))
    assert res.answer == "Paris"
    assert res.n_search_calls == 1
    assert len(res.search_results) == 1
    # tool result must carry the search info back into the conversation
    tool_msgs = [m for m in res.messages if m.get("role") == "tool"]
    assert tool_msgs and "Paris" in tool_msgs[0]["content"]


def test_search_budget_enforced():
    def always_search(messages, tools):
        return ChatResponse(type="tool", tool_calls=[
            make_tool_call("deep_websearch", {"search_query": f"q{len(messages)}",
                                              "search_intent": "i"})])
    client = FakeClient(handler=always_search)
    tool = make_search_tool(use_explorer=False)
    agent = PolicyAgent(client, search_tool=tool, max_search_calls=2)
    res = asyncio.run(agent.solve("loop forever"))
    assert res.error == "max_iterations"
    assert res.n_search_calls == 2  # capped
    limit_msgs = [m for m in res.messages if m.get("role") == "tool"
                  and "maximum number of search" in m.get("content", "")]
    assert limit_msgs


def test_empty_query_rejected():
    client = FakeClient(script=[
        ChatResponse(type="tool", tool_calls=[
            make_tool_call("deep_websearch", {"search_query": "", "search_intent": "i"})]),
        ChatResponse(type="normal", content=r"\boxed{x}", finish_reason="stop"),
    ])
    agent = PolicyAgent(client, search_tool=make_search_tool(use_explorer=False))
    res = asyncio.run(agent.solve("q"))
    assert any("Empty search query" in m.get("content", "")
               for m in res.messages if m.get("role") == "tool")
    assert res.n_search_calls == 0


def test_verify_confidence_parse():
    client = FakeClient(script=[
        ChatResponse(type="normal",
                     content=r"2 of 4 conditions verified. \[\boxed{\text{0.5}}\]",
                     finish_reason="stop"),
    ])
    agent = PolicyAgent(client)
    res = asyncio.run(agent.verify("Q?", "some answer"))
    assert res.confidence == 0.5
    assert "[Question Start]" in res.messages[1]["content"]
    assert "[Predicted Answer Start]" in res.messages[1]["content"]


def test_budget_forcing_appends_nudge():
    client = FakeClient(script=[
        ChatResponse(type="normal", content=r"\boxed{resumed}", finish_reason="stop"),
    ])
    agent = PolicyAgent(client, max_search_calls=4)
    prior = [{"role": "system", "content": "s"},
             {"role": "user", "content": "q"},
             {"role": "assistant", "content": "partial work"}]
    res = asyncio.run(agent.solve_budget_forcing(prior))
    assert res.answer == "resumed"
    nudges = [m for m in res.messages if m["role"] == "user" and "additional search" in m["content"]]
    assert nudges


def test_error_response_propagates():
    client = FakeClient(script=[
        ChatResponse(type="error", content="Error: boom", error="boom"),
    ])
    res = asyncio.run(PolicyAgent(client).solve("q"))
    assert res.error == "boom" and res.answer.startswith("Error")


def test_websearch_tool_with_explorer():
    stats = RunStatistics("m", "aux")
    tool = make_search_tool(use_explorer=True, stats=stats)
    out = asyncio.run(tool.search_with_intent("capital of france", "find capital"))
    assert "Paris" in out["extracted_info"]
    assert out["formatted_documents"]
    assert stats.api_counters.as_dict().get("web_search") == 1


def test_batch_runner_trace_schema(tmp_path):
    client = FakeClient(handler=lambda m, t: ChatResponse(
        type="normal", content=r"\boxed{A}", finish_reason="stop"))
    agent = PolicyAgent(client, search_tool=make_search_tool(use_explorer=False))
    runner = BatchRunner(agent, output_dir=str(tmp_path), mode="solve",
                         concurrent_limit=4, save_interval=1)
    problems = [{"Question": f"q{i}", "answer": "A", "id": i} for i in range(3)]
    out_file = str(tmp_path / "res.json")
    results = runner.run_sync(problems, out_file)
    assert len(results) == 3
    data = json.load(open(out_file))
    row = data[0]
    # reference trace schema: input fields + pred_answer/messages/web_search
    assert {"Question", "answer", "id", "pred_answer", "messages", "web_search"} <= set(row)
    assert row["pred_answer"] == "A"


def test_batch_runner_error_row(tmp_path):
    def boom(m, t):
        raise RuntimeError("model exploded")
    agent = PolicyAgent(FakeClient(handler=boom))
    runner = BatchRunner(agent, output_dir=str(tmp_path), mode="solve")
    results = runner.run_sync([{"Question": "q"}], str(tmp_path / "r.json"))
    assert results[0]["pred_answer"].startswith("Error:")
    assert "error" in results[0]


def test_verify_batch_schema(tmp_path):
    client = FakeClient(handler=lambda m, t: ChatResponse(
        type="normal", content=r"\[\boxed{\text{0.75}}\]", finish_reason="stop"))
    agent = PolicyAgent(client)
    runner = BatchRunner(agent, output_dir=str(tmp_path), mode="verify")
    results = runner.run_sync(
        [{"Question": "q", "pred_answer": "a"}], str(tmp_path / "r.json"))
    assert results[0]["confidence_score"] == 0.75
    assert "verification_searches" in results[0]


def test_cost_accounting():
    prices = {"m": {"input": 0.001, "output": 0.002}}
    u = TokenUsage(1000, 500)
    assert abs(calculate_cost(u, "m", prices) - 0.002) < 1e-9
    assert calculate_cost(u, "unknown", prices) == 0.0


def test_fault_injection_batch_resilience(tmp_path):
    """Injected backend faults become error rows / degraded answers, never a
    crashed batch (reference has no fault injection at all; SURVEY.md §5)."""
    from deepsearch_tts_tpu.agents.client import FaultInjectionClient

    inner = FakeClient(handler=lambda m, t: ChatResponse(
        type="normal", content=r"\boxed{ok}", finish_reason="stop"))
    chaotic = FaultInjectionClient(inner, error_rate=0.5, seed=1, exception=True)
    agent = PolicyAgent(chaotic)
    runner = BatchRunner(agent, output_dir=str(tmp_path), mode="solve",
                         concurrent_limit=4)
    rows = runner.run_sync([{"Question": f"q{i}"} for i in range(10)],
                           str(tmp_path / "r.json"))
    assert len(rows) == 10
    assert chaotic.injected > 0
    oks = [r for r in rows if r["pred_answer"] == "ok"]
    errs = [r for r in rows if r["pred_answer"].startswith("Error")]
    assert len(oks) + len(errs) == 10 and errs


def test_fault_injection_error_responses(tmp_path):
    from deepsearch_tts_tpu.agents.client import FaultInjectionClient

    inner = FakeClient(handler=lambda m, t: ChatResponse(
        type="normal", content=r"\boxed{ok}", finish_reason="stop"))
    chaotic = FaultInjectionClient(inner, error_rate=1.0, exception=False)
    res = asyncio.run(PolicyAgent(chaotic).solve("q"))
    assert res.error == "injected fault"


def test_httpclient_forwards_stop_and_sampler_knobs():
    """Regression (VERDICT r1 weak #4): HTTPClient must forward stop /
    include_stop_str_in_output (and extra sampler knobs) so the explorer's
    in-band stop contract holds with --backend http
    (reference: scripts/deep_search.py:295-316)."""
    import asyncio

    from deepsearch_tts_tpu.agents.client import HTTPClient

    client = HTTPClient(base_url="http://fake", api_keys="k", model="m")
    captured = {}

    def fake_post(payload, key):
        captured.update(payload)
        return {"choices": [{"message": {"content": "ok"},
                             "finish_reason": "stop"}],
                "usage": {"prompt_tokens": 1, "completion_tokens": 1}}

    client._post = fake_post
    resp = asyncio.run(client.complete(
        "q", stop=["<|end_search_query|>"], include_stop_str_in_output=True,
        top_k=20, min_p=0.05, repetition_penalty=1.05))
    assert resp.text == "ok"
    assert captured["stop"] == ["<|end_search_query|>"]
    assert captured["include_stop_str_in_output"] is True
    assert captured["top_k"] == 20 and captured["repetition_penalty"] == 1.05


def test_price_config_ships_and_prices_cost():
    """The repo ships model_config price tables (reference:
    model_config/aihubmix_price.json schema) and the cost calc understands
    the prompt_tokens/completion_tokens keys."""
    from deepsearch_tts_tpu.agents.tracing import (
        DEFAULT_PRICE_CONFIG,
        TokenUsage,
        calculate_cost,
        load_price_config,
    )

    prices = load_price_config(None)
    assert DEFAULT_PRICE_CONFIG.endswith("model_config/aihubmix_price.json")
    assert prices, "default price table loaded empty"
    u = TokenUsage(prompt_tokens=1000, completion_tokens=1000)
    cost = calculate_cost(u, "Kimi-K2", prices)
    assert abs(cost - (0.00054 + 0.00216)) < 1e-9
