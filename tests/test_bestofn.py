import asyncio

from deepsearch_tts_tpu.agents.client import ChatResponse, FakeClient
from deepsearch_tts_tpu.agents.policy import PolicyAgent


def test_best_of_n_verifier_selects_highest_confidence():
    """3 samples produce answers A, A, B; verifier scores B higher → B wins
    despite A's majority (confidence dominates votes)."""
    solve_answers = iter([r"\boxed{A}", r"\boxed{A}", r"\boxed{B}"])

    def handler(messages, tools):
        sys = messages[0]["content"]
        if "fact-check" in sys:
            pred = messages[1]["content"]
            score = "0.9" if "B" in pred.split("[Predicted Answer Start]")[-1] else "0.3"
            return ChatResponse(type="normal",
                                content=rf"\[\boxed{{\text{{{score}}}}}\]",
                                finish_reason="stop")
        return ChatResponse(type="normal", content=next(solve_answers),
                            finish_reason="stop")

    agent = PolicyAgent(FakeClient(handler=handler), max_search_calls=2)
    res = asyncio.run(agent.solve_best_of_n("q?", n=3))
    assert res.answer == "B"
    assert res.confidence == 0.9
    sel = res.selection
    assert sel["n_samples"] == 3
    votes = {c["answer"]: c["votes"] for c in sel["candidates"]}
    assert votes == {"A": 2, "B": 1}


def test_best_of_n_tie_broken_by_votes():
    solve_answers = iter([r"\boxed{A}", r"\boxed{A}", r"\boxed{B}"])

    def handler(messages, tools):
        if "fact-check" in messages[0]["content"]:
            return ChatResponse(type="normal", content=r"\[\boxed{0.5}\]",
                                finish_reason="stop")
        return ChatResponse(type="normal", content=next(solve_answers),
                            finish_reason="stop")

    agent = PolicyAgent(FakeClient(handler=handler))
    res = asyncio.run(agent.solve_best_of_n("q?", n=3))
    assert res.answer == "A"  # equal confidence → majority


def test_best_of_n_all_fail():
    agent = PolicyAgent(FakeClient(handler=lambda m, t: ChatResponse(
        type="error", content="Error: down", error="down")))
    res = asyncio.run(agent.solve_best_of_n("q?", n=2))
    assert res.error


def test_runner_bestofn_schema(tmp_path):
    from deepsearch_tts_tpu.agents.runner import BatchRunner

    def handler(messages, tools):
        if "fact-check" in messages[0]["content"]:
            return ChatResponse(type="normal", content=r"\[\boxed{0.8}\]",
                                finish_reason="stop")
        return ChatResponse(type="normal", content=r"\boxed{X}",
                            finish_reason="stop")

    agent = PolicyAgent(FakeClient(handler=handler))
    runner = BatchRunner(agent, output_dir=str(tmp_path), mode="solve_bestofn",
                         n_samples=2)
    rows = runner.run_sync([{"Question": "q"}], str(tmp_path / "r.json"))
    assert rows[0]["pred_answer"] == "X"
    assert rows[0]["best_of_n"]["n_samples"] == 2
    assert rows[0]["confidence_score"] == 0.8
