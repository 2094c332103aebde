"""Differential compatibility: the REFERENCE evaluation harness, run
byte-for-byte unmodified, must score traces produced by this framework and
agree with our metrics engine.

reference: scripts/evaluate/evaluate.py:813-891 (entry), :711-717
(pred_answer path), :852-867 (row field aliases).
"""
import asyncio
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scripts.diff_eval import compare, run_our_eval, run_reference_eval  # noqa: E402

from deepsearch_tts_tpu.agents.client import ChatResponse, FakeClient
from deepsearch_tts_tpu.agents.policy import PolicyAgent
from deepsearch_tts_tpu.agents.runner import BatchRunner

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "scripts/evaluate/evaluate.py")),
    reason="reference tree not present",
)


def _make_trace(tmp_path, problems, replies):
    """Produce a real policy_results trace via BatchRunner + FakeClient.

    ``replies`` maps a substring of the question to the scripted model
    output (keyed, not sequenced: the policy agent may call more than once
    per problem, e.g. on answer-format retries).
    """
    def handler(messages, tools):
        text = json.dumps([m.get("content", "") for m in messages])
        for key, out in replies.items():
            if key in text:
                return ChatResponse(type="normal", content=out,
                                    finish_reason="stop")
        return ChatResponse(type="normal", content="no idea",
                            finish_reason="stop")

    agent = PolicyAgent(FakeClient(handler=handler))
    runner = BatchRunner(agent, output_dir=str(tmp_path), mode="solve",
                         concurrent_limit=2, save_interval=100)
    out = str(tmp_path / "policy_results_test.json")
    runner.run_sync(problems, out)
    return out


# NOTE: the reference QA scorer iterates ``for answer in labeled_answer``
# (evaluate.py:469) — a bare-string gold is iterated character by character,
# so multi-character string golds score 0 there. Real QA datasets store gold
# answers as lists; our metrics engine deliberately wraps stray strings
# instead of char-iterating. The differential check therefore uses
# list-typed golds (well-formed data), where both engines must agree.
QA_PROBLEMS = [
    {"Question": "capital of France?", "answer": ["Paris"], "Level": "easy"},
    {"Question": "2+2?", "answer": ["4"], "Level": "easy"},
    {"Question": "first US president?",
     "answer": ["George Washington", "Washington"], "Level": "medium"},
    {"Question": "speed of light (m/s)?", "answer": ["299792458"],
     "Level": "hard"},
    {"Question": "unanswerable", "answer": ["42"], "Level": "hard"},
]

QA_REPLIES = {
    "capital of France": r"The capital is \boxed{Paris}.",
    "2+2": r"So the answer is \boxed{4}",
    "first US president": r"\boxed{George Washington}",
    "speed of light": r"\boxed{probably 43}",          # wrong answer
    "unanswerable": "I could not determine this.",     # no boxed -> empty
}


def test_reference_harness_scores_our_qa_trace(tmp_path):
    trace = _make_trace(tmp_path, QA_PROBLEMS, QA_REPLIES)
    # rows must carry pred_answer (the reference prefers it, :852-867)
    rows = json.load(open(trace))
    assert all("pred_answer" in r for r in rows)

    ref = run_reference_eval(trace, "qa", REFERENCE)
    ours = run_our_eval(trace, "qa")
    assert compare(ref, ours) == []
    # sanity: the agreed numbers are the right ones, not degenerate zeros
    assert ours["em"] > 0 and ours["acc"] > 0


def test_reference_harness_scores_math_trace(tmp_path):
    problems = [
        {"Question": "one half as a fraction", "answer": r"\frac{1}{2}"},
        {"Question": "one half as a decimal", "answer": "1/2"},
        {"Question": "expand (x^2+1)", "answer": "x^2+1"},
    ]
    replies = {
        "fraction": r"\boxed{\frac{1}{2}}",
        "decimal": r"\boxed{0.5}",
        "expand": r"the answer is \boxed{x^2 + 1}",
    }
    trace = _make_trace(tmp_path, problems, replies)

    ref = run_reference_eval(trace, "math", REFERENCE)
    ours = run_our_eval(trace, "math")
    assert compare(ref, ours) == []
    assert ours["math_equal"] > 0


def test_reference_metrics_files_written_next_to_trace(tmp_path):
    trace = _make_trace(tmp_path, QA_PROBLEMS[:1], QA_REPLIES)
    run_reference_eval(trace, "qa", REFERENCE)
    assert os.path.exists(trace.replace(".json", ".metrics.json"))
    assert os.path.exists(trace.replace(".json", ".metrics.overall.json"))
    # nothing leaked into the reference tree
    assert not os.path.exists(os.path.join(
        REFERENCE, "policy_results_test.metrics.json"))
