"""Code-execution and test-output-prediction scenarios end-to-end.

reference: scripts/lcb_runner/evaluation/compute_code_execution_metrics.py
(assert-based output grading, input-echo discard),
compute_test_output_prediction_metrics.py (ast RHS parse + literal compare),
utils/extraction_utils.py:19-59 (both extraction ladders),
prompts/code_execution.py + test_output_prediction.py (prompt contracts).
"""
import json

import pytest

from deepsearch_tts_tpu.evaluate.code_eval import (
    check_testcase_output,
    code_execution_metrics,
    extract_execution_answer,
    extract_test_output_answer,
)
from deepsearch_tts_tpu.evaluate.code_eval import (
    test_output_metrics as output_metrics,  # alias: not a pytest case
)
from deepsearch_tts_tpu.evaluate.lcb_benchmarks import (
    Scenario,
    load_scenario_rows,
)
from deepsearch_tts_tpu.evaluate.lcb_prompts import (
    code_execution_messages,
)
from deepsearch_tts_tpu.evaluate.lcb_prompts import (
    test_output_prediction_messages as output_prediction_messages,
)


# ---------------------------------------------------------------- extraction

def test_extract_execution_direct():
    # direct prompt ends with [ANSWER]; the model continues with the assert
    text = 'assert doubleValue(number = 21) == 42\n[/ANSWER]'
    assert extract_execution_answer(text) == "42"


def test_extract_execution_cot():
    text = ("[THOUGHT]\nsteps...\n[/THOUGHT]\n[ANSWER]\n"
            'assert f(x = "hi") == "bhihia"\n[/ANSWER]')
    assert extract_execution_answer(text, cot=True) == '"bhihia"'


def test_extract_execution_no_close_tag_takes_first_line():
    assert extract_execution_answer("assert f(1) == [1, 2]\nextra prose") == "[1, 2]"


def test_extract_test_output_last_assert_line():
    text = "some prose\nassert f(1) == 2\nmore\nassert f(3) == 6\n"
    assert extract_test_output_answer(text) == "assert f(3) == 6"


def test_extract_test_output_code_fence():
    text = "prose\n```python\nassert g(1) == 9\n```\n"
    assert extract_test_output_answer(text) == "assert g(1) == 9"
    assert extract_test_output_answer("no fences here") == ""


# ------------------------------------------------------------------- scoring

def test_check_testcase_output_ladder():
    assert check_testcase_output("assert f(1) == [1, 2]", "[1, 2]")
    assert not check_testcase_output("assert f(1) == [1, 2]", "[1, 3]")
    # bare value (no assert)
    assert check_testcase_output('"abc"', '"abc"')
    # multi-line: first non-comment assert line wins
    pred = "# comment\nassert f(2) == 4\nassert f(3) == 9"
    assert check_testcase_output(pred, "4")
    # malformed asserts never pass — even against null
    assert not check_testcase_output("assert f(1) != 2", "null")
    assert not check_testcase_output("assert syntax error ((", "null")


def test_check_testcase_output_nonliteral_falls_back_to_sandbox():
    assert check_testcase_output("assert f(3) == [1] + [2]", "[1, 2]")
    assert not check_testcase_output("assert f(3) == [1] + [3]", "[1, 2]")


def test_code_execution_metrics_assert_semantics():
    probs = [
        {"code": "def f(x):\n    return x * 2", "input": "f(x = 3)",
         "answer": "6"},
        {"code": "def g(s):\n    return s + 'a'", "input": "g(s = 'hi')",
         "answer": "'hia'"},
    ]
    # one right, one wrong literal
    m = code_execution_metrics(probs, [["6"], ["'nope'"]])
    assert m["pass@1"] == pytest.approx(0.5)


def test_code_execution_discards_input_echo():
    probs = [{"code": "def f(x):\n    return x", "input": "f(x = 3)",
              "answer": "3"}]
    # sample parrots the input expression → discarded → scores 0 even
    # though eval'ing it would equal the answer
    m = code_execution_metrics(probs, [["f(x = 3)"]])
    assert m["pass@1"] == 0.0
    assert m["per_problem"][0]["graded"] == [False]


def test_code_execution_timeout_counts_as_failure():
    probs = [{"code": "def f():\n    while True:\n        pass",
              "input": "f()", "answer": "f()"}]
    m = code_execution_metrics(probs, [["0"]], timeout=1.0)
    assert m["pass@1"] == 0.0


def test_test_output_metrics_pass_at_k():
    probs = [{"answer": "[1, 2]"}, {"answer": '"x"'}]
    samples = [["assert f() == [1, 2]", "assert f() == [9]"],
               ["assert g() == 'y'", "assert g() == 'x'"]]
    m = output_metrics(probs, samples, k_list=(1, 2))
    assert m["pass@2"] == pytest.approx(1.0)
    assert m["pass@1"] == pytest.approx(0.5)


# ----------------------------------------------------------- loaders/prompts

def _exec_record(**over):
    rec = {
        "question_id": "q1", "contest_id": "c1", "contest_date": "2024-01-01",
        "difficulty": "easy", "function_name": "f",
        "code": "def f(x):\n    return x + 1", "input": "f(x = 1)",
        "output": "2", "id": "e1", "problem_id": "p1", "numsteps": 3,
    }
    rec.update(over)
    return rec


def _top_record(**over):
    rec = {
        "question_title": "Add", "question_content": "Add one.",
        "question_id": "q9", "contest_id": "c1",
        "contest_date": "2024-01-01", "difficulty": "easy",
        "starter_code": "def addOne(x):\n    ...", "function_name": "addOne",
        "test_id": 2,
        "test": json.dumps([
            {"input": "5", "output": "6", "testtype": "functional"}]),
    }
    rec.update(over)
    return rec


def test_scenario_rows_and_prompt_contracts(tmp_path):
    ep = tmp_path / "exec.json"
    ep.write_text(json.dumps([_exec_record()]))
    rows = load_scenario_rows(str(ep), Scenario.codeexecution)
    assert rows[0]["answer"] == "2" and rows[0]["input"] == "f(x = 1)"

    msgs = code_execution_messages(rows[0])
    user = msgs[1]["content"]
    assert "[PYTHON]" in user and "assert f(x = 1) == ??" in user
    assert "[ANSWER]" in user
    assert "[THOUGHT]" not in user
    cot = code_execution_messages(rows[0], cot=True)[1]["content"]
    assert cot.rstrip().endswith("[THOUGHT]")

    tp = tmp_path / "top.json"
    tp.write_text(json.dumps([_top_record()]))
    trows = load_scenario_rows(str(tp), Scenario.testoutputprediction)
    # reference prompts/scores test[0] regardless of test_id
    assert trows[0]["input"] == "5" and trows[0]["answer"] == "6"
    assert trows[0]["id"] == "q9_2"
    tmsgs = output_prediction_messages(trows[0])
    assert "assert addOne(5) == # TODO" in tmsgs[1]["content"]


# ------------------------------------------------------------------ CLI e2e

def test_lcb_run_cli_all_scenarios(tmp_path, monkeypatch, capsys):
    """Drive cli.lcb_run end-to-end per scenario with a scripted model."""
    from deepsearch_tts_tpu.agents.client import ChatResponse, FakeClient
    from deepsearch_tts_tpu.cli import lcb_run
    from deepsearch_tts_tpu.cli import deep_search as ds

    def fake_make_clients(args):
        def handler(messages, tools):
            user = messages[-1]["content"]
            if "assert f(x = 1) == ??" in user:
                return ChatResponse(type="normal",
                                    content="assert f(x = 1) == 2\n[/ANSWER]")
            if "assert addOne(5) == # TODO" in user:
                return ChatResponse(type="normal",
                                    content="```\nassert addOne(5) == 6\n```")
            return ChatResponse(
                type="normal",
                content="```python\nprint(input())\n```")

        return FakeClient(handler=handler), FakeClient(handler=handler), None

    monkeypatch.setattr(ds, "make_clients", fake_make_clients)

    ep = tmp_path / "exec.json"
    ep.write_text(json.dumps([_exec_record()]))
    lcb_run.main(["--input_path", str(ep), "--scenario", "codeexecution",
                  "--output_dir", str(tmp_path / "out")])
    m = json.loads("".join(
        line for line in capsys.readouterr().out.splitlines()
        if not line.startswith("generations")))
    assert m["pass@1"] == pytest.approx(1.0)

    tp = tmp_path / "top.json"
    tp.write_text(json.dumps([_top_record()]))
    lcb_run.main(["--input_path", str(tp), "--scenario", "testoutput",
                  "--output_dir", str(tmp_path / "out")])
    m = json.loads("".join(
        line for line in capsys.readouterr().out.splitlines()
        if not line.startswith("generations")))
    assert m["pass@1"] == pytest.approx(1.0)

    cg = tmp_path / "cg.json"
    cg.write_text(json.dumps([{
        "id": "p1", "question_content": "echo stdin",
        "test_cases": [{"input": "hi\n", "expected_output": "hi\n"}],
    }]))
    lcb_run.main(["--input_path", str(cg), "--scenario", "codegen",
                  "--output_dir", str(tmp_path / "out")])
    m = json.loads("".join(
        line for line in capsys.readouterr().out.splitlines()
        if not line.startswith("generations")))
    assert m["pass@1"] == pytest.approx(1.0)
