import asyncio
import json

from deepsearch_tts_tpu.evaluate.code_eval import codegen_metrics, pass_at_k, run_test_cases
from deepsearch_tts_tpu.evaluate.math_grader import (
    extract_math_answer,
    latex_to_expr_string,
    math_equal,
    symbolic_equal,
)
from deepsearch_tts_tpu.evaluate.report_judge import extract_scores, judge_reports


def test_math_equal_basic():
    assert math_equal("0.5", "1/2")
    assert math_equal(r"\frac{1}{2}", "0.5")
    assert math_equal("50", "50.0")
    assert math_equal("0.5", "50%")       # percentage ambiguity handled
    assert not math_equal("3", "4")


def test_math_equal_symbolic():
    assert symbolic_equal("2*x + x", "3*x")
    assert symbolic_equal(r"\sqrt{4}", "2")
    assert math_equal(r"\frac{2}{4}", r"\frac{1}{2}")


def test_latex_to_expr():
    assert latex_to_expr_string(r"\frac{1}{2}") == "((1)/(2))"
    assert "sqrt(3)" in latex_to_expr_string(r"\sqrt{3}")


def test_extract_math_answer():
    assert extract_math_answer(r"so \boxed{42}") == "42"
    assert extract_math_answer("the result is 3.14 m") == "3.14"


def test_run_test_cases_stdin_stdout():
    code = "n = int(input())\nprint(n * 2)"
    res = run_test_cases(code, [
        {"input": "3\n", "expected_output": "6\n"},
        {"input": "5\n", "expected_output": "11\n"},
    ])
    assert res[0]["status"] == "pass"
    assert res[1]["status"] == "fail"


def test_run_test_cases_timeout_and_error():
    res = run_test_cases("while True: pass", [{"input": "", "expected_output": ""}],
                         timeout=1.0)
    assert res[0]["status"] == "timeout"
    res2 = run_test_cases("raise ValueError('x')", [{"input": "", "expected_output": ""}])
    assert res2[0]["status"] == "error"


def test_run_test_cases_functional():
    code = "def add(a, b):\n    return a + b"
    res = run_test_cases(code, [{"fn_name": "add", "args": (2, 3), "expected": 5}])
    assert res[0]["status"] == "pass"


def test_pass_at_k():
    assert pass_at_k(1, 1, 1) == 1.0
    assert pass_at_k(1, 0, 1) == 0.0
    assert 0.0 < pass_at_k(10, 3, 1) < 1.0
    assert pass_at_k(10, 3, 10) == 1.0


def test_codegen_metrics():
    problems = [{"test_cases": [{"input": "2\n", "expected_output": "4\n"}]}]
    out = codegen_metrics(problems, [["print(int(input())*2)", "print(0)"]],
                          k_list=(1, 2))
    assert out["pass@2"] == 1.0
    assert 0 < out["pass@1"] < 1.0


def test_report_scores_json():
    text = json.dumps({"A": {"comprehensiveness": 8, "thoroughness": 7,
                             "factuality": 9, "coherence": 8},
                       "B": {"comprehensiveness": 6, "thoroughness": 6,
                             "factuality": 7, "coherence": 7}})
    s = extract_scores(text, ["A", "B"])
    assert s["A"]["factuality"] == 9.0 and s["B"]["coherence"] == 7.0


def test_report_scores_regex_fallback():
    text = "System A: comprehensiveness 8/10, thoroughness: 7, factuality=9, coherence 8"
    s = extract_scores(text, ["A"])
    assert s["A"]["comprehensiveness"] == 8.0


def test_judge_reports_aggregation():
    async def complete(prompt):
        return json.dumps({"sysX": {"comprehensiveness": 8, "thoroughness": 8,
                                    "factuality": 8, "coherence": 8}})
    rows = [{"question": "q1", "reports": {"sysX": "r1"}},
            {"question": "q2", "reports": {"sysX": "r2"}}]
    agg = asyncio.run(judge_reports(rows, complete))
    assert agg["sysX"]["factuality"] == 8.0


def test_few_shot_prompt():
    from deepsearch_tts_tpu.evaluate.math_examples import build_few_shot_prompt

    p = build_few_shot_prompt("What is 2+2?", "math", n_shots=2)
    assert p.count("Question:") == 3
    assert p.rstrip().endswith("Solution:")
    assert "\\boxed{" in p  # worked shots end in boxed answers
