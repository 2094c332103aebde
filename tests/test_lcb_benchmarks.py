"""LiveCodeBench ingestion: record decode (incl. compressed private tests),
scenario loaders, row conversion, and the parallel eval pool.

reference: scripts/lcb_runner/benchmarks/code_generation.py:29-121 (record
model + compression), utils/multiprocess.py:33-80 (parallel eval).
"""
import base64
import json
import pickle
import zlib

import pytest

from deepsearch_tts_tpu.evaluate.code_eval import codegen_metrics
from deepsearch_tts_tpu.evaluate.lcb_benchmarks import (
    CodeGenerationProblem,
    Scenario,
    load_code_generation_rows,
    load_problems,
)


def _compress(tests: list[dict]) -> str:
    return base64.b64encode(zlib.compress(pickle.dumps(json.dumps(tests)))).decode()


def _record(**over):
    rec = {
        "question_title": "Echo",
        "question_content": "Read one line and print it.",
        "platform": "leetcode",
        "question_id": "q1",
        "contest_id": "c1",
        "contest_date": "2024-05-01T00:00:00",
        "starter_code": "",
        "difficulty": "easy",
        "public_test_cases": json.dumps(
            [{"input": "hi\n", "output": "hi\n", "testtype": "stdin"}]),
        "private_test_cases": _compress(
            [{"input": "yo\n", "output": "yo\n", "testtype": "stdin"}]),
        "metadata": json.dumps({}),
    }
    rec.update(over)
    return rec


def test_codegen_record_decodes_compressed_private_tests(tmp_path):
    path = tmp_path / "lcb.json"
    path.write_text(json.dumps([_record()]))
    probs = load_problems(str(path), Scenario.codegeneration)
    assert len(probs) == 1
    p = probs[0]
    assert len(p.public_test_cases) == 1 and len(p.private_test_cases) == 1
    assert p.private_test_cases[0].input == "yo\n"
    row = p.to_row()
    assert len(row["test_cases"]) == 2
    assert row["test_cases"][1]["expected_output"] == "yo\n"


def test_functional_tests_become_fn_cases(tmp_path):
    rec = _record(
        public_test_cases=json.dumps(
            [{"input": "[1, 2]", "output": "3", "testtype": "functional"}]),
        private_test_cases=json.dumps([]),
        metadata=json.dumps({"func_name": "add"}),
    )
    path = tmp_path / "lcb.json"
    path.write_text(json.dumps([rec]))
    rows = load_code_generation_rows(str(path))
    case = rows[0]["test_cases"][0]
    assert case["fn_name"] == "add"
    assert case["args"] == (1, 2) and case["expected"] == 3


def test_restricted_unpickler_rejects_objects(tmp_path):
    evil = base64.b64encode(zlib.compress(pickle.dumps(__import__("os").getcwd))).decode()
    rec = _record(private_test_cases=evil)
    path = tmp_path / "lcb.json"
    path.write_text(json.dumps([rec]))
    with pytest.raises(ValueError, match="bad codegeneration record"):
        load_problems(str(path), Scenario.codegeneration)


def test_jsonl_and_limit_and_extra_fields(tmp_path):
    recs = [_record(question_id=f"q{i}", release="v5") for i in range(3)]
    path = tmp_path / "lcb.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in recs))
    probs = load_problems(str(path), "codegeneration", limit=2)
    assert [p.question_id for p in probs] == ["q0", "q1"]


def test_other_scenarios_load(tmp_path):
    exe = {"question_id": "q", "contest_id": "c",
           "contest_date": "2024-05-01T00:00:00", "difficulty": "easy",
           "function_name": "f", "code": "def f(x): return x", "input": "3",
           "output": "3", "id": "e1", "problem_id": "p1", "numsteps": 4}
    top = {"question_title": "t", "question_content": "q", "question_id": "q",
           "contest_id": "c", "contest_date": "2024-05-01T00:00:00",
           "difficulty": "easy", "starter_code": "", "function_name": "f",
           "test_id": 0, "test": json.dumps(
               [{"input": "1", "output": "2", "testtype": "functional"}])}
    p1 = tmp_path / "exe.json"
    p1.write_text(json.dumps([exe]))
    p2 = tmp_path / "top.json"
    p2.write_text(json.dumps([top]))
    [e] = load_problems(str(p1), Scenario.codeexecution)
    assert e.to_row()["answer"] == "3"
    [t] = load_problems(str(p2), Scenario.testoutputprediction)
    assert t.to_row()["input"] == "1"


def test_parallel_eval_pool_matches_serial():
    problems = [
        {"test_cases": [{"input": "a\n", "expected_output": "a\n"}]},
        {"test_cases": [{"input": "", "expected_output": "7\n"}]},
    ]
    samples = [
        ["print(input())"],
        ["print(7)", "print(8)"],   # one passing, one failing sample
    ]
    serial = codegen_metrics(problems, samples, k_list=(1,), num_workers=1)
    parallel = codegen_metrics(problems, samples, k_list=(1,), num_workers=2)
    assert serial["pass@1"] == parallel["pass@1"] == pytest.approx(0.75)
    assert [p["correct"] for p in parallel["per_problem"]] == [1, 1]
