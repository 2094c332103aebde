import json

from deepsearch_tts_tpu.evaluate.math_equivalence import is_equiv, normalize_math
from deepsearch_tts_tpu.evaluate.metrics import (
    evaluate_predictions,
    normalize_answer_qa,
    run_evaluation,
)
from deepsearch_tts_tpu.evaluate.judge import is_non_answer, judge_verdict


def test_normalize_qa():
    assert normalize_answer_qa("The  Answer, IS: Paris!") == "answer is paris"


def test_math_equiv_frac():
    assert is_equiv(r"\frac12", r"\frac{1}{2}")
    assert is_equiv("1/2", "0.5")
    assert is_equiv(r"\sqrt3", r"\sqrt{3}")
    assert not is_equiv("3", "4")


def test_math_equiv_units_and_percent():
    # MATH normalization strips the percent sign (reference behavior)
    assert is_equiv("50%", "50")
    assert is_equiv(r"5\text{ meters}", "5")


def test_eval_qa_em_acc_f1():
    m, pred = evaluate_predictions(
        r"reasoning \boxed{George Washington}", ["George Washington"],
        mode="qa", extract_answer=True,
    )
    assert m["em"] == 1 and m["acc"] == 1 and m["f1"] == 1.0 and m["is_valid_answer"]


def test_eval_qa_substring_acc():
    m, _ = evaluate_predictions(
        r"\boxed{President George Washington of the USA}", ["George Washington"],
        mode="qa", extract_answer=True,
    )
    assert m["em"] == 0 and m["acc"] == 1 and 0 < m["f1"] < 1


def test_eval_multiple_golds_takes_max():
    m, _ = evaluate_predictions(
        r"\boxed{NYC}", ["New York City", "NYC"], mode="qa", extract_answer=True
    )
    assert m["em"] == 1


def test_run_evaluation_domains(tmp_path):
    items = [
        {"Question": "q1", "answer": "a", "pred_answer": "a", "category": "Math"},
        {"Question": "q2", "answer": "b", "pred_answer": "x", "category": "Physics"},
    ]
    overall = run_evaluation(
        items,
        task_type="qa",
        output_metrics_path=str(tmp_path / "m.json"),
        output_metrics_overall_path=str(tmp_path / "o.json"),
    )
    assert overall["total"] == 2 and overall["em"] == 0.5
    assert set(overall["domains"]) == {"Math", "Physics"}
    assert json.load(open(tmp_path / "o.json"))["total"] == 2


def test_judge_blacklist():
    assert is_non_answer("The answer is unknown")
    assert not is_non_answer("Paris")
    # blacklist forces incorrect even when the judge says correct
    assert not judge_verdict("cannot be determined", "Paris", "Correct")
    assert judge_verdict("Paris, France", "Paris France", "Correct")
    assert not judge_verdict("", "Paris", "Correct")
    # string-equivalence path wins without a judge
    assert judge_verdict("0.5", "1/2", "Incorrect... wait")
