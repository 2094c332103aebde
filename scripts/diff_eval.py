"""Differential evaluation: run the REFERENCE evaluate.py unmodified on a
repo-produced trace and compare its overall metrics with ours.

BASELINE.md commits to the reference harnesses running unchanged on traces
produced by this framework (trace-schema compatibility). This script proves
it: it launches ``/root/reference/scripts/evaluate/evaluate.py`` (reference:
scripts/evaluate/evaluate.py:813-891) as a child process on a
``policy_results_*.json`` trace, then scores the same rows with
``deepsearch_tts_tpu.evaluate.metrics.run_evaluation``, and diffs
em/acc/f1/math_equal + the valid-answer count.

Usage:
    python scripts/diff_eval.py --trace outputs/policy_results_x.json \
        [--task qa] [--reference /root/reference]

Exit status 0 iff every compared metric agrees to 1e-9.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
STUB_DIR = os.path.join(_HERE, "_stubs")
sys.path.insert(0, os.path.dirname(_HERE))  # repo root, for package imports


def run_reference_eval(trace_path: str, task: str,
                       reference_root: str = "/root/reference") -> dict:
    """Run the reference harness unmodified; return its overall metrics.

    The child runs with cwd=<reference_root> (the script does
    ``sys.path.append('./scripts/utils')`` relative to cwd) and with
    scripts/_stubs on PYTHONPATH so its unconditional ``import openai``
    resolves without the network SDK. Metrics land next to ``trace_path``
    (absolute), so nothing is written under the reference tree.
    """
    trace_path = os.path.abspath(trace_path)
    script = os.path.join(reference_root, "scripts", "evaluate", "evaluate.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = STUB_DIR + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, script, "--output_path", trace_path, "--task", task],
        cwd=reference_root, env=env, capture_output=True, text=True,
        timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference evaluate.py failed (rc={proc.returncode}):\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    overall_path = trace_path.replace(".json", ".metrics.overall.json")
    with open(overall_path, encoding="utf-8") as f:
        return json.load(f)


def run_our_eval(trace_path: str, task: str) -> dict:
    from deepsearch_tts_tpu.evaluate.metrics import run_evaluation

    with open(trace_path, encoding="utf-8") as f:
        items = json.load(f)
    # the reference consumes rows that already carry pred_answer with
    # extract_answer=False semantics (evaluate.py:711-717); match it, and use
    # its DOMAIN_FIELDS priority list (evaluate.py:834)
    return run_evaluation(
        items, task_type=task, extract_answer=False,
        domain_fields=["Level", "level", "category", "High-level domain",
                       "difficulty_level", "field", "problem_topic"],
    )


def compare(ref: dict, ours: dict, atol: float = 1e-9) -> list[str]:
    problems = []
    for k in ("em", "acc", "f1", "math_equal"):
        rv, ov = float(ref.get(k, 0.0)), float(ours.get(k, 0.0))
        if abs(rv - ov) > atol:
            problems.append(f"{k}: reference={rv} ours={ov}")
    # reference: 'num_valid_answer': 'N of M'; ours: is_valid_answer count
    ref_valid = int(str(ref.get("num_valid_answer", "0 of 0")).split(" of ")[0])
    if ref_valid != int(ours.get("is_valid_answer", -1)):
        problems.append(
            f"valid answers: reference={ref_valid} "
            f"ours={ours.get('is_valid_answer')}")
    return problems


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--trace", required=True)
    p.add_argument("--task", default="qa", choices=["qa", "math", "choose"])
    p.add_argument("--reference", default="/root/reference")
    args = p.parse_args(argv)

    ref = run_reference_eval(args.trace, args.task, args.reference)
    ours = run_our_eval(args.trace, args.task)
    mismatches = compare(ref, ours)
    print(json.dumps({
        "reference": {k: ref.get(k) for k in
                      ("em", "acc", "f1", "math_equal", "num_valid_answer")},
        "ours": {k: ours.get(k) for k in
                 ("em", "acc", "f1", "math_equal", "is_valid_answer")},
        "mismatches": mismatches,
    }, indent=2, default=str))
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
