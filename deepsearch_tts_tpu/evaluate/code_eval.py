"""Sandboxed code-generation evaluation (LiveCodeBench-runner capability).

The reference vendors ~4.5k LoC of LCB harness (scripts/lcb_runner/): test
execution in a child process with alarm timeouts and stdout capture
(evaluation/testing_util.py), pass@k (evaluation/pass_k_utils.py), and
parallel evaluation (utils/multiprocess.py). This module supplies the same
capabilities:

* :func:`run_test_cases` — executes a candidate program against stdin/stdout
  test cases in a separate process with a hard timeout, or calls a named
  function for functional tests.
* :func:`pass_at_k` — the unbiased estimator from the Codex paper.
* :func:`codegen_metrics` — per-problem aggregation over n samples.
"""
from __future__ import annotations

import math
import multiprocessing as mp
import sys
from dataclasses import dataclass


@dataclass
class TestCase:
    input: str = ""
    expected_output: str = ""
    fn_name: str | None = None     # functional test: call fn(*args)
    args: tuple = ()
    expected: object = None


def _worker(code: str, case: dict, q) -> None:
    """Run one test in a child process. stdin/stdout are redirected."""
    import io

    try:
        if case.get("fn_name"):
            ns: dict = {}
            exec(code, ns)  # noqa: S102 — sandboxed evaluation of benchmark code
            fn = ns.get(case["fn_name"])
            if fn is None:
                q.put(("error", f"function {case['fn_name']} not defined"))
                return
            out = fn(*case.get("args", ()))
            ok = out == case.get("expected")
            q.put(("pass" if ok else "fail", repr(out)))
        else:
            sys.stdin = io.StringIO(case.get("input", ""))
            buf = io.StringIO()
            sys.stdout = buf
            ns = {"__name__": "__main__"}
            exec(code, ns)  # noqa: S102
            sys.stdout = sys.__stdout__
            got = buf.getvalue()
            ok = _normalize_io(got) == _normalize_io(case.get("expected_output", ""))
            q.put(("pass" if ok else "fail", got[:2000]))
    except SystemExit:
        sys.stdout = sys.__stdout__
        got = ""
        try:
            got = buf.getvalue()  # type: ignore[name-defined]
        except Exception:
            pass
        ok = _normalize_io(got) == _normalize_io(case.get("expected_output", ""))
        q.put(("pass" if ok else "fail", got[:2000]))
    except Exception as e:
        q.put(("error", f"{type(e).__name__}: {e}"))


def _normalize_io(s: str) -> list[str]:
    return [line.rstrip() for line in s.strip().splitlines()]


def run_test_cases(code: str, cases: list[dict], timeout: float = 6.0) -> list[dict]:
    """Execute code against each test case in an isolated process."""
    results = []
    ctx = mp.get_context("fork")
    for case in cases:
        q = ctx.Queue()
        p = ctx.Process(target=_worker, args=(code, case, q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            results.append({"status": "timeout", "detail": ""})
            continue
        try:
            status, detail = q.get_nowait()
        except Exception:
            status, detail = "error", "no result (crashed)"
        results.append({"status": status, "detail": detail})
    return results


def pass_at_k(n: int, c: int, k: int) -> float:
    """Unbiased pass@k (Chen et al. 2021): 1 - C(n-c, k)/C(n, k)."""
    if n - c < k:
        return 1.0
    return 1.0 - math.prod(1.0 - k / i for i in range(n - c + 1, n + 1))


def _eval_one_problem(job: tuple) -> dict:
    """Worker body for the parallel pool (module-level: must pickle)."""
    cases, samples, timeout = job
    n_correct = 0
    details = []
    for code in samples:
        if not code:
            details.append([])
            continue
        res = run_test_cases(code, cases, timeout=timeout)
        details.append(res)
        if res and all(r["status"] == "pass" for r in res):
            n_correct += 1
    return {"n": len(samples), "correct": n_correct, "details": details}


def codegen_metrics(problems: list[dict], samples_per_problem: list[list[str]],
                    k_list: tuple[int, ...] = (1,), timeout: float = 6.0,
                    num_workers: int = 1) -> dict:
    """Evaluate n generations per problem; report pass@k averages.

    problems[i]["test_cases"] is a list of TestCase-style dicts.
    ``num_workers > 1`` evaluates problems in a process pool (the
    reference's parallel evaluation, lcb_runner/utils/multiprocess.py:33-80
    — here stdlib ProcessPoolExecutor; each test still runs in its own
    sandboxed child with a hard timeout either way).
    """
    jobs = [(prob.get("test_cases", []), samples, timeout)
            for prob, samples in zip(problems, samples_per_problem)]
    if num_workers > 1 and len(jobs) > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=num_workers,
                                 mp_context=mp.get_context("fork")) as pool:
            per_problem = list(pool.map(_eval_one_problem, jobs))
    else:
        per_problem = [_eval_one_problem(j) for j in jobs]
    out = {}
    for k in k_list:
        vals = [pass_at_k(p["n"], p["correct"], k) for p in per_problem
                if p["n"] >= k]
        out[f"pass@{k}"] = sum(vals) / len(vals) if vals else 0.0
    out["per_problem"] = per_problem
    return out
