"""Code-generation benchmark runner (LiveCodeBench-runner capability).

Generates N solutions per problem through any backend, executes them in the
sandbox, and reports pass@k — the same generate→execute→score pipeline as
the reference's scripts/lcb_runner (runner/main.py + evaluation/), with
``--continue_existing``-style resume.

Usage:
    python -m deepsearch_tts_tpu.cli.lcb_run --input_path problems.json \
        --backend engine --n 4 --k 1,2 --output_dir ./outputs

Problem rows: {"Question"|"question_content", "starter_code"?, "test_cases":
[{"input", "expected_output"} | {"fn_name", "args", "expected"}]}.
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_dir", default="./outputs")
    p.add_argument("--backend", default="fake", choices=["engine", "http", "fake"])
    p.add_argument("--model_name", default="qwen3-8b")
    p.add_argument("--n", type=int, default=1, help="samples per problem")
    p.add_argument("--k", default="1", help="comma-separated pass@k values")
    p.add_argument("--timeout", type=float, default=6.0)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--concurrent_limit", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=1,
                   help="parallel eval processes (lcb multiprocess pool)")
    p.add_argument("--lcb_format", action="store_true",
                   help="input is a raw LiveCodeBench dataset export "
                        "(compressed private tests are decoded)")
    p.add_argument("--continue_existing", default="",
                   help="prior generations JSON to resume from")
    args = p.parse_args(argv)

    from ..datasets.loaders import load_dataset
    from ..evaluate.code_eval import codegen_metrics
    from ..evaluate.extract import extract_answer_fn
    from ..evaluate.lcb_prompts import codegen_messages
    from .deep_search import build_parser, make_clients

    ds_args = build_parser().parse_args(
        ["--backend", args.backend, "--model_name", args.model_name])
    client, _, engine = make_clients(ds_args)

    if args.lcb_format:
        from ..evaluate.lcb_benchmarks import load_code_generation_rows

        problems = load_code_generation_rows(args.input_path,
                                             limit=args.limit or None)
    else:
        problems = load_dataset(args.input_path, limit=args.limit or None)
    prior: dict[str, list[str]] = {}
    if args.continue_existing and os.path.exists(args.continue_existing):
        with open(args.continue_existing, encoding="utf-8") as f:
            prior = {r["key"]: r["codes"] for r in json.load(f)}

    async def gen_all():
        sem = asyncio.Semaphore(args.concurrent_limit)

        async def one(i, rec):
            key = str(rec.get("id", i))
            if key in prior and len(prior[key]) >= args.n:
                return key, prior[key][: args.n]
            async with sem:
                codes = []
                for _ in range(args.n):
                    resp = await client.chat(codegen_messages(rec, args.model_name),
                                             max_tokens=4096)
                    codes.append(extract_answer_fn(resp.content, mode="codegen",
                                                   extract_answer=True))
                return key, codes

        return await asyncio.gather(*(one(i, r) for i, r in enumerate(problems)))

    gen = asyncio.run(gen_all())
    samples = [codes for _, codes in gen]

    ts = time.strftime("%Y%m%d_%H%M%S")
    os.makedirs(args.output_dir, exist_ok=True)
    gen_path = os.path.join(args.output_dir, f"codegen_{ts}.json")
    with open(gen_path, "w", encoding="utf-8") as f:
        json.dump([{"key": k, "codes": c} for k, c in gen], f, indent=1)

    k_list = tuple(int(x) for x in args.k.split(","))
    metrics = codegen_metrics(problems, samples, k_list=k_list,
                              timeout=args.timeout,
                              num_workers=args.num_workers)
    metrics.pop("per_problem", None)
    if engine is not None:
        engine.shutdown()
    print(json.dumps(metrics, indent=2))
    print(f"generations -> {gen_path}")


if __name__ == "__main__":
    main()
