"""Serve a model behind the OpenAI-compatible endpoint.

Usage:
    python -m deepsearch_tts_tpu.cli.serve --model qwen3-8b \
        --weights /path/to/safetensors --tokenizer /path/to/tokenizer \
        --port 8000 --max_slots 64

This is the process boundary that lets the reference's own scripts (or any
OpenAI SDK) run against TPU serving unchanged (SURVEY.md §5: "orchestrator↔
engine via a local OpenAI-compatible server boundary").
"""
from __future__ import annotations

import argparse
import asyncio


def main(argv=None):
    from ..compile_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="qwen3-8b")
    p.add_argument("--weights", default="")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_slots", type=int, default=64)
    p.add_argument("--page_size", type=int, default=64)
    p.add_argument("--pages", type=int, default=4096)
    p.add_argument("--max_seq_len", type=int, default=8192)
    p.add_argument("--decode_chunk", type=int, default=8)
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel ways (0 = single chip)")
    p.add_argument("--prefill_lane", type=int, default=16,
                   help="in-flight chunked prefill width: prompt tokens "
                        "streamed per decode step while decode runs "
                        "(0 = dedicated prefill dispatches only)")
    p.add_argument("--warmup", type=int, default=0, metavar="PROMPT_LEN",
                   help="pre-compile the serving programs for this prompt "
                        "length before accepting requests (first-request "
                        "latency otherwise pays multi-second jit compiles)")
    args = p.parse_args(argv)

    from ..engine.engine import Engine
    from ..engine.server import OpenAIServer
    from ..engine.tokenizer import ByteTokenizer, HFTokenizer
    from ..engine.weights import load_or_init_params

    tok = HFTokenizer(args.tokenizer) if args.tokenizer else ByteTokenizer()
    params, name = load_or_init_params(args.model, args.weights)
    mesh = None
    if args.tp > 1:
        import jax

        from ..parallel.mesh import make_mesh

        mesh = make_mesh(dp=len(jax.devices()) // args.tp, tp=args.tp)
    engine = Engine(name, tok, params=params, mesh=mesh,
                    max_slots=args.max_slots,
                    page_size=args.page_size, n_pages=args.pages,
                    max_seq_len=args.max_seq_len,
                    decode_chunk_len=args.decode_chunk,
                    prefill_lane=args.prefill_lane)
    if args.warmup:
        print(f"warming serving programs (prompt_len={args.warmup})...")
        engine.warmup(prompt_lens=(args.warmup,))
    server = OpenAIServer(engine, args.host, args.port)
    print(f"serving {name} on http://{args.host}:{args.port}/v1")
    asyncio.run(server.serve_forever())


if __name__ == "__main__":
    main()
