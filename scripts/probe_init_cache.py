"""Measure engine bring-up (construction + warmup) with the persistent
compilation cache, cold vs warm — VERDICT r4 #5.

Usage (serially, one TPU process at a time):
  DST_COMPILE_CACHE=/tmp/init_cache python scripts/probe_init_cache.py cold
  DST_COMPILE_CACHE=/tmp/init_cache python scripts/probe_init_cache.py warm

Uses the default bench engine config (1.5B dense, B=64, slot+pallas, fused
kernels) so the program set matches what BENCH init_s pays for.
Prints one JSON line with the phase timings.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepsearch_tts_tpu.compile_cache import enable_persistent_cache

cache_dir = enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "cold"
    t0 = time.monotonic()
    # force the axon claim before timing anything engine-shaped
    np.asarray(jax.device_get(jax.device_put(jnp.float32(1.0)) + 1))
    claim_s = time.monotonic() - t0

    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.engine.weights import (device_random_params,
                                                   fast_random_params)
    from deepsearch_tts_tpu.models import qwen3, registry
    from deepsearch_tts_tpu.models.qwen3 import Qwen3Config

    cfg = Qwen3Config(vocab_size=32768, hidden=2048, n_layers=28,
                      n_heads=16, n_kv_heads=8, head_dim=128,
                      intermediate=6144, tie_embeddings=True)
    registry.register("bench-qwen3", cfg, qwen3.init_params, qwen3.forward,
                      lambda cfg=cfg: qwen3.logical_axes(cfg))

    B, PROMPT, DECODE, SEQLEN, CHUNK, PS = 64, 128, 128, 512, 32, 64
    init_mode = os.environ.get("BENCH_INIT", "device")
    t1 = time.monotonic()
    params = (device_random_params(cfg, seed=0) if init_mode == "device"
              else fast_random_params(cfg, seed=0))
    host_init_s = time.monotonic() - t1
    t1 = time.monotonic()
    eng = Engine("bench-qwen3", ByteTokenizer(), params=params,
                 max_slots=B, page_size=PS, n_pages=B * (SEQLEN // PS) + 1,
                 max_seq_len=SEQLEN, decode_chunk_len=CHUNK, seed=0,
                 cache_mode="slot")
    construct_s = time.monotonic() - t1
    t2 = time.monotonic()
    MAXCTX = min(PROMPT + (DECODE // 2 + DECODE) + CHUNK + 2, SEQLEN)
    eng.warmup(prompt_lens=(PROMPT,), max_ctx=MAXCTX)
    warmup_s = time.monotonic() - t2
    t3 = time.monotonic()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
    r = eng.generate(GenerationRequest(prompt_ids=ids, max_tokens=32,
                                       temperature=0.7, top_k=20, top_p=0.8,
                                       min_p=0.05, repetition_penalty=1.05))
    first_req_s = time.monotonic() - t3
    n_files = sum(len(fs) for _, _, fs in os.walk(cache_dir)) \
        if cache_dir else 0
    print(json.dumps({
        "phase": phase, "cache_dir": cache_dir, "init_mode": init_mode,
        "claim_s": round(claim_s, 1), "host_init_s": round(host_init_s, 1),
        "construct_s": round(construct_s, 1),
        "warmup_s": round(warmup_s, 1), "first_req_s": round(first_req_s, 1),
        "init_s_equiv": round(host_init_s + construct_s + warmup_s
                              + first_req_s, 1),
        "completion_tokens": r.completion_tokens,
        "n_cache_files": n_files}), flush=True)
    eng.shutdown()


if __name__ == "__main__":
    main()
