"""A/B the pipelining churn threshold (TPU, solo).

The r3 rule skipped the speculative (pipelined) decode dispatch when ANY
row would complete during the outstanding chunk. Skipping exposes the
dispatch round trip to the WHOLE batch (max_slots * rtt row-time) while
speculating idles only the completing rows (n * chunk_wall each), so the
break-even is a count: speculate while n <= max_slots * rtt /
chunk_wall. In sustained mode (staggered max_tokens) most chunks
complete a few rows, so the any-row rule turned pipelining off almost
everywhere.

One engine, interleaved rounds toggling eng.churn_rtt_s between 0.0
(any-row rule: threshold 0) and 0.035 (count threshold at the ~35ms
axon dispatch RTT). Sustained (all-fresh) rounds are the target regime;
two agent rounds sanity-check that heavy churn still skips.

Usage: python scripts/probe_churn.py   (PROBE_BATCH=96 by default)
"""
import json
import os
import queue as _q
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PROBE_BATCH", 96))
PROMPT = int(os.environ.get("PROBE_PROMPT", 128))
DECODE = int(os.environ.get("PROBE_DECODE", 128))
SEQLEN = int(os.environ.get("PROBE_SEQLEN", 512))
CHUNK = int(os.environ.get("PROBE_CHUNK", 32))
PAIRS = int(os.environ.get("PROBE_PAIRS", 3))   # sustained A/B pairs

from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
from deepsearch_tts_tpu.engine.weights import fast_random_params
from deepsearch_tts_tpu.models import qwen3, registry
from deepsearch_tts_tpu.models.qwen3 import Qwen3Config

cfg = Qwen3Config(vocab_size=32768, hidden=2048, n_layers=28, n_heads=16,
                  n_kv_heads=8, head_dim=128, intermediate=6144,
                  tie_embeddings=True)
registry.register("probe-qwen3", cfg, qwen3.init_params, qwen3.forward,
                  lambda cfg=cfg: qwen3.logical_axes(cfg))
params = fast_random_params(cfg, seed=0)

rng = np.random.default_rng(0)
SAMP = dict(temperature=0.7, top_k=20, top_p=0.8, min_p=0.05,
            repetition_penalty=1.05)


def closed_loop_round(eng, nslots, reenter, total=None, warm=None):
    """Closed-loop serving: every completion immediately resubmits.
    reenter=True re-enters the grown conversation (agent); False submits
    a fresh prompt every time (sustained)."""
    total = total or 4 * nslots
    warm = warm if warm is not None else nslots
    eng.stats.update(decode_tokens=0, decode_time_s=0.0, decode_steps=0,
                     prefill_tokens=0, prefill_time_s=0.0, requests=0,
                     slot_steps=0, pipelined_chunks=0)
    doneq: _q.Queue = _q.Queue()
    submitted = 0
    convs: dict = {}

    def snap():
        return {k: eng.stats[k] for k in
                ("decode_tokens", "decode_time_s", "slot_steps",
                 "prefill_tokens", "pipelined_chunks", "decode_steps")}

    def submit(ids, n_toks):
        nonlocal submitted
        r = GenerationRequest(prompt_ids=list(ids), max_tokens=n_toks, **SAMP)
        f = eng.submit(r)
        convs[f] = list(ids)
        f.add_done_callback(doneq.put)
        submitted += 1

    def fresh(i):
        return rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()

    def astag(i):
        return DECODE // 2 + (i * 37) % (DECODE // 2)

    for i in range(nslots):
        submit(fresh(i), astag(i))
    results = []
    win: dict = {}
    win_tokens = 0
    while len(results) < total:
        f = doneq.get(timeout=3600)
        r = f.result()
        prompt_ids = convs.pop(f)
        results.append(r)
        if "t0" in win and "t1" not in win:
            win_tokens += r.completion_tokens
        if len(results) == warm and "t0" not in win:
            win["t0"], win["s0"] = time.monotonic(), snap()
        if submitted < total:
            if reenter:
                nxt = (prompt_ids + r.token_ids
                       + rng.integers(0, cfg.vocab_size, size=64).tolist())
                n_toks = astag(submitted)
                if len(nxt) + n_toks + CHUNK + 2 > SEQLEN:
                    nxt = fresh(submitted)
            else:
                nxt, n_toks = fresh(submitted), astag(submitted)
            submit(nxt, n_toks)
            if submitted == total:
                win["t1"], win["s1"] = time.monotonic(), snap()
    w_wall = max(win["t1"] - win["t0"], 1e-9)
    d = {k: win["s1"][k] - win["s0"][k] for k in win["s0"]}
    return {
        "decode_tps": round(
            d["decode_tokens"] / max(d["decode_time_s"], 1e-9), 1),
        "e2e_tok_s": round(win_tokens / w_wall, 1),
        "occupancy": round(d["decode_tokens"] / max(d["slot_steps"], 1), 4),
        "pipelined": d["pipelined_chunks"],
        "chunks": d["decode_steps"],
        "window_s": round(w_wall, 2),
    }


eng = Engine("probe-qwen3", ByteTokenizer(), params=params,
             max_slots=B, page_size=64, n_pages=B * (SEQLEN // 64) + 1,
             max_seq_len=SEQLEN, decode_chunk_len=CHUNK, seed=0,
             cache_mode="slot", enable_prefix_cache=True)
reentry = min(SEQLEN - 1, PROMPT + DECODE + 64 + 1)
eng.warmup(prompt_lens=(PROMPT, reentry), max_ctx=SEQLEN)
eng.generate(GenerationRequest(
    prompt_ids=rng.integers(0, cfg.vocab_size, size=PROMPT).tolist(),
    max_tokens=8, **SAMP))

runs = [("sus", False)] * (2 * PAIRS) + [("agent", True)] * 2
for i, (name, reenter) in enumerate(runs):
    new = bool(i % 2)
    eng.churn_rtt_s = 0.035 if new else 0.0
    out = closed_loop_round(eng, B, reenter)
    out["what"] = f"{name}_{'count' if new else 'anyrow'}_r{i}"
    print(json.dumps(out), flush=True)
eng.shutdown()
