"""Reproduce + attribute the deployment agent-round-2 collapse (TPU, solo).

Observed (r5, twice): on the DEPLOYMENT engine (B=96, slot cache, built
after the main B=64 engine of bench.py) the first agent round measures
~5000 decode tok/s and the SECOND collapses to ~1400 — deterministically.
Main-engine agent rounds (BENCH_MODE=agent, 3 rounds) do not collapse.

This probe builds only the deployment-shaped engine and runs
burst -> sustained -> agent x PROBE_AGENT_ROUNDS, printing per-round
decode/e2e/occupancy plus the attribution channels:
  - window span deltas (decode_sync / decode_merge / prefill_dispatch /
    exposed_gap / decode_prep): where the wall time went
  - max_chunk_s (reset per round): one giant stall vs uniformly slow
  - post_warmup_builds (reset per round): lazy remote compiles (~12s each)
  - exposed_gap_ema / chunk_ema evolution across rounds: scheduler-state
    poisoning carried between rounds

Usage: python scripts/probe_agent2.py      (PROBE_BATCH=96 default)
"""
import json
import os
import queue as _q
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepsearch_tts_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

B = int(os.environ.get("PROBE_BATCH", 96))
PROMPT = int(os.environ.get("PROBE_PROMPT", 128))
DECODE = int(os.environ.get("PROBE_DECODE", 128))
SEQLEN = int(os.environ.get("PROBE_SEQLEN", 512))
CHUNK = int(os.environ.get("PROBE_CHUNK", 32))
AGENT_ROUNDS = int(os.environ.get("PROBE_AGENT_ROUNDS", 3))

from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
from deepsearch_tts_tpu.engine.weights import device_random_params
from deepsearch_tts_tpu.models import qwen3, registry
from deepsearch_tts_tpu.models.qwen3 import Qwen3Config

cfg = Qwen3Config(vocab_size=32768, hidden=2048, n_layers=28, n_heads=16,
                  n_kv_heads=8, head_dim=128, intermediate=6144,
                  tie_embeddings=True)
registry.register("probe-qwen3", cfg, qwen3.init_params, qwen3.forward,
                  lambda cfg=cfg: qwen3.logical_axes(cfg))

rng = np.random.default_rng(0)
SAMP = dict(temperature=0.7, top_k=20, top_p=0.8, min_p=0.05,
            repetition_penalty=1.05)


def reset(eng):
    eng.stats.update(decode_tokens=0, decode_time_s=0.0, decode_steps=0,
                     prefill_tokens=0, prefill_time_s=0.0, requests=0,
                     lane_tokens=0, slot_steps=0, prefill_dispatches=0,
                     prefill_rows=0, max_chunk_s=0.0, post_warmup_builds=0,
                     injected_groups=0, pipelined_chunks=0, grace_wait_s=0.0)


def fresh(i):
    return rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()


def astag(i, align=False):
    n = DECODE // 2 + (i * 37) % (DECODE // 2)
    if align:
        # completion-aligned turn budgets (VERDICT r4 #1b): round each
        # turn to a chunk multiple so known-length completions land at
        # chunk boundaries instead of idling the row mid-chunk
        n = max(CHUNK, (n // CHUNK) * CHUNK)
    return n


def closed_round(eng, reenter, total=None, warm=None, align=False):
    total = total or 4 * B
    warm = warm if warm is not None else B
    reset(eng)
    t0 = time.monotonic()
    doneq: _q.Queue = _q.Queue()
    submitted = 0
    convs: dict = {}

    def snap():
        s = {k: eng.stats.get(k, 0) for k in
             ("decode_tokens", "decode_time_s", "slot_steps",
              "prefill_tokens", "decode_steps", "prefill_dispatches",
              "prefill_rows", "injected_groups", "pipelined_chunks",
              "grace_wait_s")}
        sm = eng.spans.summary()
        s["spans"] = {k: v["total_s"] for k, v in sm.items()}
        s["span_counts"] = {k: v["count"] for k, v in sm.items()}
        s["group_hist"] = dict(eng.stats.get("prefill_group_hist", {}))
        return s

    def submit(ids, n_toks):
        nonlocal submitted
        r = GenerationRequest(prompt_ids=list(ids), max_tokens=n_toks, **SAMP)
        f = eng.submit(r)
        convs[f] = list(ids)
        f.add_done_callback(doneq.put)
        submitted += 1

    for i in range(B):
        submit(fresh(i), astag(i, align))
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
                n_toks = astag(submitted, align)
                if len(nxt) + n_toks + CHUNK + 2 > SEQLEN:
                    nxt = fresh(submitted)
            else:
                nxt, n_toks = fresh(submitted), astag(submitted, align)
            submit(nxt, n_toks)
            if submitted == total:
                win["t1"], win["s1"] = time.monotonic(), snap()
    wall = time.monotonic() - t0
    w_wall = max(win["t1"] - win["t0"], 1e-9)
    d = {k: win["s1"][k] - win["s0"][k] for k in win["s0"]
         if not isinstance(win["s0"][k], dict)}
    wspans = {k: round(win["s1"]["spans"].get(k, 0.0)
                       - win["s0"]["spans"].get(k, 0.0), 3)
              for k in win["s1"]["spans"]}
    wcounts = {k: win["s1"]["span_counts"].get(k, 0)
               - win["s0"]["span_counts"].get(k, 0)
               for k in win["s1"]["span_counts"]}
    whist = {k: win["s1"]["group_hist"].get(k, 0)
             - win["s0"]["group_hist"].get(k, 0)
             for k in win["s1"]["group_hist"]
             if win["s1"]["group_hist"].get(k, 0)
             - win["s0"]["group_hist"].get(k, 0) > 0}
    return {
        "decode_tps": round(d["decode_tokens"]
                            / max(d["decode_time_s"], 1e-9), 1),
        "e2e_tok_s": round(win_tokens / w_wall, 1),
        "occupancy": round(d["decode_tokens"] / max(d["slot_steps"], 1), 4),
        "window_s": round(w_wall, 2),
        "window_chunks": d["decode_steps"],
        "window_prefill_tokens": d["prefill_tokens"],
        "window_spans": wspans,
        "window_span_counts": wcounts,
        "window_prefill_dispatches": d["prefill_dispatches"],
        "window_prefill_rows": d["prefill_rows"],
        "window_group_hist": whist,
        "window_injected_groups": d["injected_groups"],
        "window_pipelined_chunks": d["pipelined_chunks"],
        "window_grace_wait_s": round(d["grace_wait_s"], 3),
        "max_chunk_s": round(eng.stats.get("max_chunk_s", 0.0), 3),
        "post_warmup_builds": eng.stats.get("post_warmup_builds", 0),
        "gap_ema_ms": round(getattr(eng, "_gap_ema", 0.0) * 1e3, 2),
        "chunk_ema_ms": round(getattr(eng, "_chunk_ema", 0.0) * 1e3, 2),
        "wall_s": round(wall, 2),
    }


def main():
    t0 = time.monotonic()
    params = device_random_params(cfg, seed=0)
    eng = Engine(
        "probe-qwen3", ByteTokenizer(), params=params,
        max_slots=B, page_size=64, n_pages=B * (SEQLEN // 64) + 1,
        max_seq_len=SEQLEN, decode_chunk_len=CHUNK, seed=0,
        cache_mode="slot", prefill_lane=0)
    reentry = min(SEQLEN - 1, PROMPT + DECODE + 64 + 1)
    eng.warmup(prompt_lens=(PROMPT, reentry), max_ctx=SEQLEN)
    eng.generate(GenerationRequest(prompt_ids=fresh(-2), max_tokens=8,
                                   **SAMP))
    print(json.dumps({"init_s": round(time.monotonic() - t0, 1)}),
          flush=True)

    # burst
    reset(eng)
    t0 = time.monotonic()
    futs = [eng.submit(GenerationRequest(prompt_ids=fresh(i),
                                         max_tokens=DECODE, **SAMP))
            for i in range(B)]
    res = [f.result(timeout=3600) for f in futs]
    dwall = time.monotonic() - t0
    st = eng.stats
    print(json.dumps({
        "round": "burst",
        "decode_tps": round(st["decode_tokens"]
                            / max(st["decode_time_s"], 1e-9), 1),
        "e2e_tok_s": round(sum(r.completion_tokens for r in res) / dwall, 1),
    }), flush=True)

    print(json.dumps({"round": "sustained", **closed_round(eng, False)}),
          flush=True)
    plan = os.environ.get("PROBE_PLAN",
                          ",".join(["agent"] * AGENT_ROUNDS)).split(",")
    for i, kind in enumerate(plan):
        kind = kind.strip()
        if kind == "trim":
            eng.chunk_trim = True
        elif eng.chunk_trim:
            eng.chunk_trim = False
        # "nokeep": A/B the device-side seen-mask reuse (r5) against the
        # per-dispatch [Gp, V] upload path within one process
        eng.seen_keep = kind != "nokeep"
        r = closed_round(eng, True, align=(kind == "align"))
        r["seen_keep_rows"] = eng.stats.get("seen_keep_rows", 0)
        print(json.dumps({"round": f"{kind}{i + 1}", **r}), flush=True)
    eng.shutdown()


if __name__ == "__main__":
    main()
