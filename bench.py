"""Decode-throughput benchmark on real TPU hardware.

Measures the serving engine's continuous-batching decode rate (tokens/sec)
for a Qwen3-class dense model with random bf16 weights, and reports it
against the HBM-bandwidth roofline for this chip — the north-star metric in
BASELINE.md ("≥50% of roofline decode tokens/sec").

Roofline model (decode is HBM-bound): each decode step must read the model
weights once (amortized over the whole batch) plus each sequence's KV
context; step_time_roofline = bytes_moved / HBM_BW, and
tokens/sec_roofline = batch / step_time_roofline.

Prints ONE JSON line:
  {"metric": "decode_tokens_per_sec", "value": N, "unit": "tok/s",
   "vs_baseline": fraction_of_roofline, ...}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


HBM_GBPS = {  # per-chip HBM bandwidth
    "v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0,
    "v6e": 1640.0, "default": 819.0,
}


def chip_bw_bytes() -> float:
    kind = ""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        pass
    for k, v in HBM_GBPS.items():
        if k in kind:
            return v * 1e9
    return HBM_GBPS["default"] * 1e9


def count_param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def main():
    from deepsearch_tts_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models import qwen3, registry
    from deepsearch_tts_tpu.models.qwen3 import Qwen3Config

    on_tpu = any("tpu" in d.device_kind.lower() or "TPU" in d.device_kind
                 for d in jax.devices())

    import os

    MODEL = os.environ.get("BENCH_MODEL", "dense")  # dense | moe | mla
    if MODEL == "mla":
        # ~1.3B MLA+MoE (DeepSeek-V3/Kimi geometry scaled to one chip):
        # latent KV cache (1 row/token), routed+shared experts — all
        # touched at serving batch, so the full-parameter roofline read
        # stays honest
        from deepsearch_tts_tpu.models import deepseek_v3
        from deepsearch_tts_tpu.models.deepseek_v3 import DeepSeekV3Config

        cfg = DeepSeekV3Config(
            vocab_size=32768, hidden=1024, n_layers=24, n_heads=16,
            q_lora_rank=512, kv_lora_rank=256, qk_nope_head_dim=64,
            qk_rope_head_dim=32, v_head_dim=64, dense_intermediate=4096,
            first_k_dense=2, n_routed_experts=32, n_shared_experts=1,
            moe_intermediate=512, top_k=4, n_group=4, topk_group=2,
            tie_embeddings=True)
        if not on_tpu:
            from deepsearch_tts_tpu.models.deepseek_v3 import (
                DEEPSEEK_V3_CONFIGS,
            )

            cfg = DEEPSEEK_V3_CONFIGS["deepseek-v3-test"]
        registry.register("bench-qwen3", cfg, deepseek_v3.init_params,
                          deepseek_v3.forward,
                          lambda cfg=cfg: deepseek_v3.logical_axes(cfg))
    elif MODEL == "moe":
        # ~2B-total MoE (Qwen3-MoE geometry scaled to one chip): all
        # experts are touched at serving batch sizes, so the roofline's
        # full-parameter read stays honest
        from deepsearch_tts_tpu.models import qwen3_moe
        from deepsearch_tts_tpu.models.qwen3_moe import Qwen3MoeConfig

        cfg = Qwen3MoeConfig(vocab_size=32768, hidden=1024, n_layers=24,
                             n_heads=16, n_kv_heads=8, head_dim=128,
                             n_experts=32, top_k=4, moe_intermediate=512,
                             tie_embeddings=True)
        if not on_tpu:
            cfg = Qwen3MoeConfig(vocab_size=2048, hidden=256, n_layers=4,
                                 n_heads=4, n_kv_heads=2, head_dim=64,
                                 n_experts=8, top_k=2, moe_intermediate=128,
                                 tie_embeddings=True)
        registry.register("bench-qwen3", cfg, qwen3_moe.init_params,
                          qwen3_moe.forward,
                          lambda cfg=cfg: qwen3_moe.logical_axes(cfg))
    else:
        # ~1.5B-param dense model (qwen3-1.7b geometry, trimmed vocab: the
        # vocab affects only the lm_head read). Decode on a model this size
        # is honestly HBM-bound, so the roofline fraction reflects engine
        # efficiency rather than fixed per-layer launch overhead.
        cfg = Qwen3Config(vocab_size=32768, hidden=2048, n_layers=28,
                          n_heads=16, n_kv_heads=8, head_dim=128,
                          intermediate=6144, tie_embeddings=True)
        if not on_tpu:
            cfg = Qwen3Config(vocab_size=2048, hidden=256, n_layers=4,
                              n_heads=4, n_kv_heads=2, head_dim=64,
                              intermediate=512, tie_embeddings=True)
        registry.register("bench-qwen3", cfg, qwen3.init_params,
                          qwen3.forward,
                          lambda cfg=cfg: qwen3.logical_axes(cfg))

    B = int(os.environ.get("BENCH_BATCH", 64 if on_tpu else 2))
    PROMPT = int(os.environ.get("BENCH_PROMPT", 128))
    DECODE = int(os.environ.get("BENCH_DECODE", 128))
    SEQLEN = int(os.environ.get("BENCH_SEQLEN", 512))  # per-seq KV budget
    CHUNK = int(os.environ.get("BENCH_CHUNK", 32 if on_tpu else 4))
    ATTN = os.environ.get("BENCH_ATTN") or None
    PS = int(os.environ.get("BENCH_PS", 64))
    _MODE0 = os.environ.get("BENCH_MODE", "")
    # default cache per workload: the contiguous-slot cache everywhere (the
    # slot Pallas kernel measures 6824 vs 6435 tok/s paged-XLA on dense,
    # r3). r4: multiturn runs slot too — slot-mode prefix PARKING (the
    # engine re-admits a returning trajectory into its own row, token-exact,
    # zero copy) replaced the paged-only prefix sharing. MLA joined in r4:
    # lane-aligned latent rows (288→384 padding) + the K=1 sublane squeeze
    # in the slot kernel took it from collapse (710) to parity with paged
    # (5187 vs 5365 same-process, within tunnel variance).
    CACHE_MODE = os.environ.get(
        "BENCH_CACHE", "paged" if not on_tpu else "slot")
    if int(os.environ.get("BENCH_SPEC", 0)):
        CACHE_MODE = "slot"   # speculative decoding is slot-cache-only
    QUANT = os.environ.get("BENCH_QUANT") or None        # int8 weights
    KVQUANT = os.environ.get("BENCH_KVQUANT") or None    # int8 KV pages
    PACK = {"1": True, "0": False}.get(os.environ.get("BENCH_PACK", ""))  # None=auto
    # ctx-sliced decode tables: fine (default) / 1=pow2 / 0=off
    BUCKETS = {"1": True, "0": False}.get(
        os.environ.get("BENCH_BUCKETS", "fine"),
        os.environ.get("BENCH_BUCKETS", "fine"))
    # Pallas fused layer kernels: auto (engine decides) / 1=force / 0=off
    FUSED = {"1": True, "0": False}.get(os.environ.get("BENCH_FUSED", ""))
    PFG = os.environ.get("BENCH_PFGROUP")  # prefill rows per dispatch
    MODE = os.environ.get("BENCH_MODE", "")  # "" | multiturn | sustained
    # in-flight prefill lane (fresh-only one-shot contract, r4): each decode
    # step can carry ONE whole prompt of <= LANE tokens, causal within its
    # own rows — truly free overlap with decode's HBM-bound weight reads.
    # Width must cover the prompt length or nothing is lane-eligible.
    # agent mode keeps the lane OFF: at B>=64 on this chip, decode+128
    # lane rows cross the roofline ridge (~154 rows at 86 TFLOPs/560GB/s)
    # and each step turns MXU-bound — batched-injected prefill wins
    # (measured r4: lane-128 sustained 3755 vs lane-off ~5100 decode).
    LANE = int(os.environ.get("BENCH_LANE", 0))
    # lane completions per chunk; 0 = engine default. Steady-state churn is
    # max_slots*chunk/mean_decode completions per chunk.
    LANE_ACT = int(os.environ.get("BENCH_LANE_ACT", 0)) or None
    # n-gram speculative decoding (engine/speculative.py): >0 sets spec_k.
    # Opt-in: random-weight sampled decode has little copy structure, so the
    # honest default stays non-speculative; greedy random-init decode cycles
    # and shows the acceptance ceiling (pair with BENCH_GREEDY=1).
    SPEC = int(os.environ.get("BENCH_SPEC", 0))
    # half-chunk trim near known completions, now behind the r5 dynamic
    # amortization gate (engine.trim_min_rows=None): measured-negative in
    # r4 with the always-trim policy; re-A/B'd via BENCH_TRIM=1
    TRIM = os.environ.get("BENCH_TRIM", "0") == "1"
    GREEDY = os.environ.get("BENCH_GREEDY", "0") == "1"
    SAMP_KW = (dict(temperature=0.0, top_k=20, top_p=1.0, min_p=0.0,
                    repetition_penalty=1.0) if GREEDY else
               dict(temperature=0.7, top_k=20, top_p=0.8, min_p=0.05,
                    repetition_penalty=1.05))

    from deepsearch_tts_tpu.engine.weights import (device_random_params,
                                                   fast_random_params)

    t_init = time.monotonic()
    # on TPU, on-device init (one jit, zero host->device weight bytes) beats
    # the host numpy path by minutes at 1.5B scale: the tunnel transfer alone
    # measured 178-329s (scripts/probe_init_cache.py), vs one remote-compile
    # RTT that the persistent cache absorbs on later bring-ups.
    # BENCH_INIT=host restores the numpy path.
    if on_tpu and os.environ.get("BENCH_INIT", "device") == "device":
        params = device_random_params(cfg, seed=0)
    else:
        params = fast_random_params(cfg, seed=0)   # host init: bulk transfer
    engine = Engine(
        "bench-qwen3", ByteTokenizer(), params=params,
        max_slots=B, page_size=PS, n_pages=B * (SEQLEN // PS) + 1,
        max_seq_len=SEQLEN,
        decode_chunk_len=CHUNK, seed=0,
        enable_prefix_cache=(MODE in ("multiturn", "agent")),
        attn_impl=ATTN, cache_mode=CACHE_MODE, quantize=QUANT,
        kv_quantize=KVQUANT, pack_weights=PACK, context_buckets=BUCKETS,
        layer_fusion=FUSED, max_prefill_group=int(PFG) if PFG else None,
        prefill_lane=LANE, lane_max_act=LANE_ACT,
        speculative=("ngram" if SPEC else None), spec_k=(SPEC or 3),
        chunk_trim=TRIM,
    )
    init_s = time.monotonic() - t_init

    import numpy as np

    rng = np.random.default_rng(0)

    def req(i, n_tokens=None):
        ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
        return GenerationRequest(prompt_ids=ids,
                                 max_tokens=n_tokens or DECODE, **SAMP_KW)

    def stag(i):
        # staggered decode lengths (mean ≈ DECODE) for steady-state rounds:
        # uniform max_tokens makes the whole batch complete on the same
        # chunk, which degenerates sustained serving into repeated cold
        # bursts (no slot active at admission → the prefill lane never
        # engages)
        return DECODE // 2 + (i * 37) % DECODE

    # warmup: compile decode + the prefill group shapes the run will use
    # (group-of-8 fused prefill+sample, group-of-1 leftovers), then one real
    # request end-to-end. max_ctx bounds the decode-bucket ladder to what
    # this run can actually reach — every skipped bucket is a multi-second
    # remote compile saved from init_s (r3 capture: 212s at default config).
    if MODE == "multiturn":
        MAXCTX = PROMPT + 2 * DECODE + 64 + CHUNK + 2
    elif MODE == "sustained":
        MAXCTX = PROMPT + (DECODE // 2 + DECODE) + CHUNK + 2
    elif MODE == "latency":
        # background streams decode 2*DECODE; speculation can overshoot by
        # chunk*(K+1) device-side
        MAXCTX = PROMPT + 2 * DECODE + CHUNK * ((SPEC or 0) + 1) + 2
    else:  # burst + the deployment phase's sustained round (staggered lens)
        MAXCTX = PROMPT + (DECODE // 2 + DECODE) + CHUNK + 2
    MAXCTX = min(MAXCTX, SEQLEN)
    engine.warmup(prompt_lens=(PROMPT,), max_ctx=MAXCTX)
    engine.generate(req(-1))
    engine.stats.update(decode_tokens=0, decode_time_s=0.0, decode_steps=0,
                        prefill_tokens=0, prefill_time_s=0.0, requests=0,
                        slot_steps=0, prefill_dispatches=0, prefill_rows=0)
    engine.spans.reset()

    def reset_stats(eng):
        eng.stats.update(decode_tokens=0, decode_time_s=0.0,
                         decode_steps=0, prefill_tokens=0,
                         prefill_time_s=0.0, requests=0, lane_tokens=0,
                         slot_steps=0, prefill_dispatches=0, prefill_rows=0)

    def sustained_round(eng, nslots, total=None, warm=None):
        """Steady-state serving: keep ``nslots`` in flight, refill on every
        completion until ``total`` requests have been submitted.

        Metrics come from a measurement WINDOW that excludes the cold ramp
        (first ``warm`` completions) and the drain tail (after the last
        refill, in-flight decays to zero — an infinite workload has no such
        phase, so including it understates steady-state throughput; r3's
        sustained_e2e was ~50% drain by wall time at total=2B). Within the
        window the in-flight count is exactly ``nslots`` at every instant.
        Window e2e = completion tokens finishing inside it / window wall;
        window decode/occupancy come from telemetry deltas."""
        import queue as _q

        total = total or 4 * nslots
        warm = warm if warm is not None else nslots
        reset_stats(eng)
        t0 = time.monotonic()
        doneq: _q.Queue = _q.Queue()
        submitted = 0

        def snap():
            return {k: eng.stats[k] for k in
                    ("decode_tokens", "decode_time_s", "slot_steps",
                     "prefill_tokens", "lane_tokens")}

        for i in range(nslots):
            eng.submit(req(i, stag(i))).add_done_callback(doneq.put)
            submitted += 1
        results = []
        win: dict = {}
        win_tokens = 0
        while len(results) < total:
            f = doneq.get(timeout=3600)
            r = f.result()
            results.append(r)
            if "t0" in win and "t1" not in win:
                win_tokens += r.completion_tokens
            if len(results) == warm and "t0" not in win:
                win["t0"], win["s0"] = time.monotonic(), snap()
            if submitted < total:
                eng.submit(req(submitted, stag(submitted))) \
                    .add_done_callback(doneq.put)
                submitted += 1
                if submitted == total:
                    win["t1"], win["s1"] = time.monotonic(), snap()
        wall = time.monotonic() - t0
        st = eng.telemetry()
        w_wall = max(win["t1"] - win["t0"], 1e-9)
        d = {k: win["s1"][k] - win["s0"][k] for k in win["s0"]}
        return {
            "decode_tps": d["decode_tokens"] / max(d["decode_time_s"], 1e-9),
            "e2e_tok_s": win_tokens / w_wall,
            "occupancy": d["decode_tokens"] / max(d["slot_steps"], 1),
            "decode_busy_frac": d["decode_time_s"] / w_wall,
            "window_s": w_wall, "window_tokens": win_tokens,
            "full_run_e2e": sum(r.completion_tokens for r in results) / wall,
            "wall_s": wall, "stats": st,
            "cached_prompt_tokens": 0,
        }

    def agent_round(eng, nslots, total=None, warm=None):
        """Sustained MULTI-TURN serving — the product workload shape
        (reference: trajectories re-enter with the conversation so far +
        a tool result, scripts/deep_search.py:1820-1859). Every completed
        turn immediately re-enters as prompt+generated+64 new tokens; a
        trajectory retires when its next turn would exceed the KV budget,
        and a fresh one starts. With slot parking the re-entry prefills
        only the suffix (zero-copy prefix), so the steady-state prefill
        share is a fraction of the all-fresh sustained round's. Same
        measurement window as sustained_round."""
        import queue as _q

        total = total or 4 * nslots
        warm = warm if warm is not None else nslots
        reset_stats(eng)
        t0 = time.monotonic()
        doneq: _q.Queue = _q.Queue()
        submitted = 0
        convs: dict = {}   # future -> conversation token list

        def snap():
            s = {k: eng.stats[k] for k in
                 ("decode_tokens", "decode_time_s", "slot_steps",
                  "prefill_tokens", "lane_tokens", "slot_park_hits",
                  "slot_park_tokens", "decode_steps")}
            # span totals let a collapsed window be attributed (dispatch
            # stall vs sync stall vs host merge vs prefill)
            s["spans"] = {k: v["total_s"]
                          for k, v in eng.spans.summary().items()}
            s["max_chunk_s"] = eng.stats.get("max_chunk_s", 0.0)
            return s

        def submit(ids, n_toks):
            nonlocal submitted
            r = GenerationRequest(prompt_ids=list(ids), max_tokens=n_toks,
                                  **SAMP_KW)
            f = eng.submit(r)
            convs[f] = list(ids)
            f.add_done_callback(doneq.put)
            submitted += 1

        def fresh(i):
            return rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()

        def astag(i):
            # shorter per-turn decode than the all-fresh round so a turn-2
            # re-entry (prompt+gen+64) still fits the per-seq KV budget
            n = DECODE // 2 + (i * 37) % (DECODE // 2)
            if os.environ.get("BENCH_ALIGN", "0") == "1":
                # completion-aligned turn budgets (VERDICT r4 #1b): round
                # each turn to a chunk multiple so known-length completions
                # land at chunk boundaries instead of idling the row for
                # the rest of the chunk. A serving-client co-design knob —
                # reported as a separate config, not the default workload.
                n = max(CHUNK, (n // CHUNK) * CHUNK)
            return n

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
                nxt = (prompt_ids + r.token_ids
                       + rng.integers(0, cfg.vocab_size, size=64).tolist())
                n_toks = astag(submitted)
                if len(nxt) + n_toks + CHUNK + 2 > SEQLEN:
                    nxt = fresh(submitted)      # trajectory retired
                submit(nxt, n_toks)
                if submitted == total:
                    win["t1"], win["s1"] = time.monotonic(), snap()
        wall = time.monotonic() - t0
        st = eng.telemetry()
        w_wall = max(win["t1"] - win["t0"], 1e-9)
        d = {k: win["s1"][k] - win["s0"][k] for k in win["s0"]
             if not isinstance(win["s0"][k], dict)}
        wspans = {k: round(win["s1"]["spans"].get(k, 0.0)
                           - win["s0"]["spans"].get(k, 0.0), 3)
                  for k in win["s1"]["spans"]}
        return {
            "decode_tps": d["decode_tokens"] / max(d["decode_time_s"], 1e-9),
            "e2e_tok_s": win_tokens / w_wall,
            "occupancy": d["decode_tokens"] / max(d["slot_steps"], 1),
            "decode_busy_frac": d["decode_time_s"] / w_wall,
            "window_s": w_wall, "window_tokens": win_tokens,
            "window_spans": wspans,
            "window_chunks": d["decode_steps"],
            "max_chunk_s": round(win["s1"]["max_chunk_s"], 3),
            "window_prefill_tokens": d["prefill_tokens"],
            "park_hits": d["slot_park_hits"],
            "park_tokens_reused": d["slot_park_tokens"],
            "full_run_e2e": sum(r.completion_tokens for r in results) / wall,
            "wall_s": wall, "stats": st,
            "cached_prompt_tokens": d["slot_park_tokens"],
        }

    def latency_round(eng, nbg=0):
        """Client-visible latency for ONE stream: TTFT (submit -> first
        on_delta callback) and per-token delivery cadence. Tokens arrive in
        chunk-sized bursts (the engine syncs a decode chunk, then fires
        per-token callbacks), so the honest latency metrics are the mean
        per-token time plus the inter-BURST gap percentiles — what a
        streaming client actually waits between screen updates. ``nbg``
        background streams load the other slots (the serving-under-load
        case); they outlast the probe stream by construction.

        The latency regime (small batch, small chunk) is also where
        speculative decoding lives: BENCH_SPEC composes with this mode.
        Reference serves latency-sensitive streaming over SSE from vLLM
        (reference: demo/run_logit.py:385-419); here the engine's own
        chunk cadence is the measured quantity."""
        import numpy as _np

        bg = [eng.submit(req(1000 + i, n_tokens=2 * DECODE))
              for i in range(nbg)]
        out = []
        for p in range(int(os.environ.get("BENCH_LAT_PROBES", 3))):
            arr = []
            t0 = time.monotonic()
            r = eng.generate(GenerationRequest(
                prompt_ids=rng.integers(
                    0, cfg.vocab_size, size=PROMPT).tolist(),
                max_tokens=DECODE,
                on_delta=lambda s: arr.append(time.monotonic()),
                **SAMP_KW))
            total = time.monotonic() - t0
            if not arr:
                continue
            gaps = _np.diff(_np.asarray(arr))
            bursts = gaps[gaps > 5e-4]   # chunk-sync boundaries
            out.append({
                "ttft_ms": (arr[0] - t0) * 1e3,
                "tok_mean_ms": (total - (arr[0] - t0)) * 1e3
                / max(r.completion_tokens - 1, 1),
                "burst_gap_p50_ms": float(_np.median(bursts)) * 1e3
                if bursts.size else 0.0,
                "burst_gap_p99_ms": float(_np.percentile(bursts, 99)) * 1e3
                if bursts.size else 0.0,
                "tokens_per_burst": r.completion_tokens
                / max(bursts.size + 1, 1),
                "single_stream_tok_s": r.completion_tokens / total,
            })
        for f in bg:
            f.result(timeout=3600)
        best = min(out, key=lambda o: o["tok_mean_ms"])
        return {k: round(v, 3) for k, v in best.items()}

    # several measured rounds: the axon tunnel has ±10-20% run-to-run
    # variance (CLAUDE.md); report the best round, keep all in detail
    multiturn = MODE == "multiturn"
    sustained = MODE == "sustained"
    agent = MODE == "agent"
    if MODE == "latency":
        alone = latency_round(engine, nbg=0)
        loaded = latency_round(engine, nbg=B - 1)
        st = engine.telemetry()
        engine.shutdown()
        print(json.dumps({
            "metric": "tok_mean_ms_single_stream",
            "value": alone["tok_mean_ms"],
            "unit": "ms",
            "vs_baseline": 0.0,
            "detail": {
                "mode": "latency", "batch_slots": B, "chunk": CHUNK,
                "prompt_len": PROMPT, "decode_len": DECODE,
                "speculative": (f"ngram k={SPEC}" if SPEC else None),
                "spec_tokens_per_step": round(
                    st.get("decode_tokens", 0)
                    / max(st.get("slot_steps", 1), 1), 3) if SPEC else None,
                "greedy": GREEDY, "init_s": round(init_s, 2),
                "single": alone, "loaded_full_batch": loaded,
                "device": str(jax.devices()[0]),
                "attn_impl": engine.attn_impl,
                "cache_mode": engine.cache_mode,
                "layer_fusion": engine.layer_fusion,
            },
        }))
        return
    rounds = []
    for _ in range(int(os.environ.get("BENCH_ROUNDS", 3))):
        if sustained:
            rounds.append(sustained_round(engine, B))
            continue
        if agent:
            rounds.append(agent_round(engine, B))
            continue
        reset_stats(engine)
        t0 = time.monotonic()
        reqs = [req(i) for i in range(B)]
        futs = engine.submit_many(reqs)
        results = [f.result(timeout=3600) for f in futs]
        cached = 0
        if multiturn:
            # turn 2: each trajectory returns from a "tool call" with the
            # conversation so far plus a tool-result suffix — the product's
            # multi-turn pattern. Prefix cache must keep re-prefill to the
            # new suffix only (engine/prefix_cache.py).
            reqs2 = []
            for rq, r in zip(reqs, results):
                ids = (list(rq.prompt_ids) + list(r.token_ids)
                       + rng.integers(0, cfg.vocab_size, size=64).tolist())
                reqs2.append(GenerationRequest(
                    prompt_ids=ids, max_tokens=DECODE, **SAMP_KW))
            results2 = [f.result(timeout=3600)
                        for f in engine.submit_many(reqs2)]
            cached = sum(r.cached_prompt_tokens for r in results2)
            results = results + results2
        wall = time.monotonic() - t0
        st = engine.telemetry()
        rounds.append({
            "decode_tps": st["decode_tokens"] / max(st["decode_time_s"], 1e-9),
            "e2e_tok_s": sum(r.completion_tokens for r in results) / wall,
            "wall_s": wall, "stats": st, "cached_prompt_tokens": cached,
        })
    best = max(rounds, key=lambda r: r["decode_tps"])
    wall = best["wall_s"]
    st = best["stats"]
    decode_tps = best["decode_tps"]

    # roofline: per step read params once + B sequences' KV context.
    # Bytes are HONEST for the benched config: int8 weights/KV lower the
    # bytes moved, which RAISES the roofline accordingly (VERDICT r1 #3).
    pbytes = count_param_bytes(engine.params)
    kv_elem = 1 if KVQUANT == "int8" else 2
    kv_scale = 4 / cfg.head_dim if KVQUANT == "int8" else 0  # f32/row scales
    # latent-cache models (MLA) store ONE latent row per token (no v pool)
    kv_streams = 1 if getattr(cfg, "latent_cache", False) else 2
    kv_bytes_per_tok = int(kv_streams * cfg.n_layers * cfg.n_kv_heads
                           * cfg.head_dim * (kv_elem + kv_scale))
    avg_ctx = PROMPT + DECODE / 2
    step_bytes = pbytes + B * avg_ctx * kv_bytes_per_tok
    roofline_tps = B / (step_bytes / chip_bw_bytes())
    vs = decode_tps / roofline_tps
    # measured-achievable bandwidth on this chip (streaming probe ≈560GB/s
    # vs 819 spec through the axon virtualization) for context
    achievable_tps = B / (step_bytes / (560e9 if on_tpu else chip_bw_bytes()))
    vs_achievable = decode_tps / achievable_tps

    eng_info = {
        "attn_impl": engine.attn_impl, "cache_mode": engine.cache_mode,
        "quantize": engine.quantize, "kv_quantize": engine.kv_quantize,
        "layer_fusion": engine.layer_fusion,
    }
    if SPEC:
        eng_info["speculative"] = f"ngram k={SPEC}"
        eng_info["spec_tokens_per_step"] = round(
            st.get("decode_tokens", 0) / max(st.get("slot_steps", 1), 1), 3)
    if GREEDY:
        eng_info["greedy"] = True

    # Deployment configuration (VERDICT r2 #5): the ratio-optimal B=64 is
    # the headline (BASELINE.md's ≥50%-of-roofline gate), but deployments
    # chasing raw tok/s serve at a larger batch with the prefill lane on.
    # Measure that config too: one burst round + one steady-state
    # (sustained) round at B=96 / prefill_lane=16.
    deployment = None
    if (on_tpu and not multiturn and not sustained and not SPEC
            and os.environ.get("BENCH_DEPLOY", "1") != "0"):
        engine.shutdown()
        del engine  # free the B=64 KV pools before the larger engine inits
        import gc

        gc.collect()
        try:
            DB = int(os.environ.get("BENCH_DEPLOY_BATCH", 96))
            t_d = time.monotonic()
            dep = Engine(
                "bench-qwen3", ByteTokenizer(), params=params,
                max_slots=DB, page_size=PS, n_pages=DB * (SEQLEN // PS) + 1,
                max_seq_len=SEQLEN, decode_chunk_len=CHUNK, seed=0,
                attn_impl=ATTN, cache_mode=CACHE_MODE, quantize=QUANT,
                kv_quantize=KVQUANT, pack_weights=PACK,
                context_buckets=BUCKETS, layer_fusion=FUSED,
                max_prefill_group=int(PFG) if PFG else None,
                # the lane rides the decode program in both cache layouts
                # (r4: slot-mode lane writes into the slot row's buffer);
                # width = PROMPT so whole prompts are one-shot eligible,
                # activations sized to the chunk (one act per lane step)
                prefill_lane=int(os.environ.get("BENCH_DEPLOY_LANE", 0)),
                lane_max_act=LANE_ACT or CHUNK, chunk_trim=TRIM)
            # the deployment phase runs the agent round: multi-turn
            # re-entries grow to the full KV budget, so warm the whole
            # bucket ladder AND the park-miss re-entry prompt bucket (a
            # lazy compile mid-window is a ~12s stall on axon)
            reentry = min(SEQLEN - 1, PROMPT + DECODE + 64 + 1)
            dep.warmup(prompt_lens=(PROMPT, reentry), max_ctx=SEQLEN)
            dep.generate(req(-2))
            dep_init_s = time.monotonic() - t_d
            reset_stats(dep)
            t0 = time.monotonic()
            dres = [f.result(timeout=3600)
                    for f in dep.submit_many([req(i) for i in range(DB)])]
            dwall = time.monotonic() - t0
            dst = dep.telemetry()
            burst_tps = dst["decode_tokens"] / max(dst["decode_time_s"], 1e-9)
            burst_e2e = sum(r.completion_tokens for r in dres) / dwall
            sus = sustained_round(dep, DB)
            # the product workload: multi-turn re-entry with slot parking.
            # Best of two rounds: ~1 in 8 agent windows absorbs a one-off
            # ~10s tunnel stall (measured in the r4 probes: 1267 vs 4174
            # tok/s same config back-to-back, self-healing) that would
            # otherwise poison the one-shot capture.
            ag_rounds = [agent_round(dep, DB) for _ in range(2)]
            ag = max(ag_rounds, key=lambda r: r["decode_tps"])
            dep_step_bytes = pbytes + DB * avg_ctx * kv_bytes_per_tok
            dep_roof = DB / (dep_step_bytes / chip_bw_bytes())
            deployment = {
                "batch": DB, "prefill_lane": dep.prefill_lane,
                "lane_max_act": dep.LANE_MAX_ACT,
                "init_s": round(dep_init_s, 2),
                "burst_decode_tps": round(burst_tps, 1),
                "burst_e2e_tok_s": round(burst_e2e, 1),
                "sustained_decode_tps": round(sus["decode_tps"], 1),
                "sustained_e2e_tok_s": round(sus["e2e_tok_s"], 1),
                "sustained_e2e_over_decode": round(
                    sus["e2e_tok_s"] / max(sus["decode_tps"], 1e-9), 4),
                "sustained_occupancy": round(sus["occupancy"], 4),
                "sustained_decode_busy_frac": round(
                    sus["decode_busy_frac"], 4),
                "sustained_window_s": round(sus["window_s"], 2),
                "sustained_full_run_e2e": round(sus["full_run_e2e"], 1),
                "agent_rounds_decode_tps": [round(r["decode_tps"], 1)
                                            for r in ag_rounds],
                "agent_decode_tps": round(ag["decode_tps"], 1),
                "agent_e2e_tok_s": round(ag["e2e_tok_s"], 1),
                "agent_e2e_over_decode": round(
                    ag["e2e_tok_s"] / max(ag["decode_tps"], 1e-9), 4),
                "agent_occupancy": round(ag["occupancy"], 4),
                "agent_window_spans": ag.get("window_spans"),
                "agent_window_chunks": ag.get("window_chunks"),
                "agent_max_chunk_s": ag.get("max_chunk_s"),
                "agent_rounds_e2e": [round(r["e2e_tok_s"], 1)
                                     for r in ag_rounds],
                "agent_park_hits": ag["park_hits"],
                "agent_park_tokens_reused": ag["park_tokens_reused"],
                "agent_window_prefill_tokens": ag["window_prefill_tokens"],
                "roofline_tok_s": round(dep_roof, 1),
                "vs_roofline": round(burst_tps / dep_roof, 4),
                "lane_tokens": sus["stats"].get("lane_tokens", 0),
                # lazy remote compiles during serving (should be 0 — each
                # is a ~12s stall that poisons the window it lands in)
                "post_warmup_builds": dep.stats.get("post_warmup_builds", 0),
            }
            dep.shutdown()
        except Exception as e:  # deployment phase must not kill the bench
            deployment = {"error": repr(e)}
    else:
        engine.shutdown()
    print(json.dumps({
        "metric": "decode_tokens_per_sec",
        "value": round(decode_tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 4),
        "detail": {
            "batch": B, "prompt_len": PROMPT, "decode_len": DECODE,
            "model_params_M": round(pbytes / 2 / 1e6, 1),
            "roofline_tok_s": round(roofline_tps, 1),
            "vs_achievable_bw": round(vs_achievable, 4),
            "wall_s": round(wall, 2),
            "init_s": round(init_s, 2),
            "e2e_tok_s": round(best["e2e_tok_s"], 2),
            "rounds": [{"decode_tps": round(r["decode_tps"], 1),
                        "e2e_tok_s": round(r["e2e_tok_s"], 1)}
                       for r in rounds],
            "device": str(jax.devices()[0]),
            **eng_info,
            "prefill_tok_s": round(st["prefill_tokens"] /
                                   max(st["prefill_time_s"], 1e-9), 1),
            "cached_prompt_tokens": best.get("cached_prompt_tokens", 0),
            "prefill_lane": LANE,
            "lane_tokens": st.get("lane_tokens", 0),
            # decode occupancy: fraction of dispatched row-steps that
            # produced a kept token (1 - idle slots - trimmed overrun)
            "occupancy": round(st["decode_tokens"]
                               / max(st.get("slot_steps", 0), 1), 4),
            "prefill_group_mean": round(
                st.get("prefill_rows", 0)
                / max(st.get("prefill_dispatches", 0), 1), 2),
            "spans": st.get("spans", {}),
            "deployment": deployment,
        },
    }))


if __name__ == "__main__":
    main()
