"""Product-path run on real TPU hardware (VERDICT r3 #3b).

Two phases, both through the REAL engine on the chip:

1. **Flow proof** — the hermetic scripted-conversation machinery from
   tests/test_product_path_engine.py runs with the engines on TPU:
   ``deep_search --mode solve --backend engine`` through two
   deep_websearch tool calls (replay search, explorer on a co-served aux
   engine) to a boxed answer, asserting the trace schema and prefix-cache
   hits. Proves the full product loop end-to-end ON the chip.

2. **Throughput** — policy (1.5B dense, random bf16) + aux (0.6B-class)
   co-served on one chip; N problems solved concurrently through
   PolicyAgent/BatchRunner with replay search and bounded budgets. With
   random weights the generations are noise (no checkpoints exist in this
   zero-egress environment), so no tool calls parse — but every turn
   re-enters the engine with the grown conversation (the multi-turn
   prefix-reuse pattern, reference scripts/deep_search.py:1820-1859) and
   the run reports an honest trajectories/hour for this token budget.

3. **Concurrency** (VERDICT r4 #2) — the product path at the reference's
   north-star concurrency (scripts/deep_search.py:2611 semaphore,
   README.md:37 ``--concurrent_limit 100``): 96 trajectories live at once
   through PolicyAgent/BatchRunner on a 96-slot slot-cache policy engine
   with prefix PARKING, multi-turn re-entry, aux co-served. Reports
   trajectories/hr, decode tok/s, occupancy, park hits.

4. **Verify** (VERDICT r4 #7) — asymmetric verification ON the chip:
   ``--mode solve_bestofn`` through the engine backend with a scripted
   policy model (same machinery as phase 1) — N solver samples batched
   on-chip, verifier fact-check, confidence extraction, selection trace
   (reference semantics: scripts/deep_search.py:2116-2323).

Writes a JSON summary to PRODUCT_RUN.json and prints it.
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_test_module():
    spec = importlib.util.spec_from_file_location(
        "product_path_machinery",
        os.path.join(REPO, "tests", "test_product_path_engine.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def phase1_flow() -> dict:
    """Scripted-conversation product loop with the engines on TPU."""
    m = load_test_module()
    from deepsearch_tts_tpu.cli import deep_search as ds
    from deepsearch_tts_tpu.cli.deep_search import build_parser
    from deepsearch_tts_tpu.models import registry
    import jax.numpy as jnp
    import jax

    tmp = tempfile.mkdtemp(prefix="product_flow_")
    replay = os.path.join(tmp, "replay.json")
    m._write_replay(replay)
    argv = ["--mode", "solve", "--backend", "engine",
            "--search_backend", "replay", "--replay_path", replay,
            "--input_path", os.path.join(tmp, "problems.json"),
            "--output_dir", os.path.join(tmp, "out"),
            "--model_name", "script-main", "--aux_model_name", "script-aux",
            "--engine_max_slots", "4", "--engine_page_size", "16",
            "--engine_pages", "1025", "--engine_max_seq_len", "4096",
            "--engine_prefill_lane", "0",
            "--temperature", "0.0", "--max_tokens", "512",
            "--max_search_calls", "5",
            "--price_config_path",
            os.path.join(REPO, "model_config", "aihubmix_price.json")]
    args = build_parser().parse_args(argv)
    main_rec, aux_rec = m._dry_run(args)

    main_script = m._build_script(
        (m.TOK.apply_chat_template(msgs, tools, add_generation_prompt=True),
         out) for msgs, tools, out in main_rec.chat_calls)
    aux_script = m._build_script(aux_rec.complete_calls)

    class _Cfg:
        vocab_size = m.TOK.vocab_size
        n_layers = 1
        n_kv_heads = 1
        head_dim = 8
        hidden = 16
        jnp_dtype = jnp.float32
        custom_init = True

    def forward(params, cfg, tokens, positions, *, k_pages=None,
                v_pages=None, logits_indices=None, **kw):
        script = params["script"]
        pos = positions
        if logits_indices is not None:
            pos = jnp.take_along_axis(positions, logits_indices[:, None],
                                      axis=1)
        nxt = script[jnp.clip(pos + 1, 0, script.shape[0] - 1)]
        return 30.0 * jax.nn.one_hot(nxt, cfg.vocab_size,
                                     dtype=jnp.float32), (k_pages, v_pages)

    for name, script in (("script-main", main_script),
                         ("script-aux", aux_script)):
        registry.register(name, _Cfg(), lambda c, k, s=script: {"script": s},
                          forward, lambda: {})

    with open(os.path.join(tmp, "problems.json"), "w") as f:
        json.dump([{"Question": m.QUESTION}], f)

    t0 = time.monotonic()
    ds.main(argv)
    wall = time.monotonic() - t0

    out = os.path.join(tmp, "out")
    rows_path = sorted(p for p in os.listdir(out)
                       if p.startswith("policy_results_"))[-1]
    rows = json.load(open(os.path.join(out, rows_path)))
    stats_path = sorted(p for p in os.listdir(out)
                        if p.startswith("statistics_"))[-1]
    stats = json.load(open(os.path.join(out, stats_path)))
    row = rows[0]
    assert row["pred_answer"] == "Paris", row["pred_answer"]
    assert len(row["web_search"]) == 2
    eng = stats["engine"]
    assert eng["requests"] == 3
    assert eng["prefix_cache"]["hits"] >= 1
    return {
        "wall_s": round(wall, 1),
        "pred_answer": row["pred_answer"],
        "tool_calls": len(row["web_search"]),
        "engine_requests": eng["requests"],
        "prefix_hits": eng["prefix_cache"]["hits"],
        "prefix_tokens_reused": eng["prefix_cache"]["tokens_reused"],
        "device": _device(),
    }


def _device() -> str:
    import jax

    return str(jax.devices()[0])


def phase2_throughput(n_problems: int = 8) -> dict:
    """Policy + aux co-served on the chip; N concurrent trajectories."""
    import asyncio

    from deepsearch_tts_tpu.agents.policy import PolicyAgent
    from deepsearch_tts_tpu.agents.runner import BatchRunner
    from deepsearch_tts_tpu.agents.websearch import WebSearchTool
    from deepsearch_tts_tpu.agents.client import EngineClient
    from deepsearch_tts_tpu.engine.engine import Engine
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.engine.weights import fast_random_params
    from deepsearch_tts_tpu.models import qwen3, registry
    from deepsearch_tts_tpu.models.qwen3 import Qwen3Config
    from deepsearch_tts_tpu.web.fetch import PageFetcher
    from deepsearch_tts_tpu.web.replay import (
        ReplaySearchBackend,
        ReplayStore,
        replay_fetcher,
    )

    policy_cfg = Qwen3Config(vocab_size=32768, hidden=2048, n_layers=28,
                             n_heads=16, n_kv_heads=8, head_dim=128,
                             intermediate=6144, tie_embeddings=True)
    aux_cfg = Qwen3Config(vocab_size=32768, hidden=1024, n_layers=28,
                          n_heads=16, n_kv_heads=8, head_dim=64,
                          intermediate=3072, tie_embeddings=True)
    registry.register("prod-policy", policy_cfg, qwen3.init_params,
                      qwen3.forward, lambda: qwen3.logical_axes(policy_cfg))
    registry.register("prod-aux", aux_cfg, qwen3.init_params, qwen3.forward,
                      lambda: qwen3.logical_axes(aux_cfg))

    tok = ByteTokenizer()
    t_init = time.monotonic()
    policy_engine = Engine(
        "prod-policy", tok, params=fast_random_params(policy_cfg, seed=0),
        max_slots=n_problems, page_size=64,
        n_pages=n_problems * 64 + 1, max_seq_len=4096,
        decode_chunk_len=32, cache_mode="paged", seed=0)
    aux_engine = Engine(
        "prod-aux", tok, params=fast_random_params(aux_cfg, seed=1),
        max_slots=4, page_size=64, n_pages=257, max_seq_len=4096,
        decode_chunk_len=32, cache_mode="paged", seed=1)
    # pre-compile the prompt buckets the growing conversations will hit
    policy_engine.warmup(prompt_lens=(128, 600, 1200, 2400),
                         group_sizes=(1, 2, 4, 8), max_ctx=4096)
    init_s = time.monotonic() - t_init

    store = ReplayStore()
    backend = ReplaySearchBackend(store)
    fetcher = PageFetcher(raw_fetch=replay_fetcher(store))
    gen_opts = {"temperature": 0.7, "top_p": 0.8, "min_p": 0.05,
                "top_k_sampling": 20, "repetition_penalty": 1.05,
                "max_tokens": 384}
    main = EngineClient(policy_engine, default_opts=gen_opts)
    aux = EngineClient(aux_engine, default_opts=gen_opts)
    tool = WebSearchTool(backend, fetcher, aux, top_k=5, gen_opts=gen_opts)
    agent = PolicyAgent(main, search_tool=tool, max_search_calls=2,
                        gen_opts=gen_opts)

    problems = [{"Question": f"Throughput probe question number {i}: what "
                             f"is the answer to life times {i}?"}
                for i in range(n_problems)]
    out_dir = tempfile.mkdtemp(prefix="product_tput_")
    runner = BatchRunner(agent, output_dir=out_dir,
                         concurrent_limit=n_problems, mode="solve")

    t0 = time.monotonic()
    results = runner.run_sync(problems)
    wall_cold = time.monotonic() - t0

    t0 = time.monotonic()
    results2 = runner.run_sync(problems)
    wall_warm = time.monotonic() - t0

    st = policy_engine.telemetry()
    summary = {
        "n_problems": n_problems,
        "init_s": round(init_s, 1),
        "wall_cold_s": round(wall_cold, 1),
        "wall_warm_s": round(wall_warm, 1),
        "trajectories_per_hour_warm": round(n_problems / wall_warm * 3600, 1),
        "policy_decode_tokens": st["decode_tokens"],
        "policy_decode_tps": round(st["decode_tokens"]
                                   / max(st["decode_time_s"], 1e-9), 1),
        "policy_prefill_tokens": st["prefill_tokens"],
        "prefix_cache": st.get("prefix_cache"),
        "turns_per_traj": round(
            sum(len([m for m in r.get("messages", [])
                     if m.get("role") == "assistant"])
                for r in results2) / max(len(results2), 1), 1),
        "device": _device(),
    }
    policy_engine.shutdown()
    aux_engine.shutdown()
    return summary


def phase3_concurrency(n_problems: int = 192, n_slots: int = 96) -> dict:
    """North-star concurrency: 96 trajectories live at once through the
    real agent stack, slot cache + parking, multi-turn re-entry.

    Memory plan (parallel/plan.py logic, v5e 16GiB): 1.5B policy params
    2.7GiB + slot pool 96x896 = 9.4GiB + 0.6B aux engine ~1GiB + acts
    <0.5GiB. Per-turn budgets sized so a full trajectory (<=6 turns of 64
    tokens through the ByteTokenizer chat template) stays inside the 896
    token per-slot KV row."""
    from deepsearch_tts_tpu.agents.policy import PolicyAgent
    from deepsearch_tts_tpu.agents.runner import BatchRunner
    from deepsearch_tts_tpu.agents.websearch import WebSearchTool
    from deepsearch_tts_tpu.agents.client import EngineClient
    from deepsearch_tts_tpu.engine.engine import Engine
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.engine.weights import device_random_params
    from deepsearch_tts_tpu.models import qwen3, registry
    from deepsearch_tts_tpu.models.qwen3 import Qwen3Config
    from deepsearch_tts_tpu.web.fetch import PageFetcher
    from deepsearch_tts_tpu.web.replay import (
        ReplaySearchBackend,
        ReplayStore,
        replay_fetcher,
    )

    if os.environ.get("PRODUCT_SMALL"):   # CPU smoke: same flow, tiny dims
        policy_cfg = Qwen3Config(vocab_size=512, hidden=64, n_layers=2,
                                 n_heads=4, n_kv_heads=2, head_dim=16,
                                 intermediate=128, tie_embeddings=True)
        aux_cfg = policy_cfg
    else:
        policy_cfg = Qwen3Config(vocab_size=32768, hidden=2048, n_layers=28,
                                 n_heads=16, n_kv_heads=8, head_dim=128,
                                 intermediate=6144, tie_embeddings=True)
        aux_cfg = Qwen3Config(vocab_size=32768, hidden=1024, n_layers=28,
                              n_heads=16, n_kv_heads=8, head_dim=64,
                              intermediate=3072, tie_embeddings=True)
    registry.register("conc-policy", policy_cfg, qwen3.init_params,
                      qwen3.forward, lambda: qwen3.logical_axes(policy_cfg))
    registry.register("conc-aux", aux_cfg, qwen3.init_params, qwen3.forward,
                      lambda: qwen3.logical_axes(aux_cfg))

    tok = ByteTokenizer()
    # PRODUCT_CONC_SEQ trades slots for per-trajectory KV: 96x896 (the
    # north-star concurrency; late turns exceed the ~830-token prompt
    # budget, roll the window, and defeat token-exact parking) vs 64x1344
    # (same 9.4GiB pool; whole conversations fit, parking engages).
    SEQ = int(os.environ.get("PRODUCT_CONC_SEQ", "896"))
    t_init = time.monotonic()
    policy_engine = Engine(
        "conc-policy", tok, params=device_random_params(policy_cfg, seed=0),
        max_slots=n_slots, max_seq_len=SEQ, decode_chunk_len=32,
        cache_mode="slot", enable_prefix_cache=True, seed=0)
    aux_engine = Engine(
        "conc-aux", tok, params=device_random_params(aux_cfg, seed=1),
        max_slots=8, page_size=64, n_pages=8 * 32 + 1, max_seq_len=2048,
        decode_chunk_len=32, cache_mode="paged", seed=1)
    # warm EVERY prefill bucket the growing conversations traverse (mean
    # turn prompt measured ~830 tokens at SEQ=896): the first TPU run left
    # buckets >768 to lazy compile and each cold shape was a ~12s
    # mid-serving stall — decode_tps read 225 because chunk walls absorbed
    # ~26 remote compiles. The persistent compile cache makes this ladder
    # a one-time cost per config.
    max_prompt = SEQ - 65
    lens = sorted({policy_engine._bucket(n)
                   for n in range(64, max_prompt + 1, 32)})
    policy_engine.warmup(prompt_lens=lens, group_sizes=(1, 4, 16),
                         max_ctx=SEQ)
    init_s = time.monotonic() - t_init

    store = ReplayStore()
    backend = ReplaySearchBackend(store)
    fetcher = PageFetcher(raw_fetch=replay_fetcher(store))
    gen_opts = {"temperature": 0.7, "top_p": 0.8, "min_p": 0.05,
                "top_k_sampling": 20, "repetition_penalty": 1.05,
                "max_tokens": 64}
    main = EngineClient(policy_engine, default_opts=gen_opts)
    aux = EngineClient(aux_engine, default_opts=gen_opts)
    tool = WebSearchTool(backend, fetcher, aux, top_k=3, gen_opts=gen_opts)
    agent = PolicyAgent(main, search_tool=tool, max_search_calls=1,
                        gen_opts=gen_opts)

    problems = [{"Question": f"Concurrency probe {i}: what is {i} plus {i}?"}
                for i in range(n_problems)]
    out_dir = tempfile.mkdtemp(prefix="product_conc_")
    runner = BatchRunner(agent, output_dir=out_dir,
                         concurrent_limit=n_slots, mode="solve")

    t0 = time.monotonic()
    results = runner.run_sync(problems)
    wall = time.monotonic() - t0

    st = policy_engine.telemetry()
    chunk_steps = max(st.get("decode_steps", 1), 1)
    occ = st["slot_steps"] / (chunk_steps * policy_engine.decode_chunk_len
                              * n_slots)
    turns = sum(len([m for m in (r.get("messages") or [])
                     if m.get("role") == "assistant"]) for r in results)
    summary = {
        "concurrent": n_slots,
        "n_problems": n_problems,
        "init_s": round(init_s, 1),
        "wall_s": round(wall, 1),
        "trajectories_per_hour": round(n_problems / wall * 3600, 1),
        "turns_total": turns,
        "turns_per_traj": round(turns / max(len(results), 1), 2),
        "policy_decode_tokens": st["decode_tokens"],
        "policy_decode_tps": round(st["decode_tokens"]
                                   / max(st["decode_time_s"], 1e-9), 1),
        "policy_prefill_tokens": st["prefill_tokens"],
        "occupancy": round(occ, 3),
        "park_hits": st.get("slot_park_hits", 0),
        "park_tokens_reused": st.get("slot_park_tokens", 0),
        "exposed_gap_ema_ms": st.get("exposed_gap_ema_ms"),
        "decode_chunks": st.get("decode_steps", 0),
        # lazy remote compiles that landed INSIDE the serving window —
        # each is a ~12s stall folded into decode_time_s
        "post_warmup_builds": st.get("post_warmup_builds", 0),
        "max_seq_len": SEQ,
        "error_rows": sum(1 for r in results if r.get("error")),
        "device": _device(),
    }
    policy_engine.shutdown()
    aux_engine.shutdown()
    return summary


def phase4_verify() -> dict:
    """Asymmetric verification on the chip: solve_bestofn through the
    engine backend with a scripted policy model. The dry run (recording
    client) learns the exact solve + fact-check prompts; the scripted
    model replays them on TPU; the CLI's solve_bestofn mode batches the N
    samples on-chip and the SAME engine then serves the verifier pass
    (reference: scripts/deep_search.py:2116-2323 verify prompts; selection
    = confidence then majority)."""
    import asyncio

    m = load_test_module()
    import jax
    import jax.numpy as jnp

    from deepsearch_tts_tpu.agents.policy import PolicyAgent
    from deepsearch_tts_tpu.cli import deep_search as ds
    from deepsearch_tts_tpu.cli.deep_search import build_parser
    from deepsearch_tts_tpu.models import registry

    tmp = tempfile.mkdtemp(prefix="product_verify_")
    N = 3
    QUESTION = "What is the capital of France?"
    SOLVE = ("I recall directly that the capital of France is Paris."
             r" \boxed{Paris}")
    CONF = r"The answer is well supported. \[\boxed{0.85}\]"

    # dry run: same agent code, recording client — learns the solve prompt
    # and the verifier fact-check prompt the engine run will see
    rec = m.RecordingClient(chat_replies=[SOLVE] * N + [CONF])
    agent = PolicyAgent(rec, search_tool=None, max_search_calls=0,
                        gen_opts={"temperature": 0.0, "max_tokens": 512})
    res = asyncio.run(agent.solve_best_of_n(QUESTION, n=N))
    assert res.answer == "Paris" and res.confidence == 0.85, (
        res.answer, res.confidence)
    assert not rec.chat_replies

    script = m._build_script(
        (m.TOK.apply_chat_template(msgs, tools, add_generation_prompt=True),
         out) for msgs, tools, out in rec.chat_calls)

    class _Cfg:
        vocab_size = m.TOK.vocab_size
        n_layers = 1
        n_kv_heads = 1
        head_dim = 8
        hidden = 16
        jnp_dtype = jnp.float32
        custom_init = True

    def forward(params, cfg, tokens, positions, *, k_pages=None,
                v_pages=None, logits_indices=None, **kw):
        pos = positions
        if logits_indices is not None:
            pos = jnp.take_along_axis(positions, logits_indices[:, None],
                                      axis=1)
        nxt = params["script"][jnp.clip(pos + 1, 0,
                                        params["script"].shape[0] - 1)]
        return 30.0 * jax.nn.one_hot(nxt, cfg.vocab_size,
                                     dtype=jnp.float32), (k_pages, v_pages)

    registry.register("verify-main", _Cfg(),
                      lambda c, k, s=script: {"script": s}, forward,
                      lambda: {})

    with open(os.path.join(tmp, "problems.json"), "w") as f:
        json.dump([{"Question": QUESTION}], f)

    argv = ["--mode", "solve_bestofn", "--n_samples", str(N),
            "--backend", "engine", "--search_backend", "replay",
            "--input_path", os.path.join(tmp, "problems.json"),
            "--output_dir", os.path.join(tmp, "out"),
            "--model_name", "verify-main", "--aux_model_name", "verify-main",
            "--engine_max_slots", str(N + 1), "--engine_page_size", "16",
            "--engine_pages", "1025", "--engine_max_seq_len", "4096",
            "--engine_prefill_lane", "0",
            "--temperature", "0.0", "--max_tokens", "512",
            "--max_search_calls", "0",
            "--price_config_path",
            os.path.join(REPO, "model_config", "aihubmix_price.json")]
    t0 = time.monotonic()
    ds.main(argv)
    wall = time.monotonic() - t0

    out = os.path.join(tmp, "out")
    rows_path = sorted(p for p in os.listdir(out)
                       if p.startswith("policy_results_"))[-1]
    row = json.load(open(os.path.join(out, rows_path)))[0]
    sel = row.get("best_of_n") or {}
    assert row["pred_answer"] == "Paris", row["pred_answer"]
    assert sel.get("n_samples") == N, sel
    stats_path = sorted(p for p in os.listdir(out)
                        if p.startswith("statistics_"))[-1]
    stats = json.load(open(os.path.join(out, stats_path)))
    eng = stats.get("engine") or {}
    return {
        "wall_s": round(wall, 1),
        "n_samples": N,
        "pred_answer": row["pred_answer"],
        "confidence": row.get("confidence_score"),
        "selection": sel,
        "engine_requests": eng.get("requests"),
        "device": _device(),
    }


if __name__ == "__main__":
    if os.environ.get("PRODUCT_CPU"):   # hermetic smoke: force CPU before
        import jax                       # any backend init (the axon
        jax.config.update("jax_platforms", "cpu")  # sitecustomize ignores
        #                                            JAX_PLATFORMS=cpu)
    out_path = os.environ.get("PRODUCT_OUT",
                              os.path.join(REPO, "PRODUCT_RUN.json"))
    out = {}
    if os.path.exists(out_path):
        try:
            out = json.load(open(out_path))
        except Exception:
            out = {}
    phase = os.environ.get("PRODUCT_PHASE", "both")
    if phase in ("both", "flow"):
        out["flow"] = phase1_flow()
        print("phase1 flow:", json.dumps(out["flow"]), flush=True)
    if phase in ("both", "throughput"):
        out["throughput"] = phase2_throughput(
            int(os.environ.get("PRODUCT_N", "8")))
        print("phase2 throughput:", json.dumps(out["throughput"]), flush=True)
    if phase in ("both", "concurrency"):
        key = os.environ.get("PRODUCT_CONC_KEY", "concurrency")
        out[key] = phase3_concurrency(
            int(os.environ.get("PRODUCT_CONC_N", "192")),
            int(os.environ.get("PRODUCT_CONC_SLOTS", "96")))
        print(f"phase3 {key}:", json.dumps(out[key]), flush=True)
    if phase in ("both", "verify"):
        out["verify"] = phase4_verify()
        print("phase4 verify:", json.dumps(out["verify"]), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
