"""Speculative verify-step overhead decomposition (run on the TPU, solo).

The fused T>1 verify path still costs ~1.4-1.5x a plain decode step at
B=8 where the window matmul rows are far under the MXU roofline ridge and
should be ~free. This probe isolates where the time goes by building one
engine per ablated variant (monkeypatched BEFORE the program is traced)
and reading ms/step from engine telemetry — the CLAUDE.md debug ladder's
"in-context ablation by monkeypatching ops" rung.

Variants:
  ctrl          plain decode program (no speculation)
  spec          full n-gram speculative program (zero-acceptance sampled
                workload: every verify step is pure overhead)
  spec_nodraft  ngram_draft -> repeat-last (no history matching compute)
  spec_noattn   slot_window_attention -> zeros (no window attention)
  spec_argmax   sampler -> plain argmax (no repetition/top-k/top-p path)
  spec_noscat   write_kv_flat -> identity (no KV scatter)
  spec_k1       full program at spec_k=1 (K scaling)

Usage: python scripts/probe_spec.py   (PROBE_BATCH=8 by default)
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("PROBE_BATCH", 8))
DECODE = int(os.environ.get("PROBE_DECODE", 96))
K = int(os.environ.get("PROBE_K", 3))

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


def run(label, spec, k=K, patches=()):
    mods = []
    for mod, name, repl in patches:
        mods.append((mod, name, getattr(mod, name)))
        setattr(mod, name, repl)
    try:
        eng = Engine("probe-qwen3", ByteTokenizer(), params=params,
                     max_slots=B, page_size=64, n_pages=B * 8 + 1,
                     max_seq_len=512, decode_chunk_len=32, seed=0,
                     cache_mode="slot",
                     speculative=("ngram" if spec else None), spec_k=k,
                     enable_prefix_cache=False)
        eng.warmup(prompt_lens=(64,), max_ctx=64 + DECODE + 130)
        reqs = [GenerationRequest(
            prompt_ids=rng.integers(0, cfg.vocab_size, size=64).tolist(),
            max_tokens=DECODE, **SAMP) for _ in range(B)]
        [f.result(timeout=3600) for f in eng.submit_many(reqs)]  # warm run
        eng.stats.update(decode_tokens=0, decode_time_s=0.0, decode_steps=0,
                         slot_steps=0)
        t0 = time.monotonic()
        [f.result(timeout=3600)
         for f in eng.submit_many([GenerationRequest(
             prompt_ids=rng.integers(0, cfg.vocab_size, size=64).tolist(),
             max_tokens=DECODE, **SAMP) for _ in range(B)])]
        wall = time.monotonic() - t0
        st = dict(eng.stats)
        steps = st["slot_steps"] / B
        ms = st["decode_time_s"] / max(steps, 1) * 1000
        print(json.dumps({
            "what": label, "ms_per_step": round(ms, 3),
            "decode_tps": round(
                st["decode_tokens"] / max(st["decode_time_s"], 1e-9), 1),
            "tok_per_step": round(st["decode_tokens"] / max(steps, 1), 3),
            "wall_s": round(wall, 2)}), flush=True)
        eng.shutdown()
        del eng
        gc.collect()
    finally:
        for mod, name, orig in mods:
            setattr(mod, name, orig)


from deepsearch_tts_tpu.engine import speculative as spec_mod
from deepsearch_tts_tpu.engine import kvcache as kv_mod
from deepsearch_tts_tpu.ops import slot_attention as slot_mod
from deepsearch_tts_tpu.engine import engine as eng_mod


def _draft_last(hist, lens, k, n=2):
    S = hist.shape[1]
    last = jnp.take_along_axis(hist, jnp.clip(lens, 0, S - 1)[:, None],
                               axis=1)
    return jnp.broadcast_to(last, (hist.shape[0], k))


def _win_zeros(q, k_pool, v_pool, seq_lens, base_pos, layer, **kw):
    return jnp.zeros(q.shape, q.dtype)


def _argmax_sample(logits, sp, seen, key):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _noscat(k_flat, v_flat, k_new, v_new, positions, table_l):
    return k_flat, v_flat


which = os.environ.get("PROBE_ONLY", "").split(",") if \
    os.environ.get("PROBE_ONLY") else None
for label, fn in [
    ("ctrl", lambda: run("ctrl", spec=False)),
    ("spec", lambda: run("spec", spec=True)),
    ("spec_nodraft", lambda: run("spec_nodraft", spec=True, patches=[
        (spec_mod, "ngram_draft", _draft_last)])),
    ("spec_noattn", lambda: run("spec_noattn", spec=True, patches=[
        (slot_mod, "slot_window_attention", _win_zeros)])),
    ("spec_argmax", lambda: run("spec_argmax", spec=True, patches=[
        (eng_mod, "sample", _argmax_sample)])),
    ("spec_noscat", lambda: run("spec_noscat", spec=True, patches=[
        (kv_mod, "write_kv_flat", _noscat)])),
    ("spec_k1", lambda: run("spec_k1", spec=True, k=1)),
]:
    if which and label not in which:
        continue
    fn()
