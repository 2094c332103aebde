"""Decode-step decomposition microbenchmark (run on the TPU, solo).

Times everything *inside one jitted lax.scan* (as the engine runs it), so
per-dispatch tunnel latency (~4ms on the axon relay) doesn't confound the
numbers. Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepsearch_tts_tpu.engine.kvcache import init_kv_pages
from deepsearch_tts_tpu.engine.sampling import SamplingParams, sample, update_seen
from deepsearch_tts_tpu.engine.weights import fast_random_params
from deepsearch_tts_tpu.models.qwen3 import Qwen3Config, forward

B = int(os.environ.get("MB_BATCH", 32))
PS = int(os.environ.get("MB_PS", 64))
ATTN = os.environ.get("MB_ATTN", "pallas")
CTX = int(os.environ.get("MB_CTX", 192))
STEPS = int(os.environ.get("MB_STEPS", 32))
VOCAB = int(os.environ.get("MB_VOCAB", 32768))

HIDDEN = int(os.environ.get("MB_HIDDEN", 1024))
INTER = int(os.environ.get("MB_INTER", 3072))
cfg = Qwen3Config(vocab_size=VOCAB, hidden=HIDDEN, n_layers=28, n_heads=16,
                  n_kv_heads=8, head_dim=128, intermediate=INTER,
                  tie_embeddings=True)
P = 512 // PS

params = fast_random_params(cfg, seed=0)
k_pages, v_pages = init_kv_pages(cfg.n_layers, B * P + 1, PS, cfg.n_kv_heads,
                                 cfg.head_dim)
tables = np.zeros((B, P), np.int32)
pg = 1
for b in range(B):
    for i in range(P):
        tables[b, i] = pg
        pg += 1
tables = jnp.asarray(tables)
tok0 = jnp.ones((B,), jnp.int32)
sp = SamplingParams.make(B)


def timeit(name, fn, n=5, per=STEPS):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / n / per
    print(json.dumps({"what": name, "ms_per_step": round(dt * 1000, 3),
                      "toks_per_s": round(B / dt, 1)}), flush=True)


# 1) forward-only scan (greedy argmax feed, no sampler)
@jax.jit
def scan_forward(params, kp, vp):
    def step(carry, _):
        tok, lens, kp, vp = carry
        logits, (kp, vp) = forward(params, cfg, tok[:, None], lens[:, None],
                                   k_pages=kp, v_pages=vp, page_table=tables,
                                   seq_lens=lens + 1, impl=ATTN)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return (nxt, lens + 1, kp, vp), None
    lens0 = jnp.full((B,), CTX, jnp.int32)
    (tok, lens, kp, vp), _ = jax.lax.scan(step, (tok0, lens0, kp, vp),
                                          None, length=STEPS)
    return tok


timeit(f"scan_forward[{ATTN}] ctx={CTX} ps={PS} V={VOCAB}",
       lambda: scan_forward(params, k_pages, v_pages))

# 2) sampling-only scan
seen0 = jnp.zeros((B, cfg.vocab_size), bool)
logits0 = jax.random.normal(jax.random.PRNGKey(0), (B, cfg.vocab_size), jnp.float32)


@jax.jit
def scan_sample(logits, seen, key):
    def step(carry, k):
        seen, tok = carry
        nxt = sample(logits, sp, seen, k)
        seen = update_seen(seen, nxt)
        return (seen, nxt), None
    keys = jax.random.split(key, STEPS)
    (seen, tok), _ = jax.lax.scan(step, (seen, tok0), keys)
    return tok


timeit(f"scan_sampling V={VOCAB}",
       lambda: scan_sample(logits0, seen0, jax.random.PRNGKey(1)))

# 2b) sampler decomposition (MB_SAMPLE=1): which [B,V] pass dominates?
if os.environ.get("MB_SAMPLE", "0") == "1":
    from deepsearch_tts_tpu.engine.sampling import apply_repetition_penalty

    def scan_of(step_fn):
        @jax.jit
        def run(logits, seen, key):
            def step(carry, k):
                seen, tok = carry
                nxt = step_fn(logits, seen, k)
                seen = update_seen(seen, nxt)
                return (seen, nxt), None
            keys = jax.random.split(key, STEPS)
            (seen, tok), _ = jax.lax.scan(step, (seen, tok0), keys)
            return tok
        return lambda: run(logits0, seen0, jax.random.PRNGKey(1))

    def s_window(w):
        return lambda logits, seen, k: sample(logits, sp, seen, k, window=w)

    def s_no_penalty(logits, seen, k):
        sp0 = sp._replace(repetition_penalty=jnp.ones_like(sp.repetition_penalty))
        return sample(logits, sp0, seen, k)

    def s_argmax(logits, seen, k):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def s_elementwise_reduce(logits, seen, k):
        # penalty + temp scale + full-vocab exp-sum: the non-approx passes
        x = apply_repetition_penalty(logits, seen, sp.repetition_penalty)
        x = x / jnp.maximum(sp.temperature, 1e-6)[:, None]
        return jnp.sum(jnp.exp(x - jnp.max(x, axis=-1, keepdims=True)),
                       axis=-1).astype(jnp.int32) % VOCAB

    def s_approx_only(logits, seen, k):
        vals, idx = jax.lax.approx_max_k(logits, 128, recall_target=1.0)
        return idx[:, 0].astype(jnp.int32)

    def s_approx32(logits, seen, k):
        vals, idx = jax.lax.approx_max_k(logits, 32, recall_target=1.0)
        return idx[:, 0].astype(jnp.int32)

    for name, fn in (("full_w128", s_window(128)), ("full_w32", s_window(32)),
                     ("no_penalty", s_no_penalty), ("argmax", s_argmax),
                     ("elementwise_reduce", s_elementwise_reduce),
                     ("approx_only_k128", s_approx_only),
                     ("approx_only_k32", s_approx32)):
        timeit(f"sample[{name}] V={VOCAB}", scan_of(fn))

# 3) the engine's real decode chunk (forward + sample + seen)
@jax.jit
def scan_full(params, kp, vp, seen, key):
    def step(carry, k):
        tok, lens, kp, vp, seen = carry
        logits, (kp, vp) = forward(params, cfg, tok[:, None], lens[:, None],
                                   k_pages=kp, v_pages=vp, page_table=tables,
                                   seq_lens=lens + 1, impl=ATTN)
        nxt = sample(logits[:, 0], sp, seen, k)
        seen = update_seen(seen, nxt)
        return (nxt, lens + 1, kp, vp, seen), None
    lens0 = jnp.full((B,), CTX, jnp.int32)
    keys = jax.random.split(key, STEPS)
    (tok, *_), _ = jax.lax.scan(step, (tok0, lens0, kp, vp, seen), keys)
    return tok


timeit(f"scan_full[{ATTN}]",
       lambda: scan_full(params, k_pages, v_pages, seen0, jax.random.PRNGKey(2)))

# 4) KV-write scatter cost in isolation: L scatters per simulated step
from deepsearch_tts_tpu.engine.kvcache import write_kv_flat

kn = jnp.ones((B, 1, cfg.n_kv_heads, cfg.head_dim), jnp.bfloat16)
pos1 = jnp.full((B, 1), CTX, jnp.int32)


@jax.jit
def scan_scatter(kp, vp):
    kpf = kp.reshape((-1,) + kp.shape[2:])
    vpf = vp.reshape((-1,) + vp.shape[2:])

    def step(carry, _):
        kpf, vpf = carry
        def layer(l, c):
            kpf, vpf = c
            return write_kv_flat(kpf, vpf, kn, kn, pos1,
                                 tables + l * (B * P + 1))
        kpf, vpf = jax.lax.fori_loop(0, cfg.n_layers, layer, (kpf, vpf))
        return (kpf, vpf), None
    (kpf, vpf), _ = jax.lax.scan(step, (kpf, vpf), None, length=STEPS)
    return kpf[0, 0, 0, 0]


timeit("scan_kv_scatter_only", lambda: scan_scatter(k_pages, v_pages))

# 5) fused decode-layer path decomposition (the engine's default on TPU):
# full vs scatter-only vs no-attention ablations isolate the attention read
# and the KV scatter inside the real packed/fused chain.
if os.environ.get("MB_FUSED", "1") == "1":
    from deepsearch_tts_tpu.engine.weights import pack_matmul_params

    packed = pack_matmul_params(params)

    def make_scan(ablate):
        @jax.jit
        def scan_fused(params, kp, vp):
            def step(carry, _):
                tok, lens, kp, vp = carry
                logits, (kp, vp) = forward(
                    params, cfg, tok[:, None], lens[:, None],
                    k_pages=kp, v_pages=vp, page_table=tables,
                    seq_lens=lens + 1, impl="xla", fused_decode=True,
                    attn_ablate=ablate)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                return (nxt, lens + 1, kp, vp), None
            lens0 = jnp.full((B,), CTX, jnp.int32)
            (tok, lens, kp, vp), _ = jax.lax.scan(
                step, (tok0, lens0, kp, vp), None, length=STEPS)
            return tok
        return scan_fused

    for ablate in (None, "scatter_only", "skip"):
        fn = make_scan(ablate)
        timeit(f"scan_fused[{ablate or 'full'}] ctx={CTX} ps={PS}",
               lambda fn=fn: fn(packed, k_pages, v_pages))
