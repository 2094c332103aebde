"""Quantify the host-side decode merge cost (CPU — no chip needed).

The sustained-mode per-chunk anatomy at B=96 (ROUND4.md) leaves a ~50ms
residual attributed to "host merge". `_process_decode` past the sync is
pure host Python/numpy, so its cost is identical whether the device is
the axon TPU or local CPU — measure it here with a tiny model and the
production slot/chunk shape, via the `decode_merge` span added in
32ade83.

Closed-loop sustained serving (every completion resubmits a fresh
prompt) at PROBE_BATCH slots x chunk 32 so completion handling
(detok + futures + refill) lands in the measurement like it does on
the chip.

Usage: JAX_PLATFORMS=cpu python scripts/probe_merge.py
"""
import os
import queue as _q
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

B = int(os.environ.get("PROBE_BATCH", 96))
PROMPT = int(os.environ.get("PROBE_PROMPT", 32))
DECODE = int(os.environ.get("PROBE_DECODE", 64))
CHUNK = int(os.environ.get("PROBE_CHUNK", 32))
TOTAL = int(os.environ.get("PROBE_TOTAL", 4 * B))

from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer

rng = np.random.default_rng(0)
SAMP = dict(temperature=0.7, top_k=20, top_p=0.8, min_p=0.05,
            repetition_penalty=1.05)


def main():
    eng = Engine(
        "qwen3-test", ByteTokenizer(), max_slots=B, page_size=8,
        n_pages=B * 32, max_seq_len=PROMPT + DECODE + CHUNK,
        decode_chunk_len=CHUNK, seed=0,
    )
    doneq: _q.Queue = _q.Queue()
    submitted = 0

    def stag(i):
        return DECODE // 2 + (i * 37) % (DECODE // 2)

    def submit(i):
        nonlocal submitted
        ids = rng.integers(0, 200, size=PROMPT).tolist()
        r = GenerationRequest(prompt_ids=ids, max_tokens=stag(i), **SAMP)
        eng.submit(r).add_done_callback(doneq.put)
        submitted += 1

    for i in range(B):
        submit(i)
    def snap_spans():
        # the engine thread mutates totals concurrently — copy under the
        # SpanTimer lock so iteration can't race a new key insertion
        with eng.spans._lock:
            return {k: (eng.spans.totals[k], eng.spans.counts[k])
                    for k in eng.spans.totals}

    done = 0
    warm_spans = None
    while done < TOTAL:
        doneq.get(timeout=600)
        done += 1
        if done == B:          # end of ramp: snapshot spans
            warm_spans = snap_spans()
        if submitted < TOTAL:
            submit(submitted)
    eng.shutdown()
    final = snap_spans()
    spans = {k: (tot - (warm_spans.get(k, (0, 0))[0] if warm_spans else 0),
                 cnt - (warm_spans.get(k, (0, 0))[1] if warm_spans else 0))
             for k, (tot, cnt) in final.items()}
    print(f"B={B} chunk={CHUNK} window completions={TOTAL - B}")
    for k in sorted(spans):
        tot, cnt = spans[k]
        if cnt:
            print(f"  {k:18s} total {tot*1e3:9.1f}ms  n={cnt:5d}  "
                  f"per-call {tot/cnt*1e3:7.2f}ms")


if __name__ == "__main__":
    main()
