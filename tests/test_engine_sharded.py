"""Multi-chip serving: the engine under a TP mesh must match single-device
greedy output exactly (page sharing, sampling, everything end-to-end)."""
import jax
import pytest

from deepsearch_tts_tpu.engine.engine import Engine, GenerationRequest
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, init_params


def _req(prompt, n=8):
    return GenerationRequest(prompt_ids=prompt, max_tokens=n, temperature=0.0,
                             repetition_penalty=1.0)


def test_sharded_engine_matches_unsharded(mesh8):
    cfg = QWEN3_CONFIGS["qwen3-test"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    tk = ByteTokenizer()
    prompt = list(range(40, 60))

    ref_eng = Engine("qwen3-test", tk, params=params, max_slots=2, page_size=4,
                     n_pages=64, max_seq_len=128, decode_chunk_len=4)
    ref = ref_eng.generate(_req(prompt))
    ref_eng.shutdown()

    # tp=2 submesh over the kv heads (qwen3-test has 2 kv heads)
    from deepsearch_tts_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    sh_eng = Engine("qwen3-test", tk, params=params, mesh=mesh, max_slots=2,
                    page_size=4, n_pages=64, max_seq_len=128,
                    decode_chunk_len=4)
    out = sh_eng.generate(_req(prompt))
    sh_eng.shutdown()

    assert out.token_ids == ref.token_ids
    assert out.finish_reason == ref.finish_reason


def test_slot_cache_mode_matches_paged():
    """Contiguous-slot cache (slice attention, no gather) must reproduce the
    paged engine's greedy outputs."""
    cfg = QWEN3_CONFIGS["qwen3-test"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    tk = ByteTokenizer()
    prompts = [list(range(10, 30)), list(range(50, 75))]

    paged = Engine("qwen3-test", tk, params=params, max_slots=2, page_size=4,
                   n_pages=128, max_seq_len=128, decode_chunk_len=4)
    ref = [paged.generate(_req(p)) for p in prompts]
    paged.shutdown()

    slot = Engine("qwen3-test", tk, params=params, max_slots=2,
                  max_seq_len=128, decode_chunk_len=4, cache_mode="slot")
    out = [slot.generate(_req(p)) for p in prompts]
    slot.shutdown()

    for r, o in zip(ref, out):
        assert o.token_ids == r.token_ids
        assert o.finish_reason == r.finish_reason
