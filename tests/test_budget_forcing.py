"""Logit-level budget forcing (VERDICT r3 #4 / SURVEY §7 stage 7).

Two layers:

* policy layer — ``--budget_forcing logit`` passes ``min_tokens`` on the
  re-entry turn ONLY, and the message trace is byte-identical to text mode
  (reference trace semantics: scripts/deep_search.py:1928-1939).
* engine layer — an on-device A/B with a model whose argmax is always EOS:
  without forcing it stops after one token; with ``min_tokens=N`` the
  sampler suppresses EOS in-program until N tokens exist.
"""
import asyncio
from dataclasses import dataclass

import jax.numpy as jnp
import pytest

from deepsearch_tts_tpu.agents.client import ChatResponse, FakeClient
from deepsearch_tts_tpu.agents.policy import PolicyAgent


def _script():
    return [ChatResponse(type="normal", content=r"after more thought: \boxed{42}")]


def _prior_messages():
    return [
        {"role": "system", "content": "solver"},
        {"role": "user", "content": "Q?"},
        {"role": "assistant", "content": "I think it's 41. \\boxed{41}"},
    ]


def test_logit_budget_forcing_sets_min_tokens_on_reentry_only():
    async def run(mode):
        client = FakeClient(script=[
            ChatResponse(type="normal", content="hmm, not sure yet",
                         finish_reason="stop"),
            ChatResponse(type="normal", content=r"\boxed{42}"),
        ])
        agent = PolicyAgent(client, max_search_calls=3, budget_forcing=mode,
                            min_thinking_tokens=256)
        res = await agent.solve_budget_forcing(_prior_messages())
        return client.calls, res

    calls_text, res_text = asyncio.run(run("text"))
    calls_logit, res_logit = asyncio.run(run("logit"))

    # logit mode: min_tokens on the FIRST (re-entry) call only
    assert "min_tokens" not in calls_text[0]["opts"]
    assert calls_logit[0]["opts"]["min_tokens"] == 256
    assert "min_tokens" not in calls_logit[1]["opts"]

    # trace format unchanged: identical message sequences (nudge included)
    msgs_t = [(m["role"], m["content"]) for m in res_text.messages]
    msgs_l = [(m["role"], m["content"]) for m in res_logit.messages]
    assert msgs_t == msgs_l
    assert "additional" in res_logit.messages[3]["content"]  # the nudge
    assert res_logit.answer == "42"


def test_verify_budget_forcing_logit_min_tokens():
    async def run():
        client = FakeClient(script=[
            ChatResponse(type="normal", content=r"\boxed{0.5}")])
        agent = PolicyAgent(client, max_search_calls=2,
                            budget_forcing="logit", min_thinking_tokens=64)
        return client, await agent.verify_budget_forcing(_prior_messages())

    client, res = asyncio.run(run())
    assert client.calls[0]["opts"]["min_tokens"] == 64
    assert res.confidence == pytest.approx(0.5)


# --------------------------------------------------------------- engine A/B

@dataclass
class _EosCfg:
    """Minimal config for the eos-greedy fake family."""

    vocab_size: int = 300
    n_layers: int = 2
    n_kv_heads: int = 2
    head_dim: int = 8
    hidden: int = 16
    jnp_dtype = jnp.float32
    eos_id: int = 257          # ByteTokenizer's <|im_end|>
    second_best: int = 42


def _eos_forward(params, cfg, tokens, positions, *, k_pages=None,
                 v_pages=None, logits_indices=None, **kw):
    """Fake forward whose argmax is ALWAYS eos; second-best is token 42.

    KV pools pass through untouched; shapes follow the engine contract
    (prefill returns one logit row per sequence via logits_indices,
    decode returns [B, 1, V])."""
    B = tokens.shape[0]
    row = jnp.zeros((cfg.vocab_size,), jnp.float32)
    row = row.at[cfg.eos_id].set(10.0).at[cfg.second_best].set(5.0)
    logits = jnp.broadcast_to(row, (B, 1, cfg.vocab_size))
    return logits, (k_pages, v_pages)


@pytest.fixture(scope="module")
def eos_engine():
    from deepsearch_tts_tpu.engine.engine import Engine
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.models import registry

    cfg = _EosCfg()
    registry.register("eos-greedy-test", cfg, lambda c, k: {},
                      _eos_forward, lambda: {})
    eng = Engine("eos-greedy-test", ByteTokenizer(), params={},
                 max_slots=2, page_size=8, n_pages=32, max_seq_len=64,
                 decode_chunk_len=4, layer_fusion=False, pack_weights=False,
                 seed=0)
    yield eng
    eng.shutdown()


def test_engine_eos_suppression_on_device(eos_engine):
    from deepsearch_tts_tpu.engine.engine import GenerationRequest

    base = dict(prompt_ids=[1, 2, 3], max_tokens=16, temperature=0.0,
                repetition_penalty=1.0)
    free = eos_engine.generate(GenerationRequest(**base))
    forced = eos_engine.generate(GenerationRequest(**base, min_tokens=6))

    # unforced: EOS is argmax, generation stops immediately (terminating EOS
    # counts toward completion_tokens but is stripped from token_ids)
    assert free.completion_tokens == 1 and free.token_ids == []
    # forced: EOS suppressed in-program while generated-so-far < min_tokens
    # (vLLM semantics) — 6 forced non-EOS tokens, then EOS on the 7th
    assert forced.completion_tokens == 7
    assert forced.token_ids == [_EosCfg.second_best] * 6
    assert forced.finish_reason == "stop"


def test_cli_budget_forcing_flag_wires_min_tokens(tmp_path, monkeypatch):
    """--budget_forcing logit reaches PolicyAgent through the CLI."""
    from deepsearch_tts_tpu.cli.deep_search import build_parser

    args = build_parser().parse_args(
        ["--mode", "solve_budget_forcing", "--budget_forcing", "logit",
         "--min_thinking_tokens", "128", "--input_path", "x.json"])
    assert args.budget_forcing == "logit"
    assert args.min_thinking_tokens == 128
