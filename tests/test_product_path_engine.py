"""Product path end-to-end on the ENGINE (VERDICT r3 missing #1).

Drives ``cli/deep_search.py --mode solve --backend engine`` hermetically
through the FULL loop the reference runs against its providers
(reference: scripts/deep_search.py:1723-1887): ChatML prompt → engine
decode → ``<tool_call>`` parse → websearch (replay backend) → explorer on a
co-served aux engine → tool-result re-entry with prefix reuse → boxed
answer → trace JSON.

Mechanism: both engines serve a *position-scripted* model — greedy decode
at absolute position ``p`` emits ``script[p+1]`` — so any planned
generation can be pinned. The scripts are computed from a dry run of the
same agent/search stack with recording clients: each recorded (prompt →
planned reply) pair writes the reply's token ids at the prompt's encoded
length. The engine run then reproduces the dry run's conversation exactly
IF (and only if) the whole stack — chat templating, tool-call parsing,
engine decode, stop handling, prefix-cached re-entry — is correct.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import pytest

from deepsearch_tts_tpu.agents.client import ChatResponse, CompletionResponse
from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer, parse_tool_calls

TOK = ByteTokenizer()
SCRIPT_LEN = 6144


def _tool_call(query: str, intent: str) -> str:
    body = json.dumps({"name": "deep_websearch",
                       "arguments": {"search_query": query,
                                     "search_intent": intent}},
                      ensure_ascii=False)
    # leading newline matches ChatTemplate's re-render of an assistant
    # tool-call turn, so turn N+1's prompt is a byte-exact extension of
    # turn N's prompt + generation (what the prefix cache needs)
    return "\n<tool_call>\n" + body + "\n</tool_call>"


C1 = _tool_call("capital of France", "find the capital city of France")
C2 = _tool_call("Paris population", "find the population of Paris")
C3 = "I found it. The capital of France is \\boxed{Paris}."
E1 = "**Final Information**\nParis is the capital of France."
E2 = "**Final Information**\nAbout 2.1 million people live in Paris proper."
QUESTION = "What is the capital of France? Answer with the city name."


class RecordingClient:
    """Plays planned replies in order; records (prompt, reply) pairs."""

    def __init__(self, chat_replies=(), complete_replies=()):
        self.chat_replies = list(chat_replies)
        self.complete_replies = list(complete_replies)
        self.chat_calls: list[tuple[list, list, str]] = []
        self.complete_calls: list[tuple[str, str]] = []

    async def chat(self, messages, tools=None, **opts):
        out = self.chat_replies.pop(0)
        self.chat_calls.append((json.loads(json.dumps(messages)),
                                list(tools or []), out))
        content, calls = parse_tool_calls(out)
        return ChatResponse(type="tool" if calls else "normal",
                            content=content, tool_calls=calls,
                            finish_reason="stop")

    async def complete(self, prompt, **opts):
        out = self.complete_replies.pop(0)
        self.complete_calls.append((prompt, out))
        return CompletionResponse(out, "stop")


def _write_replay(path: str) -> None:
    store = {
        "searches": {
            "capital of France": [
                {"id": 1, "title": "France - Factbook",
                 "url": "https://example.org/france",
                 "site_name": "example.org", "date": "2024-01-01",
                 "snippet": "Paris is the capital and largest city of France."},
                {"id": 2, "title": "Geography of France",
                 "url": "https://example.org/geo",
                 "site_name": "example.org", "date": "2024-01-02",
                 "snippet": "France's capital city is Paris, on the Seine."},
            ],
            "Paris population": [
                {"id": 1, "title": "Paris demographics",
                 "url": "https://example.org/paris-pop",
                 "site_name": "example.org", "date": "2024-02-01",
                 "snippet": "The city of Paris has about 2.1 million "
                            "residents within its administrative limits."},
            ],
        },
        "pages": {
            "https://example.org/france":
                "France is a country in Western Europe. Paris is the capital "
                "and largest city of France. It is known for the Eiffel "
                "Tower and the Louvre.",
            "https://example.org/geo":
                "Geography of France. France's capital city is Paris, on the "
                "Seine. The country borders Belgium, Germany, and Spain.",
            "https://example.org/paris-pop":
                "Paris demographics. The city of Paris has about 2.1 million "
                "residents within its administrative limits. The wider "
                "metropolitan area holds over 12 million people.",
        },
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(store, f)


def _gen_opts(args):
    return {"temperature": args.temperature, "top_p": args.top_p,
            "min_p": args.min_p, "top_k_sampling": args.top_k_sampling,
            "repetition_penalty": args.repetition_penalty,
            "max_tokens": min(args.max_tokens, 16384)}


def _dry_run(args):
    """Run the real agent/search stack with recording clients to learn the
    exact prompts the engine run will see."""
    import asyncio

    from deepsearch_tts_tpu.agents.policy import PolicyAgent
    from deepsearch_tts_tpu.agents.websearch import WebSearchTool
    from deepsearch_tts_tpu.cli.deep_search import make_search

    backend, fetcher = make_search(args)
    main = RecordingClient(chat_replies=[C1, C2, C3])
    aux = RecordingClient(complete_replies=[E1, E2])
    tool = WebSearchTool(backend, fetcher, aux, top_k=args.top_k,
                         gen_opts=_gen_opts(args))
    agent = PolicyAgent(main, search_tool=tool,
                        max_search_calls=args.max_search_calls,
                        gen_opts=_gen_opts(args))
    res = asyncio.run(agent.solve(QUESTION))
    assert res.answer == "Paris", res
    assert not main.chat_replies and not aux.complete_replies
    return main, aux


def _build_script(segments) -> jnp.ndarray:
    """Position-indexed token script from (prompt_text, reply_text) pairs.

    Writes reply ids (+ EOS) at the prompt's encoded length; overlapping
    writes must agree or the planned conversations are ambiguous."""
    import numpy as np

    script = np.full((SCRIPT_LEN,), ord("x"), np.int32)
    written: dict[int, int] = {}
    for prompt_text, reply_text in segments:
        p = len(TOK.encode(prompt_text))
        ids = TOK.encode(reply_text) + [TOK.eos_id]
        assert p + len(ids) < SCRIPT_LEN, "raise SCRIPT_LEN"
        for off, t in enumerate(ids):
            pos = p + off
            assert written.get(pos, t) == t, (
                f"script conflict at position {pos}: planned generations "
                "overlap — pad a prompt/fixture to separate them")
            written[pos] = t
            script[pos] = t
    return jnp.asarray(script)


@pytest.fixture()
def scripted_families(tmp_path):
    """Register script-main / script-aux model families whose greedy decode
    replays the planned conversation, computed via the dry run."""
    from deepsearch_tts_tpu.cli.deep_search import build_parser
    from deepsearch_tts_tpu.models import registry

    replay = tmp_path / "replay.json"
    _write_replay(str(replay))
    argv = ["--mode", "solve", "--backend", "engine",
            "--search_backend", "replay", "--replay_path", str(replay),
            "--input_path", str(tmp_path / "problems.json"),
            "--output_dir", str(tmp_path / "out"),
            "--model_name", "script-main", "--aux_model_name", "script-aux",
            "--engine_max_slots", "4", "--engine_page_size", "16",
            "--engine_pages", "1025", "--engine_max_seq_len", "4096",
            "--engine_prefill_lane", "0",
            "--temperature", "0.0", "--max_tokens", "512",
            "--max_search_calls", "5",
            "--price_config_path",
            os.path.join(os.path.dirname(__file__), "..", "model_config",
                         "aihubmix_price.json")]
    args = build_parser().parse_args(argv)
    main_rec, aux_rec = _dry_run(args)

    main_script = _build_script(
        (TOK.apply_chat_template(msgs, tools, add_generation_prompt=True), out)
        for msgs, tools, out in main_rec.chat_calls)
    aux_script = _build_script(aux_rec.complete_calls)

    class _ScriptCfg:
        vocab_size = TOK.vocab_size
        n_layers = 1
        n_kv_heads = 1
        head_dim = 8
        jnp_dtype = jnp.float32
        custom_init = True   # load_or_init_params uses fam.init_params

    def make_forward():
        def forward(params, cfg, tokens, positions, *, k_pages=None,
                    v_pages=None, logits_indices=None, **kw):
            script = params["script"]
            pos = positions
            if logits_indices is not None:
                pos = jnp.take_along_axis(positions, logits_indices[:, None],
                                          axis=1)
            nxt = script[jnp.clip(pos + 1, 0, script.shape[0] - 1)]
            logits = 30.0 * jax.nn.one_hot(nxt, cfg.vocab_size,
                                           dtype=jnp.float32)
            return logits, (k_pages, v_pages)
        return forward

    for name, script in (("script-main", main_script),
                         ("script-aux", aux_script)):
        registry.register(
            name, _ScriptCfg(),
            lambda cfg, key, s=script: {"script": s},
            make_forward(), lambda: {})
    return args, main_rec, aux_rec


def test_deep_search_solve_on_engine(scripted_families, tmp_path):
    from deepsearch_tts_tpu.cli import deep_search as ds

    args, main_rec, aux_rec = scripted_families
    (tmp_path / "problems.json").write_text(
        json.dumps([{"Question": QUESTION}]))

    ds.main(["--mode", "solve", "--backend", "engine",
             "--search_backend", "replay",
             "--replay_path", str(tmp_path / "replay.json"),
             "--input_path", str(tmp_path / "problems.json"),
             "--output_dir", str(tmp_path / "out"),
             "--model_name", "script-main", "--aux_model_name", "script-aux",
             "--engine_max_slots", "4", "--engine_page_size", "16",
             "--engine_pages", "1025", "--engine_max_seq_len", "4096",
             "--engine_prefill_lane", "0",
             "--temperature", "0.0", "--max_tokens", "512",
             "--max_search_calls", "5",
             "--price_config_path",
             os.path.join(os.path.dirname(__file__), "..", "model_config",
                          "aihubmix_price.json")])

    out = tmp_path / "out"
    rows = json.loads(sorted(out.glob("policy_results_*.json"))[-1].read_text())
    assert len(rows) == 1
    row = rows[0]
    # trace schema (reference fields, scripts/deep_search.py:2651-2653)
    assert row["pred_answer"] == "Paris"
    assert len(row["web_search"]) == 2
    assert row["web_search"][0]["search_query"] == "capital of France"
    assert "capital of France" in row["web_search"][0]["extracted_info"]
    assert row["web_search"][1]["search_query"] == "Paris population"
    roles = [m["role"] for m in row["messages"]]
    # system, user, assistant(tool), tool, assistant(tool), tool, assistant
    assert roles == ["system", "user", "assistant", "tool", "assistant",
                     "tool", "assistant"]
    assert "\\boxed{Paris}" in row["messages"][-1]["content"]

    stats = json.loads(sorted(out.glob("statistics_*.json"))[-1].read_text())
    eng = stats["engine"]
    assert eng["requests"] == 3                       # three policy turns
    # multi-turn re-entry reused cached prefix pages (SURVEY §7 hard part b)
    assert eng["prefix_cache"]["hits"] >= 1
    assert eng["prefix_cache"]["tokens_reused"] > 0
