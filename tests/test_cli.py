import json
import sys

from deepsearch_tts_tpu.cli.deep_search import build_parser


def test_reference_flag_surface():
    """Every public flag of the reference CLI parses (scripts/deep_search.py
    :3943-3980)."""
    p = build_parser()
    args = p.parse_args([
        "--mode", "solve",
        "--input_path", "x.json",
        "--output_dir", "./out",
        "--model_name", "qwen3-8b",
        "--aux_model_name", "qwen3-4b",
        "--max_search_calls", "15",
        "--concurrent_limit", "100",
        "--top_k", "10",
        "--top_k_sampling", "20",
        "--temperature", "0.7",
        "--top_p", "0.8",
        "--min_p", "0.05",
        "--repetition_penalty", "1.05",
        "--max_tokens", "16384",
        "--api_base_url", "http://localhost:8000",
        "--aux_api_base_url", "http://localhost:8000",
        "--api_key", "k",
        "--aux_api_key", "k",
        "--use_custom_api",
        "--custom_api_url", "http://x",
        "--use_aihubmix",
        "--aihubmix_api_url", "http://y",
        "--aihubmix_api_keys", "a,b",
        "--bing_subscription_key", "s",
        "--use_bing_pro", "--bing_pro_token", "t",
        "--use_google_pro", "--google_pro_api_key", "g",
        "--price_config_path", "p.json",
        "--query", "q", "--pred_answer", "a", "--context", "c",
    ])
    assert args.mode == "solve" and args.concurrent_limit == 100


def test_all_modes_accepted():
    p = build_parser()
    for mode in ("search", "solve", "verify", "solve_budget_forcing",
                 "verify_budget_forcing", "solve_bestofn"):
        assert p.parse_args(["--mode", mode]).mode == mode


def test_cli_fake_run_trace_schema(tmp_path):
    """Full CLI invocation with fake backend writes reference-schema traces."""
    import deepsearch_tts_tpu.cli.deep_search as ds

    data = [{"Question": "q1", "answer": "a1"}, {"problem": "q2", "answer": "a2"}]
    inp = tmp_path / "in.json"
    inp.write_text(json.dumps(data))
    ds.main([
        "--mode", "solve", "--backend", "fake", "--search_backend", "replay",
        "--input_path", str(inp), "--output_dir", str(tmp_path),
        "--concurrent_limit", "2",
    ])
    results = sorted(tmp_path.glob("policy_results_*.json"))
    assert results
    rows = json.loads(results[-1].read_text())
    assert len(rows) == 2
    assert {"pred_answer", "messages", "web_search"} <= set(rows[0])
    stats = sorted(tmp_path.glob("statistics_*.json"))
    assert stats
    s = json.loads(stats[-1].read_text())
    assert "api_counters" in s and "token_usage" in s and "cost" in s


def test_cli_verify_mode(tmp_path):
    """verify mode over a prior run's rows: confidence_score in the trace."""
    import deepsearch_tts_tpu.cli.deep_search as ds

    prior = [{"Question": "q1", "pred_answer": "a1"}]
    inp = tmp_path / "prior.json"
    inp.write_text(json.dumps(prior))
    ds.main([
        "--mode", "verify", "--backend", "fake", "--search_backend", "replay",
        "--input_path", str(inp), "--output_dir", str(tmp_path),
    ])
    rows = json.loads(sorted(tmp_path.glob("verifier_results_*.json"))[-1].read_text())
    assert "confidence_score" in rows[0]
    assert "verification_searches" in rows[0]


def test_cli_budget_forcing_mode(tmp_path):
    """solve_budget_forcing resumes prior message histories (reference
    README.md:47 flow)."""
    import deepsearch_tts_tpu.cli.deep_search as ds

    prior = [{
        "Question": "q1",
        "messages": [
            {"role": "system", "content": "s"},
            {"role": "user", "content": "q1"},
            {"role": "assistant", "content": "got stuck"},
        ],
    }]
    inp = tmp_path / "prior.json"
    inp.write_text(json.dumps(prior))
    ds.main([
        "--mode", "solve_budget_forcing", "--backend", "fake",
        "--search_backend", "replay",
        "--input_path", str(inp), "--output_dir", str(tmp_path),
    ])
    rows = json.loads(sorted(tmp_path.glob("policy_results_*.json"))[-1].read_text())
    msgs = rows[0]["messages"]
    assert any("additional search" in (m.get("content") or "")
               for m in msgs if m["role"] == "user")
    assert rows[0]["pred_answer"]


def test_cli_search_mode(capsys):
    """single-query search mode prints the search_with_intent dict."""
    import deepsearch_tts_tpu.cli.deep_search as ds

    ds.main(["--mode", "search", "--backend", "fake",
             "--search_backend", "replay", "--query", "anything"])
    out = capsys.readouterr().out
    data = json.loads(out[out.index("{"):])
    assert set(data) >= {"extracted_info", "search_query", "search_intent"}
