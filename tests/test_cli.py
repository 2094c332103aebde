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
