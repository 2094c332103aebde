from deepsearch_tts_tpu.prompts import qa as P
from deepsearch_tts_tpu.prompts import reports as RP


def test_solver_prompt_contract():
    s = P.get_solver_system_prompt(15)
    assert "deep_websearch" in s and "15" in s and r"\boxed{" in s


def test_verifier_prompt_versions():
    for v in range(6):
        s = P.get_verifier_system_prompt(10, version=v)
        assert "deep_websearch" in s
        assert "confidence" in s.lower()
        assert r"\boxed" in s


def test_verify_user_message_markers():
    m = P.get_verify_user_message("Q?", "A!")
    assert "[Question Start]" in m and "[Predicted Answer Start]" in m


def test_tool_schema_fields():
    fn = P.DEEP_WEBSEARCH_TOOL["function"]
    assert fn["name"] == "deep_websearch"
    assert set(fn["parameters"]["required"]) == {"search_query", "search_intent"}


def test_explorer_instruction_tokens():
    s = P.get_deep_web_explorer_instruction("q", "i", "results")
    assert P.BEGIN_SEARCH_QUERY in s and P.BEGIN_CLICK_LINK in s
    assert "**Final Information**" in s


def test_budget_forcing_nudges():
    assert "additional search" in P.get_budget_forcing_nudge(5, "solve")
    v = P.get_budget_forcing_nudge(5, "verify")
    assert "confidence" in v


def test_task_instructions():
    for fn in (P.get_task_instruction_openqa, P.get_task_instruction_multi_hop,
               P.get_task_instruction_math, P.get_task_instruction_choose,
               P.get_task_instruction_code):
        s = fn("the question", 7)
        assert "the question" in s and P.BEGIN_SEARCH_QUERY in s


def test_report_prompts():
    assert "JSON" in RP.get_report_plan_instruction("q")
    s = RP.get_section_write_instruction("q", "{}", "Sec", "goal", "ev", "sofar")
    assert "## Sec" in s
    j = RP.get_report_evaluation_instruction("q", {"A": "ra", "B": "rb"})
    assert "[System A Report Start]" in j and "coherence" in j


def test_prompt_variant_breadth_contracts():
    """Ablation-parity prompt variants (reference prompts.py:2-28, 68-126,
    141-158, 235-274, 347-355) preserve their load-bearing contracts."""
    from deepsearch_tts_tpu.prompts import qa as P

    g = P.get_gpqa_web_thinker_instruction(15)
    assert P.BEGIN_SEARCH_QUERY in g and P.END_SEARCH_QUERY in g

    e = P.get_deep_web_explorer_instruction_qwen("goal", "pages")
    assert "**Final Information**" in e and P.BEGIN_CLICK_LINK in e
    assert "goal" in e and "pages" in e

    d = P.get_detailed_web_page_reader_instruction("q", "intent", "doc")
    assert "No relevant information" in d and "intent" in d

    import json, re
    plan = P.get_query_plan_instruction("why?")
    m = re.search(r"```json\n(.*?)```", plan, re.DOTALL)
    schema = m.group(1).replace('"sub-query-1",', '"a",').replace(
        '"sub-query-2",', '"b"').replace("...", "").strip()
    assert json.loads(schema)["query_plan"] == ["a", "b"]

    rc = P.get_webpage_to_reasonchain_instruction("prev", "q", "doc")
    assert "**Final Information**" in rc
    assert "No helpful information found." in rc

    rag = P.get_naive_rag_instruction("q?", "docs")
    assert "q?" in rag and "docs" in rag
