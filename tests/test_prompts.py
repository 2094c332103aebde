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
