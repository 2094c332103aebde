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


def test_search_o1_family_contracts():
    """Six task-family search-o1 headers (reference: prompts.py:169-345):
    tokens, budget sentence, example exchange."""
    fns = (P.get_singleqa_search_o1_instruction,
           P.get_multiqa_search_o1_instruction,
           P.get_gpqa_search_o1_instruction,
           P.get_math_search_o1_instruction,
           P.get_code_search_o1_instruction,
           P.get_timeline_search_o1_instruction)
    for fn in fns:
        s = fn(9)
        assert P.BEGIN_SEARCH_QUERY in s and P.END_SEARCH_QUERY in s
        assert P.BEGIN_SEARCH_RESULT in s and P.END_SEARCH_RESULT in s
        assert "Example:" in s
        if fn is not P.get_timeline_search_o1_instruction:
            assert "limited to 9" in s
    # multiqa demonstrates two chained searches; timeline pushes for many
    assert P.get_multiqa_search_o1_instruction(9).count(P.BEGIN_SEARCH_QUERY) >= 3
    assert "as many searches as possible" in P.get_timeline_search_o1_instruction(9)


def test_task_instruction_multi_choice_model_formats():
    """Per-model answer formats (reference: prompts.py:563-585)."""
    s = P.get_task_instruction_multi_choice("Pick one", model_name="qwq")
    assert "\\boxed{YOUR_CHOICE}" in s and "Pick one" in s
    assert "step by step" not in s
    d = P.get_task_instruction_multi_choice("Pick one", model_name="dpsk")
    assert "**ANSWER: {YOUR_CHOICE}**" in d
    ll = P.get_task_instruction_multi_choice("Pick one", model_name="llama")
    assert "A, B, C, or D" in ll
    default = P.get_task_instruction_multi_choice("Pick one")
    assert "step by step" in default and "\\boxed{YOUR_CHOICE}" in default


def test_web_verifier_inband_versions():
    """In-band verifier ablation set (reference: prompts.py:356-525)."""
    fns = (P.get_web_verifier_instruction, P.get_web_verifier_instructionv1,
           P.get_web_verifier_instructionv2, P.get_web_verifier_instructionv3,
           P.get_web_verifier_instructionv4)
    for fn in fns:
        s = fn("Q text?", "A text!")
        assert P.BEGIN_SEARCH_QUERY in s and P.BEGIN_SEARCH_RESULT in s
        assert "Q text?" in s and "A text!" in s
        assert "\\boxed{" in s and "confidence" in s.lower()
    # v2-v4 use the condition-fraction rubric; v4 demands explicit evidence
    for fn in fns[2:]:
        assert "total conditions" in fn("q", "a")
    assert "evidence" in P.get_web_verifier_instructionv4("q", "a")


def test_report_webthinker_and_helpers():
    """Report-mode in-band tokens + stop phrase + helper contracts
    (reference: prompts_report.py:2-224)."""
    s = RP.get_report_webthinker_instruction("topic", "(1) step")
    for tok in (RP.BEGIN_WRITE_SECTION, RP.END_WRITE_SECTION,
                RP.BEGIN_CHECK_ARTICLE, RP.END_CHECK_ARTICLE,
                RP.BEGIN_EDIT_ARTICLE, RP.END_EDIT_ARTICLE):
        assert tok in s
    assert RP.REPORT_DONE_PHRASE in s and "topic" in s and "(1) step" in s

    plan = RP.get_search_plan_instruction("why is the sky blue")
    assert "(1)" in plan and "8 steps" in plan
    assert "do not include any other words" in plan

    summ = RP.get_section_summary_instruction("SECTION TEXT")
    assert "SECTION TEXT" in summ and "concise" in summ

    edit = RP.get_edit_article_instruction("fix intro", "ARTICLE BODY")
    assert "fix intro" in edit and "ARTICLE BODY" in edit
    assert "```markdown" in edit and "entire" in edit


def test_math_example_banks_match_reference_shot_counts():
    """Bank breadth parity (reference: qwen_math_eval_toolkit/examples.py)."""
    from deepsearch_tts_tpu.evaluate.math_examples import (
        build_few_shot_prompt,
        get_examples,
    )

    ex = get_examples()
    expected = {"gsm8k": 8, "gsm8k-pal": 3, "gsm8k-tora": 3, "math": 5,
                "math_pal": 4, "math-tora": 5, "carp_en": 8,
                "minerva_math": 4, "aqua": 4, "sat_math": 4,
                "mmlu_mathematics": 5, "mmlu_physics": 5,
                "mmlu_chemistry": 5, "mmlu_biology": 5, "mmlu_computer": 5,
                "mmlu_stem": 5, "gaokao": 5}
    for k, n in expected.items():
        assert len(ex[k]) == n, k
        for q, sol in ex[k]:
            assert isinstance(q, str) and isinstance(sol, str) and sol
    # CoT banks end in boxed answers; PAL banks end in code
    for k in ("gsm8k", "math", "carp_en", "minerva_math", "aqua",
              "sat_math", "gaokao"):
        for _, sol in ex[k]:
            assert "\\boxed{" in sol, k
    for _, sol in ex["gsm8k-pal"] + ex["math_pal"]:
        assert "```python" in sol and "\\boxed" not in sol
    for _, sol in ex["gsm8k-tora"] + ex["math-tora"]:
        assert "```output" in sol and "\\boxed{" in sol

    p = build_few_shot_prompt("NEW Q", benchmark="gsm8k")
    assert p.count("Question:") == 9 and p.rstrip().endswith("Solution:")


def test_reference_report_prompt_names_resolve():
    """Every get_* in the reference's prompts_report.py imports under its
    exact name (reference: scripts/prompts/prompts_report.py) — name-level
    drop-in parity (VERDICT r3 weak #6)."""
    from deepsearch_tts_tpu.prompts import qa, reports

    report_side = [
        "get_report_webthinker_instruction", "get_search_plan_instruction",
        "get_write_section_instruction", "get_section_summary_instruction",
        "get_edit_article_instruction", "get_edit_section_instruction",
        "get_title_instruction", "get_final_report_instruction",
        "get_standard_rag_report_instruction",
        "get_direct_gen_report_instruction",
    ]
    qa_side = [
        "get_deep_web_explorer_instruction",
        "get_click_web_page_reader_instruction",
        "get_search_intent_instruction", "get_click_intent_instruction",
    ]
    for name in report_side:
        assert callable(getattr(reports, name)), name
    for name in qa_side:
        assert callable(getattr(qa, name)), name

    # signature-level checks on the renamed-then-aliased five
    ws = reports.get_write_section_instruction(
        "Q", "thoughts", "docs", "Intro", "goal", "article so far")
    assert "Intro" in ws and "docs" in ws and "Q" in ws
    es = reports.get_edit_section_instruction("fix the dates", "# A\nbody")
    assert "fix the dates" in es and "# A\nbody" in es
    # contract: two markdown blocks (original section + modified section)
    assert es.count("```markdown") == 2
    assert reports.get_title_instruction("Q", "R") == \
        reports.get_report_title_instruction("Q", "R")
    assert reports.get_standard_rag_report_instruction("Q", "D") == \
        reports.get_rag_report_instruction("Q", "D")
    assert reports.get_direct_gen_report_instruction("Q") == \
        reports.get_direct_report_instruction("Q")
