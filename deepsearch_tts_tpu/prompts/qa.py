"""Prompt library (QA / search / verification).

Fresh prose, reference-compatible *contracts* (reference:
scripts/prompts/prompts.py — 27 ``get_*`` functions; scripts/deep_search.py
:4044-4050 solver, :4143-4167 verifier set). The load-bearing interface
elements are preserved exactly:

* in-band control tokens ``<|begin_search_query|>`` / ``<|end_search_query|>``
  and ``<|begin_click_link|>`` / ``<|end_click_link|>``
* the ``**Final Information**`` marker the answer extractor keys on
* ``\\boxed{...}`` final-answer / confidence-score formats
* verifier confidence = verified conditions / total conditions
"""
from __future__ import annotations

BEGIN_SEARCH_QUERY = "<|begin_search_query|>"
END_SEARCH_QUERY = "<|end_search_query|>"
BEGIN_SEARCH_RESULT = "<|begin_search_result|>"
END_SEARCH_RESULT = "<|end_search_result|>"
BEGIN_CLICK_LINK = "<|begin_click_link|>"
END_CLICK_LINK = "<|end_click_link|>"
BEGIN_CLICK_RESULT = "<|begin_click_result|>"
END_CLICK_RESULT = "<|end_click_result|>"

DEEP_WEBSEARCH_TOOL = {
    "type": "function",
    "function": {
        "name": "deep_websearch",
        "description": (
            "A web explorer that searches the web, opens the result pages, and "
            "extracts factual information relevant to a search query and the "
            "intent behind it."
        ),
        "parameters": {
            "type": "object",
            "required": ["search_query", "search_intent"],
            "properties": {
                "search_query": {
                    "type": "string",
                    "description": (
                        "Query to submit to a standard web search engine; keep "
                        "it in normal search-engine style."
                    ),
                },
                "search_intent": {
                    "type": "string",
                    "description": (
                        "What you are actually trying to find out with this "
                        "search, so the explorer can judge relevance."
                    ),
                },
            },
        },
    },
}


def get_solver_system_prompt(max_search_calls: int) -> str:
    return f"""You are a reasoning assistant with access to web search for solving problems. Call the "deep_websearch" tool whenever you need facts or evidence you are not certain about. You may call it repeatedly, but no more than **{max_search_calls} times** in total.

When you are done, state your final answer inside a boxed environment:

\\[
\\boxed{{<your final answer>}}
\\]"""


def get_verifier_system_prompt(max_search_calls: int, version: int = 0) -> str:
    """Asymmetric-verification prompts. version 0 is the default used in runs;
    1..5 keep the historical variants' semantics for ablations."""
    base_tool = (
        f'Use the "deep_websearch" tool to gather supporting evidence; you may '
        f"call it up to {max_search_calls} times."
    )
    if version in (0, 5):
        return f"""You are a reasoning assistant whose only job is to fact-check a predicted answer to a user's question — do not answer the question yourself. {base_tool}

Work through these steps:

1. Read the question and list every condition a correct answer must satisfy (conditions come from the question, not from the predicted answer).
2. For each condition, use deep_websearch to find evidence and decide whether the predicted answer satisfies it. A condition counts as verified only when (i) search results explicitly support it and (ii) those results confirm the predicted answer meets it.
3. Compute a confidence score = (conditions both verified via deep_websearch and satisfied) / (total conditions).

Report the score as a float in:

\\[
\\boxed{{\\text{{<confidence_score>}}}}
\\]"""
    if version == 1:
        return f"""You are a reasoning assistant that fact-checks a predicted answer to a user's question using web search. {base_tool}

Steps: list all conditions the predicted answer must satisfy; verify each one; then report confidence = satisfied conditions / total conditions as a float between 0 and 1 in:

\\[
\\boxed{{<confidence_score>}}
\\]"""
    if version == 2:
        return f"""You are a reasoning assistant that fact-checks a predicted answer using web search. {base_tool}

List the conditions the answer must satisfy, verify each via deep_websearch, and report confidence = verified conditions / total conditions. If the predicted answer does not actually answer the question, report 0.

\\[
\\boxed{{\\text{{<confidence_score>}}}}
\\]"""
    if version == 3:
        return f"""You are a reasoning assistant verifying whether a predicted answer is the true answer to a question, using web search. {base_tool}

Your confidence score is the fraction of the question's conditions you verified through deep_websearch. A predicted answer that gives no clear answer scores 0. Report it as a float:

\\[
\\boxed{{\\text{{<confidence_score>}}}}
\\]"""
    # version 4
    return f"""You are a reasoning assistant that fact-checks a predicted answer with web search. {base_tool}

List all conditions, gather evidence for each with deep_websearch, and report confidence = (conditions verified through search) / (total conditions) as a float:

\\[
\\boxed{{\\text{{<confidence_score>}}}}
\\]"""


def get_verify_user_message(question: str, pred_answer: str) -> str:
    return (f"[Question Start]\n{question}\n[Question End]\n\n"
            f"[Predicted Answer Start]\n{pred_answer}\n[Predicted Answer End]")


def get_budget_forcing_nudge(max_search_calls: int, mode: str) -> str:
    if mode.startswith("verify"):
        return (f"Your verification so far may be incomplete. I will give you up to "
                f"{max_search_calls} additional search chances — continue verifying "
                "the remaining conditions, then report your updated confidence "
                "score in \\[\\boxed{\\text{<confidence_score>}}\\].")
    return (f"Your answer may be wrong or incomplete. I will give you up to "
            f"{max_search_calls} additional search chances — continue "
            "investigating, then give your final answer in \\[\\boxed{...}\\].")


def get_search_intent_instruction(prior_reasoning: str) -> str:
    return f"""Based on the partial reasoning below, state in one or two sentences what the author is trying to find out with their latest search query (the intent behind it). Output only the intent.

Reasoning so far:
{prior_reasoning}

Intent:"""


def get_click_intent_instruction(prior_reasoning: str) -> str:
    return f"""Based on the partial reasoning below, state in one or two sentences why the author wants to open the most recently mentioned link. Output only the intent.

Reasoning so far:
{prior_reasoning}

Intent:"""


def get_deep_web_explorer_instruction(search_query: str, search_intent: str,
                                      search_result: str) -> str:
    return f"""You are a web explorer. Your task: gather the information that satisfies the search intent below, using the search results provided — and, when needed, further searches or page visits.

- To run another web search: write {BEGIN_SEARCH_QUERY} your query {END_SEARCH_QUERY}
- To open a page from results: write {BEGIN_CLICK_LINK} the URL {END_CLICK_LINK}

You can repeat these actions as needed. When you have what you need (or exhaust your budget), finish with a summary that starts exactly with:

**Final Information**

followed by the helpful, factual information you found (or "No helpful information found." if nothing relevant turned up).

Search query: {search_query}
Search intent: {search_intent}

Initial search results:
{search_result}
"""


def get_web_page_reader_instruction(goal: str, page_text: str) -> str:
    return f"""Extract from the page content below everything relevant to this goal, quoting factual details precisely. Start your output with **Final Information** and include only the relevant content (or state that nothing relevant appears).

Goal: {goal}

Page content:
{page_text}
"""


def get_click_web_page_reader_instruction(click_intent: str, page_text: str) -> str:
    return get_web_page_reader_instruction(click_intent, page_text)


# ---- search-o1-style task system prompts (token-in-band agent / demo path) --

def _inband_header(max_search_limit: int) -> str:
    return f"""You can search the web while reasoning. Whenever you are uncertain about a fact, write {BEGIN_SEARCH_QUERY} your query {END_SEARCH_QUERY} and stop; the system will run the search and insert results between {BEGIN_SEARCH_RESULT} and {END_SEARCH_RESULT}, after which you continue reasoning. You may search up to {max_search_limit} times."""


def get_task_instruction_openqa(question: str, max_search_limit: int = 10) -> str:
    return f"""{_inband_header(max_search_limit)}

Answer the following question. Provide your final answer in the form \\boxed{{YOUR_ANSWER}}.

Question: {question}
"""


def get_task_instruction_multi_hop(question: str, max_search_limit: int = 10) -> str:
    return f"""{_inband_header(max_search_limit)}

Answer the following multi-hop question by breaking it into sub-questions and searching for each. Provide your final answer in the form \\boxed{{YOUR_ANSWER}}.

Question: {question}
"""


def get_task_instruction_math(question: str, max_search_limit: int = 10,
                              few_shot: int = 0) -> str:
    """``few_shot > 0`` prepends worked CoT examples from the example bank
    (evaluate/math_examples.py — the qwen toolkit's few-shot capability)."""
    shots = ""
    if few_shot:
        from ..evaluate.math_examples import MATH_EXAMPLES

        rendered = "\n\n".join(
            f"Question: {ex['question']}\nSolution: {ex['solution']}"
            for ex in MATH_EXAMPLES[:few_shot])
        shots = f"Worked examples:\n\n{rendered}\n\n"
    return f"""{_inband_header(max_search_limit)}

{shots}Solve the following math problem step by step. Provide your final answer in the form \\boxed{{YOUR_ANSWER}}.

Problem: {question}
"""


def get_task_instruction_choose(question: str, max_search_limit: int = 10) -> str:
    return f"""{_inband_header(max_search_limit)}

Answer the following multiple-choice question. Provide the letter of the correct choice in the form \\boxed{{YOUR_CHOICE}}.

Question: {question}
"""


def get_task_instruction_timeline(question: str, max_search_limit: int = 10) -> str:
    return f"""{_inband_header(max_search_limit)}

Answer the following question about the timing/ordering of events. Verify dates with searches, then provide your final answer in the form \\boxed{{YOUR_ANSWER}}.

Question: {question}
"""


def get_task_instruction_code(question: str, max_search_limit: int = 10) -> str:
    return f"""{_inband_header(max_search_limit)}

Solve the following programming problem. Provide your final solution as a complete program inside a ```python code block.

Problem: {question}
"""


def get_gpqa_web_thinker_instruction(max_search_limit: int = 15) -> str:
    """GPQA-specialized web-thinker task header
    (reference: prompts.py:2-28)."""
    return f"""You are a reasoning assistant solving a graduate-level science question. You may run web searches while you reason:

- To search, emit {BEGIN_SEARCH_QUERY}your query{END_SEARCH_QUERY}.
  The system will fetch and analyze relevant pages and reply inside
  {BEGIN_SEARCH_RESULT} ... {END_SEARCH_RESULT}.

Search as many times as you need (budget: {max_search_limit}), folding each result back into your reasoning.

Example:
Question: "What is the energy range of pp III neutrinos?"
- I should check the pp III neutrino spectrum.
{BEGIN_SEARCH_QUERY}pp III neutrino energy spectrum{END_SEARCH_QUERY}
(system supplies processed page information)
...reasoning continues with the new facts...

Remember: open every search with {BEGIN_SEARCH_QUERY} and close it with {END_SEARCH_QUERY}; when you are done searching, finish your reasoning.
"""


def get_deep_web_explorer_instruction_qwen(search_intent: str,
                                           search_result: str) -> str:
    """Qwen-variant explorer prompt: intent-only, no echoed query
    (reference: prompts.py:68-101). Same output contract: the extractor
    keys on **Final Information**."""
    return f"""You are a web explorer. Judge the searched pages strictly against the goal of this visit and pull out what serves it.

Guidelines:
1. Read every searched page and identify factual content that serves the goal of the visit.
2. If the pages don't serve the goal you may either search again with {BEGIN_SEARCH_QUERY}another query{END_SEARCH_QUERY} or open a page with {BEGIN_CLICK_LINK}URL{END_CLICK_LINK}.
3. Report the relevant content, starting exactly with **Final Information** on its own line.

**Final Information**
[Relevant information]

Inputs:
- Detailed goal of the visit:
{search_intent}

- Searched web pages:
{search_result}

Analyze the pages now and extract what serves the goal of the visit.
"""


def get_detailed_web_page_reader_instruction(query: str, search_intent: str,
                                             document: str) -> str:
    """Page reader conditioned on query AND intent (reference:
    prompts.py:108-126). Contract: markdown output, keep links, the literal
    "No relevant information" when nothing matches."""
    return f"""Extract every piece of this document that bears on the search query and the intent behind it, in markdown.

Search Query:
{query}

Search Intent:
{search_intent}

Searched Web Page:
{document}

Instructions:
- Keep all content matching the query/intent; omit nothing relevant.
- Preserve any useful links from the source.
- If nothing in the page is relevant, output "No relevant information".
- Prefer factual material that directly addresses the query and intent.
"""


def get_query_plan_instruction(question: str) -> str:
    """Sub-query planner (reference: prompts.py:141-158). Contract: the
    JSON ``{"query_plan": [...]}`` schema in a ```json block."""
    return f"""You are a reasoning assistant. Decompose the user's question into the sub-queries needed to fully answer it.

Question: {question}

Think about what separate facts must be gathered, then output only the plan in JSON:

```json
{{
    "query_plan": [
        "sub-query-1",
        "sub-query-2",
        ...
    ]
}}
```
"""


def get_webpage_to_reasonchain_instruction(prev_reasoning: str,
                                           search_query: str,
                                           document: str) -> str:
    """Reason-chain page analysis (reference: prompts.py:235-274).
    Contract: **Final Information** marker; the literal fallback line
    "No helpful information found."."""
    return f"""**Task Instruction:**

You are given **Previous Reasoning Steps**, a **Current Search Query**, and **Searched Web Pages**. Pull from the pages whatever helps answer the current search query so the reasoning chain can continue.

Guidelines:
1. Review each searched page for facts relevant to the **Current Search Query**.
2. Keep only accurate material that moves the **Previous Reasoning Steps** forward.
3. Output format:
- If the pages help, begin with `**Final Information**`:
**Final Information**

[Helpful information]

- If they do not help, output exactly:

**Final Information**

No helpful information found.

**Inputs:**
- **Previous Reasoning Steps:**
{prev_reasoning}

- **Current Search Query:**
{search_query}

- **Searched Web Pages:**
{document}

Now analyze each page for helpful information on "{search_query}" given the previous reasoning steps.
"""


def get_naive_rag_instruction(question: str, documents: str) -> str:
    """Closed-book RAG baseline (reference: prompts.py:347-355)."""
    return (
        "You are a knowledgeable assistant that answers the user's question "
        "using only the provided documents.\n\n"
        "Question:\n"
        f"{question}\n"
        "Documents:\n"
        f"{documents}\n"
    )
