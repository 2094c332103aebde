"""Report-generation prompt set (WebThinker report mode).

Covers the same surface as the reference's prompts_report.py
(scripts/prompts/prompts_report.py:2-311): plan → per-section write / check /
edit → title → final polish, plus RAG-baseline report prompts. Fresh prose;
the artifact contracts (markdown sections, JSON plan) are kept.
"""
from __future__ import annotations


def get_report_plan_instruction(question: str) -> str:
    return f"""Draft an outline for a research report that answers the question below. Return a JSON object of the form {{"title": ..., "sections": [{{"name": ..., "goal": ...}}, ...]}} with 4-8 sections, ordered logically from background to conclusion.

Question: {question}
"""


def get_section_write_instruction(question: str, plan: str, section_name: str,
                                  section_goal: str, evidence: str,
                                  written_so_far: str) -> str:
    return f"""You are writing one section of a research report.

Report question: {question}
Report plan: {plan}
Section to write now: {section_name}
Section goal: {section_goal}

Evidence collected from the web:
{evidence}

Report so far:
{written_so_far}

Write the complete markdown for this section only (start with '## {section_name}'). Ground every claim in the evidence; do not invent citations."""


def get_section_check_instruction(section_name: str, section_text: str,
                                  evidence: str) -> str:
    return f"""Review the report section below against the evidence. List any factual claims not supported by the evidence, missing key facts, or incoherent passages. If the section is fine, reply "OK".

Section ({section_name}):
{section_text}

Evidence:
{evidence}
"""


def get_section_edit_instruction(section_name: str, section_text: str,
                                 feedback: str) -> str:
    return f"""Rewrite the report section below to address the reviewer feedback, preserving correct content. Return only the revised markdown.

Section ({section_name}):
{section_text}

Feedback:
{feedback}
"""


def get_report_title_instruction(question: str, report: str) -> str:
    return f"""Give this report a concise, informative title (one line, no quotes).

Question: {question}

Report:
{report[:4000]}
"""


def get_final_report_instruction(question: str, draft: str) -> str:
    return f"""Polish the draft report below into its final form: fix transitions between sections, remove redundancy, ensure the introduction previews and the conclusion answers the question. Keep all factual content. Return the full markdown report.

Question: {question}

Draft:
{draft}
"""


def get_rag_report_instruction(question: str, documents: str) -> str:
    return f"""Write a well-structured research report (markdown, with sections) answering the question below, using only the retrieved documents provided.

Question: {question}

Documents:
{documents}
"""


def get_direct_report_instruction(question: str) -> str:
    return f"""Write a well-structured research report (markdown, with sections) answering:

{question}
"""


# ---- pairwise report judging (evaluate_report equivalent) -------------------

REPORT_JUDGE_DIMENSIONS = ("comprehensiveness", "thoroughness", "factuality", "coherence")


def get_report_evaluation_instruction(question: str, reports: dict[str, str]) -> str:
    """Multi-system comparative scoring, 0-10 per dimension per system
    (reference: scripts/evaluate/evaluate_report.py:57-173)."""
    blocks = "\n\n".join(
        f"[System {name} Report Start]\n{text}\n[System {name} Report End]"
        for name, text in reports.items()
    )
    dims = ", ".join(REPORT_JUDGE_DIMENSIONS)
    return f"""You are comparing research reports produced by different systems for the same question. Score each system on: {dims} — each 0-10 (10 best). Judge strictly from the report contents.

Question: {question}

{blocks}

Return a JSON object: {{"<system name>": {{"comprehensiveness": n, "thoroughness": n, "factuality": n, "coherence": n}}, ...}} with no other text."""
