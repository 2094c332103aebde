"""Code-generation prompt builders + model-style registry.

Capability match for the reference's vendored LCB prompt layer
(scripts/lcb_runner/prompts/ and lm_styles.py:716 LoC): per-style chat
formatting for code generation, self-repair, and test-output prediction,
with a small registry mapping model names to prompt styles. The sandboxed
execution + pass@k lives in evaluate/code_eval.py.
"""
from __future__ import annotations

from dataclasses import dataclass

SYSTEM_CODEGEN = (
    "You are an expert Python programmer. You will be given a question "
    "(problem specification) and will generate a correct Python program that "
    "matches the specification and passes all tests."
)


@dataclass(frozen=True)
class ModelStyle:
    name: str
    style: str = "chatml"          # chatml | plain
    system_prompt: str = SYSTEM_CODEGEN


MODEL_STYLES = {
    name: ModelStyle(name) for name in (
        "qwen3-0.6b", "qwen3-1.7b", "qwen3-4b", "qwen3-8b", "qwen3-14b",
        "qwen3-32b", "qwen3-235b-a22b", "qwen3-30b-a3b", "deepseek-v3",
        "kimi-k2",
    )
}


def get_model_style(name: str) -> ModelStyle:
    return MODEL_STYLES.get(name.lower(), ModelStyle(name.lower()))


def format_question_codegen(question: dict) -> str:
    """Stdin/stdout or functional problem → user prompt."""
    text = question.get("question_content") or question.get("Question") or ""
    starter = question.get("starter_code") or ""
    if starter:
        return (f"### Question:\n{text}\n\n### Starter code (complete the "
                f"function; read nothing from stdin):\n```python\n{starter}\n```"
                "\n\n### Answer: (return the full solution in a python code block)\n")
    return (f"### Question:\n{text}\n\nRead input from stdin and write the "
            "answer to stdout. Return the full program in a python code "
            "block.\n\n### Answer:\n")


def codegen_messages(question: dict, model: str = "") -> list[dict]:
    style = get_model_style(model)
    return [
        {"role": "system", "content": style.system_prompt},
        {"role": "user", "content": format_question_codegen(question)},
    ]


def self_repair_messages(question: dict, prior_code: str, error: str,
                         model: str = "") -> list[dict]:
    style = get_model_style(model)
    return [
        {"role": "system", "content": style.system_prompt},
        {"role": "user", "content": format_question_codegen(question)},
        {"role": "assistant", "content": f"```python\n{prior_code}\n```"},
        {"role": "user", "content":
            f"Your program is incorrect. Error/failed test:\n{error}\n\n"
            "Fix the program and return the full corrected solution in a "
            "python code block."},
    ]


def test_output_prediction_messages(question: dict, fn_name: str,
                                    test_input: str, model: str = "") -> list[dict]:
    return [
        {"role": "system", "content":
            "You are a careful Python interpreter. Predict the exact output."},
        {"role": "user", "content":
            f"Problem:\n{question.get('Question', '')}\n\nFunction: {fn_name}\n"
            f"Input:\n{test_input}\n\nReply with only the output value."},
    ]
