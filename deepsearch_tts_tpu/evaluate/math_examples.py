"""Few-shot chain-of-thought examples for math benchmarks.

Capability match for the reference's vendored example bank
(scripts/qwen_math_eval_toolkit/examples.py, 378 LoC): per-benchmark
few-shot prompts with worked solutions ending in boxed answers. Fresh
content in the same structure.
"""
from __future__ import annotations

MATH_EXAMPLES = [
    {
        "question": "What is the value of $3^2 + 4^2$?",
        "solution": ("We compute each square: $3^2 = 9$ and $4^2 = 16$. "
                     "Their sum is $9 + 16 = 25$. The answer is $\\boxed{25}$."),
    },
    {
        "question": "Solve for $x$: $2x + 6 = 14$.",
        "solution": ("Subtract 6 from both sides: $2x = 8$. Divide by 2: "
                     "$x = 4$. The answer is $\\boxed{4}$."),
    },
    {
        "question": "What is the probability of rolling a sum of 12 with two fair six-sided dice?",
        "solution": ("Only (6,6) gives 12, out of $6 \\times 6 = 36$ equally "
                     "likely outcomes, so the probability is "
                     "$\\boxed{\\frac{1}{36}}$."),
    },
    {
        "question": "Simplify $\\frac{18}{24}$.",
        "solution": ("The GCD of 18 and 24 is 6; dividing gives "
                     "$\\frac{3}{4}$. The answer is $\\boxed{\\frac{3}{4}}$."),
    },
]

GSM8K_EXAMPLES = [
    {
        "question": ("A baker makes 24 muffins and sells them in boxes of 4. "
                     "Each box sells for $5. How much money does the baker make?"),
        "solution": ("24 muffins in boxes of 4 gives 24 / 4 = 6 boxes. At $5 "
                     "per box that is 6 * 5 = 30 dollars. The answer is "
                     "$\\boxed{30}$."),
    },
    {
        "question": ("Tom reads 12 pages a day for 5 days, then 20 pages a day "
                     "for 2 days. How many pages does he read in total?"),
        "solution": ("First stretch: 12 * 5 = 60 pages. Second: 20 * 2 = 40 "
                     "pages. Total 60 + 40 = 100. The answer is $\\boxed{100}$."),
    },
]

EXAMPLE_SETS = {"math": MATH_EXAMPLES, "gsm8k": GSM8K_EXAMPLES}


def build_few_shot_prompt(question: str, benchmark: str = "math",
                          n_shots: int = 4) -> str:
    """Render a few-shot CoT prompt ending with the target question."""
    shots = EXAMPLE_SETS.get(benchmark, MATH_EXAMPLES)[:n_shots]
    parts = []
    for ex in shots:
        parts.append(f"Question: {ex['question']}\nSolution: {ex['solution']}\n")
    parts.append(f"Question: {question}\nSolution:")
    return "\n".join(parts)
