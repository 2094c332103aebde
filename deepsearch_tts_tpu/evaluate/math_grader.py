"""Symbolic math grading (the qwen_math_eval_toolkit capability).

The reference vendors a 1.8k-LoC sympy/latex2sympy grader
(scripts/qwen_math_eval_toolkit/grader.py, parser.py) for math benchmarks.
This module supplies the same capability surface — answer extraction from
model output, LaTeX→sympy parsing, symbolic + numeric equivalence — built
directly on sympy with the string-normalization fallbacks from
math_equivalence.py. Gated: if sympy is unavailable, grading degrades to
string equivalence.
"""
from __future__ import annotations

import re

from .extract import extract_boxed
from .math_equivalence import is_equiv, normalize_math

try:
    import sympy
    from sympy.parsing.sympy_parser import (
        implicit_multiplication_application,
        parse_expr,
        standard_transformations,
    )

    _TRANSFORMS = standard_transformations + (implicit_multiplication_application,)
    HAS_SYMPY = True
except Exception:  # pragma: no cover
    HAS_SYMPY = False


_LATEX_REPLACEMENTS = [
    (r"\\left", ""), (r"\\right", ""), (r"\\cdot", "*"), (r"\\times", "*"),
    (r"\\div", "/"), (r"\\pi", "pi"), (r"\\infty", "oo"), (r"\\%", "/100"),
    (r"\^", "**"), (r"\\sqrt\{([^}]*)\}", r"sqrt(\1)"),
    (r"\\frac\{([^{}]*)\}\{([^{}]*)\}", r"((\1)/(\2))"),
    (r"\\dfrac\{([^{}]*)\}\{([^{}]*)\}", r"((\1)/(\2))"),
    (r"\\text\{[^}]*\}", ""), (r"\\mathrm\{[^}]*\}", ""),
    (r"\\!|\\,|\\;|\\ ", ""), (r"\{", "("), (r"\}", ")"), (r"\$", ""),
]


def latex_to_expr_string(s: str) -> str:
    s = s.strip()
    for pat, rep in _LATEX_REPLACEMENTS:
        s = re.sub(pat, rep, s)
    s = s.replace(",", "")  # thousands separators
    return s.strip()


def parse_math(s: str):
    """LaTeX/plain string → sympy expression, or None."""
    if not HAS_SYMPY or not s:
        return None
    try:
        return parse_expr(latex_to_expr_string(s), transformations=_TRANSFORMS,
                          evaluate=True)
    except Exception:
        return None


def symbolic_equal(a: str, b: str, tol: float = 1e-8) -> bool:
    ea, eb = parse_math(a), parse_math(b)
    if ea is None or eb is None:
        return False
    try:
        diff = sympy.simplify(ea - eb)
        if diff == 0:
            return True
    except Exception:
        pass
    try:
        va, vb = complex(ea.evalf()), complex(eb.evalf())
        return abs(va - vb) <= tol * max(1.0, abs(va), abs(vb))
    except Exception:
        return False


def math_equal(prediction: str, reference: str, include_percentage: bool = True,
               is_close: bool = True) -> bool:
    """Full grading ladder: string-normalized → numeric (with percent
    variants) → symbolic. Mirrors the toolkit grader's decision order."""
    if prediction is None or reference is None:
        return False
    prediction, reference = str(prediction), str(reference)
    if normalize_math(prediction) == normalize_math(reference):
        return True
    if is_equiv(prediction, reference):
        return True

    # numeric with percentage ambiguity (grader.py semantics: 0.5 ≡ 50%)
    pnum, rnum = _to_float(prediction), _to_float(reference)
    if pnum is not None and rnum is not None:
        candidates = [rnum] + ([rnum / 100.0, rnum * 100.0] if include_percentage else [])
        tol = 1e-4 if is_close else 1e-10
        for c in candidates:
            if abs(pnum - c) <= tol * max(1.0, abs(c)):
                return True
        return False

    return symbolic_equal(prediction, reference)


def _to_float(s: str) -> float | None:
    s = str(s).strip().rstrip("%").replace(",", "")
    try:
        return float(s)
    except ValueError:
        pass
    m = re.fullmatch(r"\s*(-?[\d.]+)\s*/\s*(-?[\d.]+)\s*", s)
    if m:
        try:
            return float(m.group(1)) / float(m.group(2))
        except (ValueError, ZeroDivisionError):
            return None
    return None


def extract_math_answer(output: str) -> str:
    """Pull the final math answer from model output: boxed first, then the
    last number-like token (parser.py's fallback ladder)."""
    boxed = extract_boxed(output)
    if boxed:
        return boxed
    if "ANSWER:" in output:
        return output.split("ANSWER:")[-1].strip().strip("*")
    nums = re.findall(r"-?\d+(?:\.\d+)?(?:/\d+)?", output)
    return nums[-1] if nums else ""
