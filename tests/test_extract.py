from deepsearch_tts_tpu.evaluate.extract import (
    extract_answer_fn,
    extract_boxed,
    extract_confidence,
)


def test_boxed_last_match():
    assert extract_boxed(r"first \boxed{1} then \boxed{2}") == "2"


def test_boxed_nested_braces():
    assert extract_boxed(r"\boxed{\frac{1}{2}}") == r"\frac{1}{2}"


def test_qa_mode_boxed():
    assert extract_answer_fn(r"thinking... \boxed{Paris}", mode="qa", extract_answer=True) == "Paris"


def test_answer_marker_fallback():
    assert extract_answer_fn("blah\nANSWER: 42", mode="math", extract_answer=True) == "42"


def test_choose_unwraps_text():
    out = extract_answer_fn(r"\boxed{\text{(B)}}", mode="choose", extract_answer=True)
    assert out == "B"


def test_codegen_last_block():
    text = "```python\nx=1\n```\nmore\n```python\ny=2\n```"
    assert extract_answer_fn(text, mode="codegen", extract_answer=True) == "y=2"


def test_summary_after_think():
    text = "reasoning</think>\n**Final Information**: The fact is X."
    out = extract_answer_fn(text, mode="summary", extract_answer=True)
    assert "The fact is X." in out and "**Final Information" not in out


def test_summary_truncates_at_click_token():
    text = "**Final Information stuff<|begin_click_link|>http://x"
    out = extract_answer_fn(text, mode="summary", extract_answer=True)
    assert "http://x" not in out


def test_summary_fallback_tail():
    text = "a\nb\nc\nd\ne\nf\ng"
    out = extract_answer_fn(text, mode="summary", extract_answer=True)
    assert out == "c\nd\ne\nf\ng"


def test_research_longer_cap():
    text = "**Final Information" + "x" * 10000
    assert len(extract_answer_fn(text, mode="research", extract_answer=True)) == 6000


def test_confidence_forms():
    assert extract_confidence(r"\boxed{0.75}") == 0.75
    assert extract_confidence(r"\boxed{\text{3/4}}") == 0.75
    assert extract_confidence(r"\boxed{\text{75%}}") == 0.75
    assert extract_confidence("no box here") is None
    assert extract_confidence(r"\boxed{2}") is None or extract_confidence(r"\boxed{2}") <= 1.0
