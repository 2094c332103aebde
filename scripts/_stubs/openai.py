"""Import stub satisfying ``from openai import OpenAI, AsyncOpenAI``.

The reference evaluation harness (reference: scripts/evaluate/evaluate.py:13)
imports the openai SDK at module scope even when LLM judging is disabled.
This environment has no network access and no openai package, so the
differential-compatibility runs (scripts/diff_eval.py,
tests/test_reference_parity.py) prepend this directory to PYTHONPATH: the
reference script runs byte-for-byte unmodified, and any *use* of these stubs
(only reachable with --use_llm) fails loudly.
"""


class _Unusable:
    def __init__(self, *a, **k):
        pass

    def __getattr__(self, name):
        raise RuntimeError(
            "openai stub: network clients are unavailable in this environment")


class OpenAI(_Unusable):
    pass


class AsyncOpenAI(_Unusable):
    pass
