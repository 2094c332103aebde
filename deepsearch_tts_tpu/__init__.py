"""deepsearch_tts_tpu — TPU-native agentic deep-search test-time-scaling framework.

A ground-up rebuild of the capabilities of ``hkust-nlp/deepsearch-tts`` (an
agentic web-search evaluation stack whose LLM calls go to hosted HTTP APIs),
re-architected TPU-first:

* ``engine/``    — in-house JAX/XLA serving engine: continuous batching, paged
                   KV cache, prefix reuse, OpenAI-compatible local server.
* ``models/``    — Qwen3 dense / Qwen3-MoE / DeepSeek-V3(MLA) families as pure
                   functional JAX with explicit sharding annotations.
* ``ops/``       — Pallas TPU kernels (flash attention, paged decode attention,
                   MoE dispatch, fused sampling).
* ``parallel/``  — device mesh + PartitionSpec layouts (dp/fsdp/tp/ep/sp).
* ``agents/``    — solve / verify / budget-forcing agent state machines
                   (reference: scripts/deep_search.py PolicyTool, :1112).
* ``web/``       — search + fetch + snippet tooling with deterministic replay.
* ``evaluate/``  — metrics, LLM judge, math equivalence, code eval.
* ``train/``     — SFT/finetune step (sharded), used for multi-chip dry runs.

The public CLI (``deepsearch_tts_tpu.cli.deep_search``) preserves the
reference's flag surface and JSON trace schema so its offline eval harnesses
run unchanged.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS=cpu even under environments whose sitecustomize
# force-registers a TPU backend and overrides the env var (the env-var path
# is consulted before site customization wins; jax.config after import is
# authoritative as long as no backend has initialized yet). This makes
# `JAX_PLATFORMS=cpu python -m deepsearch_tts_tpu.cli.serve ...` actually
# run on CPU instead of silently claiming the TPU.
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
