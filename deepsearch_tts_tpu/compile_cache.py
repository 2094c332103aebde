"""Persistent XLA compilation cache across processes.

Engine bring-up on the axon TPU pays a ~12-15s remote-compile round trip per
distinct jitted program; the default serving config warms ~11-14 programs, so
every restart costs 94-285s of chip time (BENCH_r04.json, PRODUCT_RUN.json).

JAX's persistent compilation cache works through axon's remote compile — on a
hit the runtime deserializes the executable from disk instead of POSTing to
/remote_compile (measured by scripts/probe_compile_cache.py: warm compiles
0.07-0.33s vs 1.2-2.8s cold on toy programs; engine-scale numbers in
scripts/probe_init_cache.py). The reference has no analog (its compute is
rented over HTTP; cold-start is the provider's problem) — this is TPU-native
operational tooling.

Call :func:`enable_persistent_cache` before the first compile (bench.py, the
CLI entry points, and product-run scripts all do). Opt out with
``DST_COMPILE_CACHE=0``; point at a custom dir with ``DST_COMPILE_CACHE=/path``.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "deepsearch_tts_tpu", "jax_cache")

_enabled: str | None = None


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's on-disk compilation cache. Returns the dir, or None if
    disabled via ``DST_COMPILE_CACHE=0``. Idempotent."""
    global _enabled
    env = os.environ.get("DST_COMPILE_CACHE", "")
    if env == "0":
        return None
    if _enabled is not None:
        return _enabled
    path = cache_dir or (env if env not in ("", "1") else "") or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # the engine's programs are many and individually cheap to hash; cache
    # everything (the default 1s/min-size thresholds would skip the small
    # prefill-group and sampler programs that still cost a full tunnel RTT)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = path
    return path
