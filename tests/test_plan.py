"""Deployment planner tests.

The planner's exactness contract (parallel/plan.py docstring): its analytic
``param_table`` mirrors each model family's ``init_params`` leaf-for-leaf.
These tests enforce that with ``jax.eval_shape`` on the tiny test configs,
so any model-code drift breaks the planner's numbers loudly.

Headline use (reference: README.md:22-40 — qwen/qwen3-235b-a22b is the
reference's rented policy model): the planner answers whether/how that model
serves on v5e meshes, so we also pin the well-known public param counts.
"""
import math

import jax
import jax.numpy as jnp
import pytest

from deepsearch_tts_tpu.parallel import plan as planmod
from deepsearch_tts_tpu.parallel.plan import (
    active_params, count_params, kv_pool_device_bytes, param_device_bytes,
    param_table, plan, recommend,
)


def _leaf_shapes_from_init(cfg, init):
    """{dotted-path: shape} from the family's real init_params."""
    tree = jax.eval_shape(lambda k: init(cfg, k),
                          jax.ShapeDtypeStruct((2,), jnp.uint32))
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = ".".join(p.key for p in path)
        out[name] = tuple(leaf.shape)
    return out


@pytest.mark.parametrize("model", ["qwen3-test", "qwen3-moe-test",
                                   "deepseek-v3-test"])
def test_param_table_matches_init_params(model):
    from deepsearch_tts_tpu.models import deepseek_v3, qwen3, qwen3_moe

    table = {"qwen3-test": (qwen3.QWEN3_CONFIGS, qwen3.init_params),
             "qwen3-moe-test": (qwen3_moe.QWEN3_MOE_CONFIGS,
                                qwen3_moe.init_params),
             "deepseek-v3-test": (deepseek_v3.DEEPSEEK_V3_CONFIGS,
                                  deepseek_v3.init_params)}
    cfgs, init = table[model]
    cfg = cfgs[model]
    real = _leaf_shapes_from_init(cfg, init)
    planned = {l.name: l.shape for l in param_table(cfg)}
    assert planned == real


def test_param_counts_235b():
    # public numbers for qwen3-235b-a22b: ~235B total, ~22B activated
    total = count_params("qwen3-235b-a22b")
    act = active_params("qwen3-235b-a22b")
    assert 225e9 < total < 245e9, total / 1e9
    assert 18e9 < act < 26e9, act / 1e9
    assert act < total / 8


def test_param_counts_match_eval_shape_exactly():
    from deepsearch_tts_tpu.models import qwen3

    cfg = qwen3.QWEN3_CONFIGS["qwen3-test"]
    real = sum(math.prod(s) for s in
               _leaf_shapes_from_init(cfg, qwen3.init_params).values())
    assert count_params(cfg) == real


def test_tp_shards_params():
    one, v1 = param_device_bytes(
        planmod._resolve("qwen3-test")[1], {})
    four, v4 = param_device_bytes(
        planmod._resolve("qwen3-test")[1], {"tp": 4})
    assert not v1
    # tp=4 must shrink per-device param bytes substantially (norms and any
    # non-divisible leaves replicate, so not exactly 4x)
    assert four < one / 2.5


def test_int8_halves_weight_bytes():
    cfg = planmod._resolve("qwen3-test")[1]
    bf16, _ = param_device_bytes(cfg, {})
    i8, _ = param_device_bytes(cfg, {}, weight_dtype="int8")
    assert i8 < bf16 * 0.75


def test_kv_pool_matches_engine_layout():
    """Slot-mode pool bytes == the engine's [L*N, ps, K, D] pools (k + v)."""
    cfg = planmod._resolve("qwen3-test")[1]
    slots, seq = 8, 256
    got, viol = kv_pool_device_bytes(cfg, {}, max_slots=slots,
                                     max_seq_len=seq, cache_mode="slot")
    want = 2 * cfg.n_layers * slots * seq * cfg.n_kv_heads * cfg.head_dim * 2
    assert got == want and not viol


def test_kv_pool_mla_single_latent_row():
    cfg = planmod._resolve("deepseek-v3-test")[1]
    assert cfg.latent_cache
    got, _ = kv_pool_device_bytes(cfg, {}, max_slots=4, max_seq_len=128,
                                  cache_mode="slot")
    row = cfg.n_layers * 128 * cfg.n_kv_heads * cfg.head_dim * 2
    assert got == row * 4 + row  # k pool + 1-page dummy v


def test_tiny_model_fits_single_chip():
    p = plan("qwen3-test", {}, max_slots=8, max_seq_len=256)
    assert p.fits and p.per_device["total"] < 2.0


def test_235b_does_not_fit_one_chip_but_recommend_finds_geometry():
    p1 = plan("qwen3-235b-a22b", {}, max_slots=64, max_seq_len=8192)
    assert not p1.fits
    # slot mode (every slot holds a full dedicated 8k row) correctly does NOT
    # fit on v5e-64 — an honest planner answer, not a bug: the pool alone is
    # ~12GiB/device at 32 slots/device
    slot_plans = recommend("qwen3-235b-a22b", 64, weight_dtype="int8",
                           max_slots=64, max_seq_len=8192)
    assert slot_plans and not slot_plans[0].fits
    assert slot_plans[0].kv_capacity_tokens > 50_000  # shrink guidance given
    # realistic production sizing: paged shared pool at a per-device token
    # budget (mean context << max) — this is the deployable geometry
    plans = recommend("qwen3-235b-a22b", 64, weight_dtype="int8",
                      max_slots=64, max_seq_len=8192, cache_mode="paged",
                      kv_budget_tokens=80_000)
    assert plans, "expected at least one geometry for v5e-64"
    best = plans[0]
    assert best.fits, best.summary()
    assert math.prod(best.mesh.values()) == 64
    # params alone must be < HBM with int8 on 64 chips (235GB/64 ≈ 3.7GiB)
    assert best.per_device["params"] < 8


def test_recommend_respects_divisibility():
    for p in recommend("qwen3-moe-test", 8, top=0):
        cfg = planmod._resolve("qwen3-moe-test")[1]
        assert cfg.n_heads % p.mesh["tp"] == 0
        assert cfg.n_experts % p.mesh["ep"] == 0
        assert p.mesh["dp"] * p.mesh["ep"] * p.mesh["tp"] == 8


def test_cli_smoke(capsys):
    planmod.main(["qwen3-235b-a22b", "--devices", "32", "--dtype", "int8"])
    out = capsys.readouterr().out
    assert "v5e-32" in out and ("FITS" in out or "DOES NOT FIT" in out)
