"""Sharding + training-step tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deepsearch_tts_tpu.models import get_model
from deepsearch_tts_tpu.parallel.mesh import best_mesh_shape, make_mesh
from deepsearch_tts_tpu.parallel.sharding import (
    SERVING_RULES,
    TRAIN_RULES,
    logical_to_spec,
    shard_pytree,
)
from deepsearch_tts_tpu.train.trainer import init_train_state, make_train_step


def test_best_mesh_shape():
    assert best_mesh_shape(8) == {"dp": 1, "pp": 1, "fsdp": 1, "ep": 1, "tp": 8}
    assert best_mesh_shape(8, prefer_tp=4) == {"dp": 2, "pp": 1, "fsdp": 1, "ep": 1, "tp": 4}
    assert best_mesh_shape(6, prefer_tp=4) == {"dp": 2, "pp": 1, "fsdp": 1, "ep": 1, "tp": 3}


def test_mesh_device_count_mismatch():
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)


def test_sharded_serving_forward(mesh8):
    """Dense model forward under TP sharding must match unsharded logits."""
    fam = get_model("qwen3-test")
    cfg = fam.config
    params = fam.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % cfg.vocab_size
    pos = jnp.tile(jnp.arange(6, dtype=jnp.int32), (2, 1))

    ref, _ = fam.forward(params, cfg, tokens, pos)

    with mesh8:
        sharded = shard_pytree(params, fam.logical_axes(), mesh8, SERVING_RULES)
        out, _ = jax.jit(lambda p, t, q: fam.forward(p, cfg, t, q))(sharded, tokens, pos)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(out, np.float32), rtol=5e-2, atol=6e-2)


def test_train_step_loss_decreases(mesh8):
    """Two SFT steps on a tiny dense model reduce loss on a fixed batch."""
    with mesh8:
        state, optimizer, fam = init_train_state("qwen3-test", mesh8,
                                                 learning_rate=5e-3)
        step = make_train_step(fam.forward, fam.config, optimizer)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (4, 16), 0,
                                    fam.config.vocab_size, jnp.int32)
        batch_sharding = NamedSharding(mesh8, logical_to_spec(("batch", "seq"),
                                                              TRAIN_RULES))
        tokens = jax.device_put(tokens, batch_sharding)
        mask = jnp.ones((4, 16), jnp.float32)
        losses = []
        for _ in range(3):
            state, metrics = step(state, tokens, mask)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 3


def test_checkpoint_roundtrip(tmp_path):
    from deepsearch_tts_tpu.train.checkpoint import (
        latest_step_dir,
        restore_params,
        save_params,
    )

    params = {"w": jnp.arange(8, dtype=jnp.float32).reshape(2, 4),
              "nested": {"b": jnp.ones((3,), jnp.bfloat16)}}
    path = save_params(str(tmp_path / "ckpt"), params, step=7)
    assert path.endswith("step_7")
    assert latest_step_dir(str(tmp_path / "ckpt")).endswith("step_7")
    restored = restore_params(path)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(params["w"]))
    assert restored["nested"]["b"].dtype == jnp.bfloat16


def test_span_timer():
    from deepsearch_tts_tpu.engine.profiling import SpanTimer

    t = SpanTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0


def test_device_trace_smoke(tmp_path):
    """jax.profiler trace capture works (observability subsystem)."""
    import jax.numpy as jnp

    from deepsearch_tts_tpu.engine.profiling import annotate, device_trace

    with device_trace(str(tmp_path)):
        with annotate("smoke"):
            _ = (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    import os

    # a trace directory with at least one event file must exist
    found = any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
                for _, _, files in os.walk(tmp_path) for f in files)
    assert found


def test_pipeline_parallel_matches_plain_forward(mesh8):
    """GPipe pipeline over a pp axis (layers sharded, ppermute hand-off):
    logits, loss, and grads must match the plain single-program forward."""
    from dataclasses import replace

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepsearch_tts_tpu.models.qwen3 import QWEN3_CONFIGS, forward, init_params
    from deepsearch_tts_tpu.parallel.mesh import make_mesh
    from deepsearch_tts_tpu.parallel.pipeline import make_pp_forward
    from deepsearch_tts_tpu.train.trainer import cross_entropy_loss

    cfg = replace(QWEN3_CONFIGS["qwen3-test"], n_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(pp=4, devices=jax.devices()[:4])
    pp_forward = make_pp_forward(cfg, mesh=mesh, n_microbatches=2)

    B, T = 4, 16
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    ref_logits, _ = forward(params, cfg, tokens, positions)
    pp_logits, _ = pp_forward(params, cfg, tokens, positions)
    assert np.allclose(np.asarray(ref_logits, np.float32),
                       np.asarray(pp_logits, np.float32), atol=2e-2)

    mask = jnp.ones((B, T), jnp.float32)

    def loss_with(fwd):
        def f(p):
            logits, _ = fwd(p, cfg, tokens[:, :-1], positions[:, :-1])
            return cross_entropy_loss(logits, tokens[:, 1:], mask[:, 1:])
        return f

    l_ref, g_ref = jax.value_and_grad(loss_with(forward))(params)
    l_pp, g_pp = jax.value_and_grad(loss_with(pp_forward))(params)
    assert abs(float(l_ref) - float(l_pp)) < 1e-3
    ref_norm = float(jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                                  for x in jax.tree.leaves(g_ref))))
    pp_norm = float(jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                                 for x in jax.tree.leaves(g_pp))))
    assert abs(ref_norm - pp_norm) / max(ref_norm, 1e-6) < 0.05


def test_sft_data_pipeline(tmp_path):
    """JSONL → tokenized batches with completion-only loss masks."""
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.train.data import batches, load_sft_examples

    path = tmp_path / "sft.jsonl"
    import json as _json

    rows = [{"prompt": "Q: ab\nA:", "completion": " cd"},
            {"text": "just text"},
            {"prompt": "Q: x\nA:", "completion": " y"}]
    path.write_text("\n".join(_json.dumps(r) for r in rows))

    tk = ByteTokenizer()
    exs = load_sft_examples(str(path), tk, max_len=32)
    assert len(exs) == 3
    # prompt tokens carry no loss; completion (+eos) does
    e0 = exs[0]
    assert e0.loss_start == len(tk.encode("Q: ab\nA:"))
    assert e0.tokens[-1] == tk.eos_id

    got = list(batches(exs, batch_size=2, seed=1, drop_remainder=True))
    assert len(got) == 1
    toks, mask = got[0]
    assert toks.shape == mask.shape and toks.shape[0] == 2
    for r in range(2):
        n = int((toks[r] != 0).sum())
        assert mask[r, :].sum() > 0
        assert mask[r, n:].sum() == 0          # padding never in the loss

    # pinned seq_len gives a static shape
    (toks2, _), = batches(exs[:2], batch_size=2, seq_len=16, seed=0)
    assert toks2.shape == (2, 16)


def test_lr_schedule_shape():
    from deepsearch_tts_tpu.train.trainer import lr_schedule

    sched = lr_schedule(1e-3, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(100)) == pytest.approx(1e-4, rel=1e-2)
    assert float(sched(55)) < float(sched(10))


def test_train_loop_overfits_tiny_batch(tmp_path):
    """The full SFT loop (schedule, eval, checkpoint) drives the loss down
    on a repeated tiny batch and writes a checkpoint."""
    from deepsearch_tts_tpu.engine.tokenizer import ByteTokenizer
    from deepsearch_tts_tpu.parallel.mesh import make_mesh
    from deepsearch_tts_tpu.train.data import SFTExample, batches
    from deepsearch_tts_tpu.train.trainer import train_loop

    tk = ByteTokenizer()
    ids = np.asarray(tk.encode("hello world"), np.int32)
    exs = [SFTExample(ids, 1)] * 4
    train_iter = batches(exs, batch_size=4, seq_len=16, epochs=30, seed=0)
    eval_b = list(batches(exs, batch_size=4, seq_len=16, seed=0))

    mesh = make_mesh(tp=8)
    with mesh:
        state, history = train_loop(
            "qwen3-test", mesh, train_iter, eval_batches=eval_b,
            total_steps=12, learning_rate=5e-3, warmup_steps=2,
            eval_every=6, checkpoint_dir=str(tmp_path / "ck"),
            checkpoint_every=12, log_every=0)
    assert len(history) == 12
    assert history[-1]["loss"] < history[0]["loss"] * 0.8
    assert "eval_loss" in history[5] and "eval_loss" in history[11]
    assert history[11]["eval_loss"] <= history[5]["eval_loss"]
    assert (tmp_path / "ck").exists()
