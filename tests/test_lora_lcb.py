import jax
import jax.numpy as jnp
import numpy as np

from deepsearch_tts_tpu.evaluate.lcb_prompts import (
    codegen_messages,
    format_question_codegen,
    get_model_style,
    self_repair_messages,
)
from deepsearch_tts_tpu.train.lora import apply_lora, init_lora


def _tiny_params():
    return {
        "embed": jnp.ones((8, 4), jnp.bfloat16),
        "layers": {
            "wq": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8)).astype(jnp.bfloat16),
            "ln1": jnp.ones((2, 4), jnp.bfloat16),
        },
    }


def test_lora_init_shapes():
    params = _tiny_params()
    lora = init_lora(params, rank=2)
    ad = lora["layers"]["wq"]
    assert ad["a"].shape == (2, 4, 2) and ad["b"].shape == (2, 2, 8)
    assert lora["layers"]["ln1"] is None and lora["embed"] is None


def test_lora_zero_b_is_identity():
    params = _tiny_params()
    lora = init_lora(params, rank=2)
    merged = apply_lora(params, lora)
    np.testing.assert_array_equal(np.asarray(merged["layers"]["wq"], np.float32),
                                  np.asarray(params["layers"]["wq"], np.float32))


def test_lora_nonzero_b_changes_weights():
    params = _tiny_params()
    lora = init_lora(params, rank=2)
    lora["layers"]["wq"]["b"] = jnp.ones_like(lora["layers"]["wq"]["b"])
    merged = apply_lora(params, lora)
    diff = np.abs(np.asarray(merged["layers"]["wq"], np.float32)
                  - np.asarray(params["layers"]["wq"], np.float32))
    assert diff.max() > 0


def test_codegen_prompts():
    q = {"Question": "print the sum of two ints"}
    msgs = codegen_messages(q, "qwen3-8b")
    assert msgs[0]["role"] == "system" and "stdin" in msgs[1]["content"]
    q2 = {"Question": "implement add", "starter_code": "def add(a,b):"}
    assert "Starter code" in format_question_codegen(q2)
    rep = self_repair_messages(q, "print(1)", "expected 3 got 1")
    assert rep[-1]["role"] == "user" and "incorrect" in rep[-1]["content"]
    assert get_model_style("unknown-model").style == "chatml"
