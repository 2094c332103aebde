"""Generate golden-logit weight-conversion fixtures (VERDICT r3 #7).

For each model family (dense / MoE / MLA) this builds a tiny HF checkpoint
with seeded random weights, runs the *HuggingFace torch* implementation —
an implementation entirely independent of this repo's conversion and
forward — in float32, and checks in:

    tests/fixtures/golden/<family>/model.safetensors
    tests/fixtures/golden/<family>/expected_logits.npy   (fp32, [T, V])
    tests/fixtures/golden/<family>/meta.json             (input_ids, config)

tests/test_weights.py then loads the safetensors through
engine/weights.py's converters, runs this repo's forward, and compares —
so a layout bug (transpose, rope interleave, kv_b split) fails a test
instead of shipping silent garbage at first real deployment.

Weights are rounded to bf16-representable values before saving so the
converters' bf16 cast is lossless and the only numerical gap left is this
repo's bf16 compute.

Run once (regenerates fixtures deterministically):
    python scripts/gen_golden_fixtures.py
"""
from __future__ import annotations

import json
import os

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "golden")
SEQ = 12


def _round_bf16_(model):
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(p.to(torch.bfloat16).to(torch.float32))


def _save(model, name, input_ids, cfg_repr):
    d = os.path.join(OUT, name)
    os.makedirs(d, exist_ok=True)
    model.eval()
    with torch.no_grad():
        logits = model(input_ids=input_ids).logits[0].float().numpy()
    from safetensors.torch import save_file

    state = {k: v.contiguous() for k, v in model.state_dict().items()
             if "rotary_emb.inv_freq" not in k}
    if getattr(model.config, "tie_word_embeddings", False):
        state.pop("lm_head.weight", None)  # shares memory with embed_tokens
    save_file(state, os.path.join(d, "model.safetensors"))
    np.save(os.path.join(d, "expected_logits.npy"), logits)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"input_ids": input_ids[0].tolist(), "config": cfg_repr,
                   "transformers_note":
                       "logits from HF float32 forward on bf16-rounded "
                       "weights"}, f, indent=1)
    print(f"{name}: logits[{logits.shape}] std={logits.std():.4f} -> {d}")


def gen_dense():
    """Matches models/qwen3.py QWEN3_CONFIGS['qwen3-test']."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=512, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        intermediate_size=256, rope_theta=1_000_000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_bias=False,
        max_position_embeddings=256,
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg)
    _round_bf16_(model)
    ids = torch.arange(SEQ)[None] * 7 % cfg.vocab_size
    _save(model, "qwen3-test", ids, "qwen3-test")


def gen_moe():
    """Matches models/qwen3_moe.py QWEN3_MOE_CONFIGS['qwen3-moe-test']."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg = Qwen3MoeConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=128, moe_intermediate_size=96,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        rope_theta=1_000_000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_bias=False,
        max_position_embeddings=256,
    )
    torch.manual_seed(1)
    model = Qwen3MoeForCausalLM(cfg)
    _round_bf16_(model)
    ids = (torch.arange(SEQ)[None] * 11 + 3) % cfg.vocab_size
    _save(model, "qwen3-moe-test", ids, "qwen3-moe-test")


def gen_mla():
    """Matches models/deepseek_v3.py DEEPSEEK_V3_CONFIGS['deepseek-v3-test']."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = DeepseekV3Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        intermediate_size=128, moe_intermediate_size=48,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=2, topk_group=1, routed_scaling_factor=2.5,
        first_k_dense_replace=1, norm_topk_prob=True,
        rope_theta=10_000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_bias=False,
        max_position_embeddings=256, rope_interleave=True,
    )
    torch.manual_seed(2)
    model = DeepseekV3ForCausalLM(cfg)
    _round_bf16_(model)
    ids = (torch.arange(SEQ)[None] * 13 + 5) % cfg.vocab_size
    _save(model, "deepseek-v3-test", ids, "deepseek-v3-test")


if __name__ == "__main__":
    torch.set_num_threads(1)
    gen_dense()
    gen_moe()
    gen_mla()
