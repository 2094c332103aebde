"""LoRA adapters: init, apply (merge), and trainable-mask utilities.

The reference demo hot-loads LoRA adapters into its vLLM server
(reference: demo/settings.py:99-112 ``/load_lora_adapter``). Here adapters
are first-class pytrees: train them with the SFT step (only LoRA leaves
trainable), then either merge into the served weights (zero serving
overhead) or keep them separate for quick swapping between requests.

Adapters target the stacked 2-D/3-D matmul weights (same key set as
quantization); each adapted weight W[..., in, out] gets A[..., in, r] and
B[..., r, out] with W' = W + (alpha/r)·A@B.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LORA_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
             "d_gate", "d_up", "d_down", "w_qb", "w_kb", "w_vb")


def _leaf_name(path) -> str:
    p = path[-1]
    return p.key if hasattr(p, "key") else str(p)


def init_lora(params: dict, rank: int = 16, alpha: float = 32.0,
              seed: int = 0, keys: tuple[str, ...] = LORA_KEYS) -> dict:
    """Zero-initialized-B LoRA tree mirroring the target weights."""
    base_key = jax.random.PRNGKey(seed)

    def make(path, w):
        if _leaf_name(path) not in keys or w.ndim < 2:
            return None
        kin, kout = w.shape[-2], w.shape[-1]
        lead = w.shape[:-2]
        k = jax.random.fold_in(base_key, hash(str(path)) % (2 ** 31))
        a = (jax.random.normal(k, lead + (kin, rank), jnp.float32)
             * (kin ** -0.5)).astype(w.dtype)
        b = jnp.zeros(lead + (rank, kout), w.dtype)
        return {"a": a, "b": b, "alpha": alpha, "rank": rank}

    return jax.tree_util.tree_map_with_path(
        make, params, is_leaf=lambda v: isinstance(v, jax.Array))


def apply_lora(params: dict, lora: dict) -> dict:
    """Merge adapters into the weights: W + (alpha/r)·A@B."""
    def merge(w, ad):
        if ad is None:
            return w
        scale = ad["alpha"] / ad["rank"]
        delta = jnp.einsum("...ir,...ro->...io",
                           ad["a"].astype(jnp.float32),
                           ad["b"].astype(jnp.float32)) * scale
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    return jax.tree.map(merge, params, lora,
                        is_leaf=lambda v: v is None or (isinstance(v, dict) and "a" in v))


def lora_trainable_mask(params: dict, lora: dict):
    """optax mask: True only on LoRA a/b leaves (used with masked optimizers)."""
    frozen = jax.tree.map(lambda _: False, params)
    trainable = jax.tree.map(
        lambda ad: None if ad is None else {"a": True, "b": True,
                                            "alpha": False, "rank": False},
        lora, is_leaf=lambda v: v is None or (isinstance(v, dict) and "a" in v))
    return frozen, trainable
