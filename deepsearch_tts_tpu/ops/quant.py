"""Int8 weight quantization: Pallas kernels + quantized-matmul helpers.

Serving the 235B/1T-class models on v5e HBM budgets requires sub-bf16
weights (SURVEY.md §7 hard part (a): "fp8/int8 weights"). This module
provides:

* :func:`quantize_int8` — per-channel symmetric int8 quantization as a
  Pallas kernel (stochastic rounding via the on-core PRNG, per the TPU
  kernel guide's quantization pattern), with an XLA fallback.
* :func:`int8_matmul` — x(bf16) @ w(int8, per-channel scales) with the
  dequantization fused into the MXU epilogue (scales applied to the f32
  accumulator, not the weights — no bf16 materialization of w).
* :func:`quantize_params` — quantize a model's big matmul weights, leaving
  norms/embeddings in bf16.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_kernel(seed_ref, x_ref, q_ref, scale_ref):
    pltpu.prng_seed(seed_ref[0])
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)      # per output channel
    scale = jnp.maximum(amax / 127.0, 1e-8)
    scaled = x / scale
    # stochastic rounding to int8 by hand (the pltpu.stochastic_round
    # primitive only targets bf16/fp8): add uniform [0,1) noise, floor, clip
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # Mosaic can't cast uint32→f32; the >>8 value fits in int31, so bitcast
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
    q = jnp.clip(jnp.floor(scaled + u), -127, 127)
    q_ref[:] = q.astype(jnp.int8)
    scale_ref[:] = scale.astype(jnp.float32)


def quantize_int8(w: jax.Array, seed: int = 0, interpret: bool | None = None
                  ) -> tuple[jax.Array, jax.Array]:
    """[K, N] float → (int8 [K, N], scales f32 [1, N]) per-output-channel."""
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    K, N = w.shape
    if interpret:
        # XLA fallback: deterministic round-to-nearest
        xf = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=0, keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        return q, scale
    q, scale = pl.pallas_call(
        _quant_kernel,
        out_shape=(jax.ShapeDtypeStruct((K, N), jnp.int8),
                   jax.ShapeDtypeStruct((1, N), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(jnp.array([seed], jnp.int32), w)
    return q, scale


def int8_matmul(x: jax.Array, w_q: jax.Array, scales: jax.Array) -> jax.Array:
    """x [.., K] @ int8 w [K, N] with fused per-channel dequant."""
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * scales.astype(jnp.float32)).astype(x.dtype)


QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
              "wqkv", "w_gateup",   # packed single-chip serving layout
              "d_gate", "d_up", "d_down", "s_gate", "s_up", "s_down",
              "w_qb", "w_kb", "w_vb", "lm_head")

# legacy subset: ragged_dot has no int8 path, but quantized routed experts
# now run the blocked grouped matmul (ops/moe._expert_ffn_blocked), so MoE
# families quantize everything; kept for callers that want bf16 experts
QUANT_KEYS_NO_EXPERTS = tuple(k for k in QUANT_KEYS
                              if k not in ("w_gate", "w_up", "w_down"))


def quantized_logical_axes(params: dict, axes_tree: dict) -> dict:
    """Expand a logical-axes tree to match quantized params: each
    ``{q, scales}`` leaf gets the original axes for ``q`` and the same axes
    with the contracted dim dropped (None) for its ``[..., 1, N]`` scales —
    so EP/TP sharding of int8 experts works through shard_pytree."""
    def fix(p, ax):
        if isinstance(p, dict) and "q" in p and "scales" in p:
            ax = tuple(ax)
            return {"q": ax, "scales": ax[:-2] + (None, ax[-1])}
        return tuple(ax) if isinstance(ax, (list, tuple)) else ax

    return jax.tree.map(
        fix, params, axes_tree,
        is_leaf=lambda x: (isinstance(x, dict) and "q" in x and "scales" in x)
        or isinstance(x, jax.Array))


def quantize_params(params: dict, seed: int = 0,
                    keys: tuple[str, ...] = QUANT_KEYS) -> dict:
    """Quantize big matmul weights to int8 {q, scales}; pass the rest through.

    Stacked leading dims (layer / expert) are preserved: quantization is
    applied over the last two dims via vmap.
    """
    def quant_leaf(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name not in keys or x.ndim < 2:
            return x
        mat = x.reshape(-1, x.shape[-2], x.shape[-1])
        # one-time init work: the XLA round-to-nearest path handles matrices
        # of any size (the Pallas kernel wants the whole matrix in VMEM)
        qs = [quantize_int8(m, seed=seed + i, interpret=True)
              for i, m in enumerate(mat)]
        q = jnp.stack([a for a, _ in qs]).reshape(x.shape)
        s = jnp.stack([b for _, b in qs]).reshape(x.shape[:-2] + (1, x.shape[-1]))
        return {"q": q, "scales": s}

    return jax.tree_util.tree_map_with_path(
        quant_leaf, params, is_leaf=lambda v: isinstance(v, jax.Array))


def maybe_int8_dot(x: jax.Array, w) -> jax.Array:
    """Matmul that accepts either a plain array or an int8 {q, scales} dict."""
    if isinstance(w, dict) and "q" in w:
        return int8_matmul(x, w["q"], w["scales"])
    return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
