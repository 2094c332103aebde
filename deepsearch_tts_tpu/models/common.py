"""Shared pure-functional building blocks: RMSNorm, RoPE, SwiGLU.

All functions are shape-polymorphic pure JAX, bf16-friendly (norms and rope
computed in f32, cast back), with no framework dependency — parameters are
plain pytrees so the same code paths serve pjit/shard_map and Pallas callers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def rope_angles(positions: jax.Array, head_dim: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given absolute positions.

    positions: [..., T] int32 → returns cos,sin of shape [..., T, head_dim//2].
    """
    half = head_dim // 2
    freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[..., None] * freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (x[..., :half], x[..., half:]) — HF 'neox' convention.

    x: [B, T, H, D]; cos/sin: [B, T, half] (broadcast over heads).
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[..., None, :].astype(jnp.float32)
    s = sin[..., None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([x1f * c - x2f * s, x2f * c + x1f * s], axis=-1)
    return out.astype(x.dtype)


def swiglu(x: jax.Array, w_gate: jax.Array, w_up: jax.Array, w_down: jax.Array) -> jax.Array:
    g = jnp.dot(x, w_gate, preferred_element_type=jnp.bfloat16)
    u = jnp.dot(x, w_up, preferred_element_type=jnp.bfloat16)
    h = jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u
    return jnp.dot(h, w_down, preferred_element_type=jnp.bfloat16).astype(x.dtype)


def dense_init(key, shape, in_axis: int = 0, dtype=jnp.bfloat16) -> jax.Array:
    """Truncated-normal init scaled by fan-in (serving uses loaded weights;
    this matters for tests/benchmarks with random params)."""
    fan_in = shape[in_axis]
    std = fan_in ** -0.5
    return (jax.random.truncated_normal(key, -3, 3, shape, jnp.float32) * std).astype(dtype)
