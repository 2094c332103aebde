"""Paged KV cache: device arrays + host-side page allocator.

The reference avoids long contexts by truncation (SURVEY.md §5); this module
is the TPU replacement — a vLLM-style paged cache, JAX-native:

* Device state: per-layer key/value page pools ``[L, N, ps, K, D]`` living in
  HBM, updated functionally (donated through jit so XLA updates in place).
* Host state: :class:`PageAllocator` — free list + refcounts, enabling
  copy-free prefix sharing between trajectories (multi-turn tool-call
  re-prefill keeps the conversation prefix's pages, SURVEY.md §7(b)).

Page 0 is reserved as the *null page*: padding positions scatter into it and
unassigned page-table slots point at it, so device code never branches on
validity.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def init_kv_pages(
    n_layers: int, n_pages: int, page_size: int, n_kv_heads: int, head_dim: int,
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    shape = (n_layers, n_pages, page_size, n_kv_heads, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def write_kv_flat(
    k_flat: jax.Array,      # [L*N, ps, K, D] all layers' pools, flattened view
    v_flat: jax.Array,
    k_new: jax.Array,       # [B, T, K, D]
    v_new: jax.Array,
    positions: jax.Array,   # [B, T]; <0 ⇒ padding
    table_l: jax.Array,     # [B, P] page ids ALREADY offset by layer*N
) -> tuple[jax.Array, jax.Array]:
    """Scatter a chunk's KV into the flattened all-layer pool.

    Designed for use inside a scan-over-layers with the pools in the scan
    *carry*: a single scatter into the carried buffer lowers to an in-place
    update — no per-layer slicing or stacked-output copies of the pools
    (which would move GBs per decode step).
    """
    LN, ps, K, D = k_flat.shape
    pad = positions < 0
    pos = jnp.maximum(positions, 0)
    page_idx = jnp.take_along_axis(table_l, pos // ps, axis=1)
    flat = page_idx * ps + pos % ps
    # padding scatters out of bounds and is DROPPED (slot mode has no spare
    # null row; paged mode's page 0 stays untouched too)
    flat = jnp.where(pad, LN * ps, flat).reshape(-1)

    kf = k_flat.reshape(LN * ps, K, D)
    vf = v_flat.reshape(LN * ps, K, D)
    kf = kf.at[flat].set(k_new.reshape(-1, K, D).astype(kf.dtype), mode="drop")
    vf = vf.at[flat].set(v_new.reshape(-1, K, D).astype(vf.dtype), mode="drop")
    return kf.reshape(LN, ps, K, D), vf.reshape(LN, ps, K, D)


def quantize_kv_rows(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, T, K, D] bf16 → (int32-PACKED rows [B, T, K, D//4], f32 scales
    [B, T, K]).

    Symmetric per-(token, head) quantization: one scale per cache row, the
    granularity that keeps rope-rotated keys accurate while halving KV HBM
    traffic and footprint (SURVEY.md §7(a): sub-bf16 for the 235B-class
    memory budget). The int8 lanes are bitcast-packed 4-per-int32 word so
    pool storage, scatter, and the decode gather all move 32-bit words —
    a raw int8 gather lowers to a scalar TPU path (~12x slower measured)."""
    x = rows.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1)                     # [B, T, K]
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / s[..., None]), -127, 127).astype(jnp.int8)
    B, T, K, D = q.shape
    packed = jax.lax.bitcast_convert_type(
        q.reshape(B, T, K, D // 4, 4), jnp.int32)
    return packed, s


def unpack_int8_rows(packed: jax.Array) -> jax.Array:
    """Inverse lane view of :func:`quantize_kv_rows`'s packing:
    int32 [..., D4] → int8 [..., D4*4]."""
    out = jax.lax.bitcast_convert_type(packed, jnp.int8)
    return out.reshape(packed.shape[:-1] + (packed.shape[-1] * 4,))


def write_scales_flat(
    s_flat: jax.Array,      # [L*N, ps, K] f32 per-row scales, flattened view
    s_new: jax.Array,       # [B, T, K]
    positions: jax.Array,   # [B, T]; <0 ⇒ padding (dropped)
    table_l: jax.Array,     # [B, P] page ids ALREADY offset by layer*N
) -> jax.Array:
    """Scatter per-row quantization scales alongside :func:`write_kv_flat`."""
    LN, ps, K = s_flat.shape
    pad = positions < 0
    pos = jnp.maximum(positions, 0)
    page_idx = jnp.take_along_axis(table_l, pos // ps, axis=1)
    idx = jnp.where(pad, LN * ps, page_idx * ps + pos % ps).reshape(-1)
    f = s_flat.reshape(LN * ps, K)
    f = f.at[idx].set(s_new.reshape(-1, K), mode="drop")
    return f.reshape(LN, ps, K)


def write_rows_flat(
    flat: jax.Array,        # [L*N, ps, K, D] one flattened all-layer pool
    rows: jax.Array,        # [B, T, K, D]
    positions: jax.Array,   # [B, T]; <0 ⇒ padding (dropped)
    table_l: jax.Array,     # [B, P] page ids ALREADY offset by layer*N
) -> jax.Array:
    """Single-pool variant of :func:`write_kv_flat` — used by MLA families
    whose cache holds one latent row per token (no separate V pool), halving
    cache HBM footprint and scatter bandwidth."""
    LN, ps, K, D = flat.shape
    pad = positions < 0
    pos = jnp.maximum(positions, 0)
    page_idx = jnp.take_along_axis(table_l, pos // ps, axis=1)
    idx = jnp.where(pad, LN * ps, page_idx * ps + pos % ps).reshape(-1)
    f = flat.reshape(LN * ps, K, D)
    f = f.at[idx].set(rows.reshape(-1, K, D).astype(f.dtype), mode="drop")
    return f.reshape(LN, ps, K, D)


def write_kv_layer(
    k_pages_l: jax.Array,   # [N, ps, K, D] one layer's pool
    v_pages_l: jax.Array,
    k_new: jax.Array,       # [B, T, K, D]
    v_new: jax.Array,
    positions: jax.Array,   # [B, T] absolute positions; <0 ⇒ padding
    page_table: jax.Array,  # [B, P]
) -> tuple[jax.Array, jax.Array]:
    """Scatter a chunk's KV into its pages. Padding goes to null page 0."""
    N, ps, K, D = k_pages_l.shape
    B, T = positions.shape
    pad = positions < 0
    pos = jnp.maximum(positions, 0)
    page_idx = jnp.take_along_axis(page_table, pos // ps, axis=1)  # [B, T]
    flat = page_idx * ps + pos % ps
    flat = jnp.where(pad, 0, flat).reshape(-1)  # null page absorbs padding

    kf = k_pages_l.reshape(N * ps, K, D)
    vf = v_pages_l.reshape(N * ps, K, D)
    kf = kf.at[flat].set(k_new.reshape(-1, K, D).astype(kf.dtype))
    vf = vf.at[flat].set(v_new.reshape(-1, K, D).astype(vf.dtype))
    return kf.reshape(N, ps, K, D), vf.reshape(N, ps, K, D)


@dataclass
class PageAllocator:
    """Host-side page bookkeeping with refcounting for prefix sharing.

    Page 0 is never handed out. ``share`` bumps refcounts when a new sequence
    adopts a cached prefix's pages; ``free`` returns pages whose refcount
    drops to zero.
    """

    n_pages: int
    page_size: int
    _free: list[int] = field(default_factory=list)
    _refs: dict[int, int] = field(default_factory=dict)

    def __post_init__(self):
        self._free = list(range(self.n_pages - 1, 0, -1))  # stack; excludes 0

    @property
    def num_free(self) -> int:
        return len(self._free)

    def pages_for_tokens(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def alloc(self, n: int) -> list[int]:
        if n > len(self._free):
            raise MemoryError(f"KV cache exhausted: need {n} pages, have {len(self._free)}")
        out = [self._free.pop() for _ in range(n)]
        for p in out:
            self._refs[p] = 1
        return out

    def share(self, pages: list[int]) -> list[int]:
        for p in pages:
            self._refs[p] += 1
        return list(pages)

    def free(self, pages: list[int]) -> None:
        for p in pages:
            r = self._refs.get(p, 0) - 1
            if r > 0:
                self._refs[p] = r
            elif r == 0:
                del self._refs[p]
                self._free.append(p)
            # r < 0 ⇒ double-free; ignore defensively (page already returned)

    def can_alloc(self, n: int) -> bool:
        return n <= len(self._free)
