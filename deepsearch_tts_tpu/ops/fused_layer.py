"""Fused decode-layer Pallas kernels (dense family hot path).

Decode at serving batch sizes is HBM-bound, but the measured step anatomy
(CLAUDE.md) shows ~120µs/layer of *small-op* overhead — norms, rope,
reshapes, residual adds — each a separate XLA op with fixed launch cost and
an HBM round trip for the [B, E] activations. These kernels collapse a
layer's op chain into a few ``pallas_call``s whose weight blocks stream
HBM→VMEM (double-buffered by the Pallas pipeline) while every intermediate
activation stays in VMEM:

* :func:`fused_mlp` — rmsnorm(x) → gate/up matmul → silu·mul → down matmul
  → +x, blocked over the intermediate dim F.
* :func:`fused_qkv` — rmsnorm(x) → fused QKV matmul → per-head q/k rmsnorm
  → rope, blocked over the QKV output columns.
* :func:`fused_out_mlp` — attn_out @ wo → +x → fused_mlp, i.e. the whole
  back half of a decoder layer in one kernel.

The reference has no kernels at all (its compute is rented over HTTP,
reference: scripts/deep_search.py:287-335); these exist to hit the
BASELINE.md roofline target on TPU. All kernels have interpret-mode tests
vs the XLA path (tests/test_fused_layer.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(total: int, target: int = 512, align: int = 128) -> int:
    """Largest divisor of ``total`` that is ≤ target and a multiple of
    ``align`` (falls back to ``total`` for small/odd dims)."""
    best = None
    b = align
    while b <= min(total, target):
        if total % b == 0:
            best = b
        b += align
    return best or total


def _out_mlp_blocks(E: int, F: int, HD: int, batch: int
                    ) -> tuple[int, int] | None:
    """Block choice for :func:`fused_out_mlp_stacked` under its 13MB VMEM
    budget: resident activations (a/x/out/x2/xn bf16 + acc f32) plus the
    double-buffered wo slab and three double-buffered gate/up/down slabs.
    Returns ``(eb, fb)`` or ``None`` when even the minimum 128-wide blocks
    exceed the budget — the single source of truth for both the kernel and
    the engine's auto-enable gate (so the gate can never admit a config the
    chooser cannot actually fit)."""
    act_bytes = batch * (HD * 2 + E * 2 * 4 + E * 4)
    budget = 13 * 2**20 - act_bytes
    eb = None
    for cand in (512, 384, 256, 128):
        if E % cand == 0 and 2 * HD * cand * 2 <= max(budget // 4, 1):
            eb = cand
            break
    if eb is None:
        return None
    fb = None
    for cand in (768, 512, 384, 256, 128):
        if F % cand == 0 and 3 * 2 * E * cand * 2 <= budget - 2 * HD * eb * 2:
            fb = cand
            break
    if fb is None:
        return None
    return eb, fb


def fused_vmem_ok(cfg, batch: int) -> bool:
    """Can the fused out+MLP kernel fit VMEM at this (config, batch)?

    Delegates to :func:`_out_mlp_blocks` — the exact chooser
    :func:`fused_out_mlp_stacked` runs — so the engine's auto-enable falls
    back to the XLA layer chain for configs whose minimum blocks exceed the
    budget (e.g. qwen3-14b at batch 64) instead of failing Mosaic
    allocation at warmup."""
    E, F = cfg.hidden, cfg.intermediate
    HD = cfg.n_heads * cfg.head_dim
    return _out_mlp_blocks(E, F, HD, batch) is not None


def _rms_norm_f32(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _mlp_kernel(x_ref, ln_ref, wg_ref, wu_ref, wd_ref, o_ref, xn_ref, acc_ref,
                *, eps: float, n_blocks: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        xn_ref[:] = _rms_norm_f32(x_ref[:], ln_ref[0], eps).astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]
    g = jnp.dot(xn, wg_ref[:], preferred_element_type=jnp.float32)
    u = jnp.dot(xn, wu_ref[:], preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(xn.dtype)
    acc_ref[:] += jnp.dot(h, wd_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == n_blocks - 1)
    def _fin():
        o_ref[:] = (x_ref[:].astype(jnp.float32) + acc_ref[:]).astype(o_ref.dtype)


def fused_mlp(x: jax.Array, ln_w: jax.Array, w_gate: jax.Array,
              w_up: jax.Array, w_down: jax.Array, *, eps: float = 1e-6,
              block_f: int | None = None, interpret: bool | None = None
              ) -> jax.Array:
    """``x + swiglu(rmsnorm(x, ln_w)) @ w_down`` in one kernel.

    x: [B, E]; w_gate/w_up: [E, F]; w_down: [F, E]. Weight blocks of
    ``block_f`` columns stream through VMEM; activations never leave VMEM.
    """
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    F = w_gate.shape[1]
    fb = block_f or _pick_block(F)
    n_blocks = F // fb
    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, n_blocks=n_blocks),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, fb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, fb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, E), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, E), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, E), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, E), x.dtype),
            pltpu.VMEM((B, E), jnp.float32),
        ],
        interpret=interpret,
    )(x, ln_w.reshape(1, E), w_gate, w_up, w_down)


def fused_qkv(x: jax.Array, ln_w: jax.Array, wqkv: jax.Array,
              q_norm: jax.Array, k_norm: jax.Array,
              cos: jax.Array, sin: jax.Array,
              *, n_heads: int, n_kv: int, head_dim: int, eps: float = 1e-6,
              interpret: bool | None = None
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """rmsnorm(x) @ [wq|wk|wv] with per-head q/k rmsnorm + rope fused.

    x: [B, E]; wqkv: [E, (H+2K)*D]; cos/sin: [B, D/2].
    Returns (q [B, H*D], k [B, K*D], v [B, K*D]).
    """
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    D = head_dim
    HD, KD = n_heads * D, n_kv * D
    C = HD + 2 * KD
    assert wqkv.shape == (E, C), (wqkv.shape, (E, C))
    # one grid step per section multiple: block must divide each section and
    # be a multiple of D. Use gcd-style pick: largest multiple of D dividing
    # all of HD, KD and ≤ 512.
    bc = D
    for cand in range(D, min(513, KD + 1), D):
        if HD % cand == 0 and KD % cand == 0 and cand % D == 0:
            bc = cand
    n_blocks = C // bc

    # bc divides both HD and KD, so every block lies entirely in one of the
    # q/k/v sections; the kernel resolves which via traced where() on
    # program_id (Mosaic can't branch statically per grid step).
    out = pl.pallas_call(
        functools.partial(_qkv_traced_kernel, eps=eps, n_heads=n_heads,
                          n_kv=n_kv, head_dim=D, block_c=bc),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, bc), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D // 2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D // 2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bc), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, E), x.dtype)],
        interpret=interpret,
    )(x, ln_w.reshape(1, E), wqkv, q_norm.reshape(1, D), k_norm.reshape(1, D),
      cos, sin)
    return out[:, :HD], out[:, HD:HD + KD], out[:, HD + KD:]


def _qkv_traced_kernel(x_ref, ln_ref, w_ref, qn_ref, kn_ref, cos_ref, sin_ref,
                       o_ref, xn_ref,
                       *, eps: float, n_heads: int, n_kv: int, head_dim: int,
                       block_c: int):
    """Fused QKV block kernel with the q/k/v section resolved by traced
    ``where`` (works for any grid step; the extra VPU work is negligible)."""
    j = pl.program_id(0)
    D = head_dim

    @pl.when(j == 0)
    def _init():
        xn_ref[:] = _rms_norm_f32(x_ref[:], ln_ref[0], eps).astype(xn_ref.dtype)

    y = jnp.dot(xn_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    B = y.shape[0]
    heads = block_c // D
    yh = y.reshape(B, heads, D)

    HD, KD = n_heads * D, n_kv * D
    c0 = j * block_c
    is_q = c0 < HD
    is_k = (c0 >= HD) & (c0 < HD + KD)
    needs_rope = is_q | is_k

    w_norm = jnp.where(is_q, qn_ref[0], kn_ref[0]).astype(jnp.float32)
    var = jnp.mean(yh * yh, axis=-1, keepdims=True)
    normed = yh * jax.lax.rsqrt(var + eps) * w_norm
    half = D // 2
    y1, y2 = normed[..., :half], normed[..., half:]
    cos = cos_ref[:].astype(jnp.float32)[:, None, :]
    sin = sin_ref[:].astype(jnp.float32)[:, None, :]
    roped = jnp.concatenate([y1 * cos - y2 * sin, y2 * cos + y1 * sin],
                            axis=-1)
    out = jnp.where(needs_rope, roped, yh)
    o_ref[:] = out.reshape(B, block_c).astype(o_ref.dtype)


def _qkv_stacked_kernel(l_ref, x_ref, ln_ref, w_ref, qn_ref, kn_ref,
                        cos_ref, sin_ref, o_ref, xn_ref,
                        *, eps: float, n_heads: int, n_kv: int,
                        head_dim: int, block_c: int):
    """Stacked-weight variant: weights arrive as (1, ...) blocks of the full
    [L, ...] parameter stacks, selected by the scalar-prefetched layer index
    in the BlockSpec index maps — the caller's ``lax.scan`` never slices a
    weight, so no per-layer copies are materialized."""
    del l_ref  # consumed by the index maps
    j = pl.program_id(0)
    D = head_dim

    @pl.when(j == 0)
    def _init():
        xn_ref[:] = _rms_norm_f32(x_ref[:], ln_ref[0, 0], eps).astype(xn_ref.dtype)

    y = jnp.dot(xn_ref[:], w_ref[0], preferred_element_type=jnp.float32)
    B = y.shape[0]
    heads = block_c // D
    yh = y.reshape(B, heads, D)

    HD, KD = n_heads * D, n_kv * D
    c0 = j * block_c
    is_q = c0 < HD
    needs_rope = c0 < HD + KD

    w_norm = jnp.where(is_q, qn_ref[0, 0], kn_ref[0, 0]).astype(jnp.float32)
    var = jnp.mean(yh * yh, axis=-1, keepdims=True)
    normed = yh * jax.lax.rsqrt(var + eps) * w_norm
    half = D // 2
    y1, y2 = normed[..., :half], normed[..., half:]
    cos = cos_ref[:].astype(jnp.float32)[:, None, :]
    sin = sin_ref[:].astype(jnp.float32)[:, None, :]
    roped = jnp.concatenate([y1 * cos - y2 * sin, y2 * cos + y1 * sin],
                            axis=-1)
    out = jnp.where(needs_rope, roped, yh)
    o_ref[:] = out.reshape(B, block_c).astype(o_ref.dtype)


def fused_qkv_stacked(x: jax.Array, ln_all: jax.Array, wqkv_all: jax.Array,
                      qn_all: jax.Array, kn_all: jax.Array,
                      cos: jax.Array, sin: jax.Array, layer: jax.Array,
                      *, n_heads: int, n_kv: int, head_dim: int,
                      eps: float = 1e-6, block_c: int | None = None,
                      interpret: bool | None = None
                      ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`fused_qkv` over layer-stacked weights, for use inside the
    model's ``lax.scan``: pass the FULL stacks ([L, E, C] etc.) plus the
    traced ``layer`` index; BlockSpec index maps pick the layer's blocks
    straight out of HBM (a sliced operand would force XLA to materialize a
    per-layer weight copy every step — measured 12% slower end-to-end)."""
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    D = head_dim
    HD, KD = n_heads * D, n_kv * D
    C = HD + 2 * KD
    L = wqkv_all.shape[0]
    assert wqkv_all.shape == (L, E, C), (wqkv_all.shape, (L, E, C))
    bc = block_c or D
    if block_c is None:
        # largest section-aligned block whose double-buffered weight slab
        # PLUS the batch-dependent residents (x block, xn scratch, rope
        # tables, full output stack alloc, double-buffered out block) stay
        # under the 16MB scoped-VMEM limit with margin. The batch term
        # matters: decode rows + a 128-wide prefill lane reach B=224, which
        # overflowed the old weights-only 9MB budget (r4 OOM at bc=1024).
        resident = B * (2 * E * 2 + D * 4) + B * C * 2
        for cand in range(D, min(2049, KD + 1), D):
            if (HD % cand == 0 and KD % cand == 0
                    and 2 * E * cand * 2 + 2 * B * cand * 2 + resident
                    <= 12 * 2**20):
                bc = cand
    n_blocks = C // bc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, E), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, bc), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D // 2), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D // 2), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bc), lambda j, l: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, E), x.dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_qkv_stacked_kernel, eps=eps, n_heads=n_heads,
                          n_kv=n_kv, head_dim=D, block_c=bc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x,
      ln_all.reshape(L, 1, E), wqkv_all,
      qn_all.reshape(L, 1, D), kn_all.reshape(L, 1, D), cos, sin)
    return out[:, :HD], out[:, HD:HD + KD], out[:, HD + KD:]


def _out_mlp_stacked_kernel(l_ref, a_ref, x_ref, wo_ref, ln_ref, wg_ref,
                            wu_ref, wd_ref, o_ref, x2_ref, xn_ref, acc_ref,
                            *, eps: float, n_wo_blocks: int, n_f_blocks: int):
    del l_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < n_wo_blocks)
    def _wo():
        y = jnp.dot(a_ref[:], wo_ref[0], preferred_element_type=jnp.float32)
        E = x2_ref.shape[1]
        eb = E // n_wo_blocks
        x2_ref[:, pl.ds(j * eb, eb)] = (
            x_ref[:, pl.ds(j * eb, eb)].astype(jnp.float32) + y
        ).astype(x2_ref.dtype)

    @pl.when(j == n_wo_blocks)
    def _norm():
        xn_ref[:] = _rms_norm_f32(x2_ref[:], ln_ref[0, 0], eps).astype(xn_ref.dtype)

    @pl.when(j > n_wo_blocks)
    def _mlp():
        xn = xn_ref[:]
        g = jnp.dot(xn, wg_ref[0], preferred_element_type=jnp.float32)
        u = jnp.dot(xn, wu_ref[0], preferred_element_type=jnp.float32)
        h = (jax.nn.silu(g) * u).astype(xn.dtype)
        acc_ref[:] += jnp.dot(h, wd_ref[0], preferred_element_type=jnp.float32)

    @pl.when(j == n_wo_blocks + n_f_blocks)
    def _fin():
        o_ref[:] = (x2_ref[:].astype(jnp.float32) + acc_ref[:]).astype(o_ref.dtype)


def fused_out_mlp_stacked(attn_out: jax.Array, x: jax.Array,
                          wo_all: jax.Array, ln_all: jax.Array,
                          gateup_all: jax.Array, wd_all: jax.Array,
                          layer: jax.Array, *, eps: float = 1e-6,
                          block: int = 256,
                          interpret: bool | None = None) -> jax.Array:
    """:func:`fused_out_mlp` over layer-stacked packed weights.

    wo_all: [L, H*D, E]; ln_all: [L, E]; gateup_all: [L, E, 2F] (the
    engine's packed gate|up layout); wd_all: [L, F, E]. The traced ``layer``
    index selects blocks via scalar prefetch — no per-layer weight slices.
    """
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    HD = attn_out.shape[1]
    L, _, F2 = gateup_all.shape
    F = F2 // 2
    # VMEM budget both ways (see _out_mlp_blocks): grow blocks for fewer
    # grid steps, shrink them for big models (qwen3-8b: E=4096, F=12288
    # would blow VMEM at fb=256 otherwise). A config the chooser cannot fit
    # must be rejected up front via fused_vmem_ok, never run oversized.
    choice = _out_mlp_blocks(E, F, HD, B)
    if choice is None:
        raise ValueError(
            f"fused_out_mlp_stacked cannot fit VMEM at E={E} F={F} HD={HD} "
            f"batch={B}; gate callers on fused_vmem_ok()")
    eb, fb = choice
    n_wo = E // eb
    n_f = F // fb
    grid = n_wo + 1 + n_f

    def wo_map(j, l):
        return (l[0], 0, jnp.minimum(j, n_wo - 1))

    def fblk(j):
        return jnp.clip(j - n_wo - 1, 0, n_f - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, HD), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, E), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD, eb), wo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, fb), lambda j, l: (l[0], 0, fblk(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, fb), lambda j, l: (l[0], 0, fblk(j) + n_f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb, E), lambda j, l: (l[0], fblk(j), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, E), lambda j, l: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, E), x.dtype),
            pltpu.VMEM((B, E), x.dtype),
            pltpu.VMEM((B, E), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_out_mlp_stacked_kernel, eps=eps, n_wo_blocks=n_wo,
                          n_f_blocks=n_f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, E), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), attn_out, x, wo_all,
      ln_all.reshape(L, 1, E), gateup_all, gateup_all, wd_all)


def _mlp_stacked_kernel(l_ref, x_ref, ln_ref, wg_ref, wu_ref, wd_ref, o_ref,
                        xn_ref, acc_ref, *, eps: float, n_blocks: int,
                        residual: bool, norm: bool):
    del l_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        if norm:
            xn_ref[:] = _rms_norm_f32(x_ref[:], ln_ref[0, 0], eps).astype(xn_ref.dtype)
        else:
            xn_ref[:] = x_ref[:].astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]
    g = jnp.dot(xn, wg_ref[0], preferred_element_type=jnp.float32)
    u = jnp.dot(xn, wu_ref[0], preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(xn.dtype)
    acc_ref[:] += jnp.dot(h, wd_ref[0], preferred_element_type=jnp.float32)

    @pl.when(j == n_blocks - 1)
    def _fin():
        base = x_ref[:].astype(jnp.float32) if residual else 0.0
        o_ref[:] = (base + acc_ref[:]).astype(o_ref.dtype)


def fused_mlp_stacked(x: jax.Array, ln_all: jax.Array, wg_all: jax.Array,
                      wu_all: jax.Array, wd_all: jax.Array, layer: jax.Array,
                      *, eps: float = 1e-6, residual: bool = True,
                      norm: bool = True,
                      interpret: bool | None = None) -> jax.Array:
    """:func:`fused_mlp` over layer-stacked weights with scalar-prefetched
    layer select: ``x + swiglu(rmsnorm(x, ln[l])) @ wd[l]`` (or without the
    residual when ``residual=False`` — e.g. MLA shared experts, whose
    output joins the routed sum before the residual add).

    x: [B, E]; ln_all: [L, E]; wg_all/wu_all: [L, E, F]; wd_all: [L, F, E].
    Used by the MLA family's dense-layer MLPs and shared experts
    (models/deepseek_v3.py), where attention is two-stage latent projections
    that stay on XLA einsums.
    """
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    L, _, F = wg_all.shape
    act_bytes = B * (E * 2 * 3 + E * 4)
    budget = 13 * 2**20 - act_bytes
    fb = None
    for cand in (768, 512, 384, 256, 128):
        if F % cand == 0 and 3 * 2 * E * cand * 2 <= budget:
            fb = cand
            break
    if fb is None:
        raise ValueError(
            f"fused_mlp_stacked cannot fit VMEM at E={E} F={F} batch={B}; "
            "gate callers on fused_mlp_vmem_ok()")
    n_blocks = F // fb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, E), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, fb), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, fb), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb, E), lambda j, l: (l[0], j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, E), lambda j, l: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, E), x.dtype),
            pltpu.VMEM((B, E), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_mlp_stacked_kernel, eps=eps, n_blocks=n_blocks,
                          residual=residual, norm=norm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, E), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, ln_all.reshape(L, 1, E),
      wg_all, wu_all, wd_all)


def fused_mlp_vmem_ok(E: int, F: int, batch: int) -> bool:
    """Gate for :func:`fused_mlp_stacked` block feasibility."""
    act_bytes = batch * (E * 2 * 3 + E * 4)
    budget = 13 * 2**20 - act_bytes
    return any(F % cand == 0 and 3 * 2 * E * cand * 2 <= budget
               for cand in (768, 512, 384, 256, 128))


def _qkv_stacked_kernel_i8(l_ref, x_ref, ln_ref, w_ref, s_ref, qn_ref,
                           kn_ref, cos_ref, sin_ref, o_ref, xn_ref,
                           *, eps: float, n_heads: int, n_kv: int,
                           head_dim: int, block_c: int):
    """int8-weight variant of :func:`_qkv_stacked_kernel`: the wqkv block
    streams as int8 (half the HBM bytes — decode's binding resource) and
    dequantizes on the fly via the per-output-channel scales block."""
    del l_ref
    j = pl.program_id(0)
    D = head_dim

    @pl.when(j == 0)
    def _init():
        xn_ref[:] = _rms_norm_f32(x_ref[:], ln_ref[0, 0], eps).astype(xn_ref.dtype)

    y = jnp.dot(xn_ref[:], w_ref[0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    y = y * s_ref[0, 0][None, :]
    B = y.shape[0]
    heads = block_c // D
    yh = y.reshape(B, heads, D)

    HD, KD = n_heads * D, n_kv * D
    c0 = j * block_c
    is_q = c0 < HD
    needs_rope = c0 < HD + KD

    w_norm = jnp.where(is_q, qn_ref[0, 0], kn_ref[0, 0]).astype(jnp.float32)
    var = jnp.mean(yh * yh, axis=-1, keepdims=True)
    normed = yh * jax.lax.rsqrt(var + eps) * w_norm
    half = D // 2
    y1, y2 = normed[..., :half], normed[..., half:]
    cos = cos_ref[:].astype(jnp.float32)[:, None, :]
    sin = sin_ref[:].astype(jnp.float32)[:, None, :]
    roped = jnp.concatenate([y1 * cos - y2 * sin, y2 * cos + y1 * sin],
                            axis=-1)
    out = jnp.where(needs_rope, roped, yh)
    o_ref[:] = out.reshape(B, block_c).astype(o_ref.dtype)


def fused_qkv_stacked_i8(x, ln_all, wqkv_q, wqkv_s, qn_all, kn_all, cos, sin,
                         layer, *, n_heads: int, n_kv: int, head_dim: int,
                         eps: float = 1e-6, interpret: bool | None = None):
    """:func:`fused_qkv_stacked` over int8 weight stacks
    (ops/quant.quantize_params layout: q [L, E, C] int8, scales
    [L, 1, C] f32)."""
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    D = head_dim
    HD, KD = n_heads * D, n_kv * D
    C = HD + 2 * KD
    L = wqkv_q.shape[0]
    bc = D
    resident = B * (2 * E * 2 + D * 4) + B * C * 2  # see bf16 chooser
    for cand in range(D, min(2049, KD + 1), D):
        if HD % cand == 0 and KD % cand == 0 \
                and (2 * E * cand + 2 * B * cand * 2 + resident
                     <= 12 * 2**20):               # int8 weights: 1 B/elem
            bc = cand
    n_blocks = C // bc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, E), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, bc), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bc), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D // 2), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D // 2), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bc), lambda j, l: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, E), x.dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_qkv_stacked_kernel_i8, eps=eps, n_heads=n_heads,
                          n_kv=n_kv, head_dim=D, block_c=bc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, ln_all.reshape(L, 1, E),
      wqkv_q, wqkv_s.reshape(L, 1, C).astype(jnp.float32),
      qn_all.reshape(L, 1, D), kn_all.reshape(L, 1, D), cos, sin)
    return out[:, :HD], out[:, HD:HD + KD], out[:, HD + KD:]


def _out_mlp_stacked_kernel_i8(l_ref, a_ref, x_ref, wo_ref, wos_ref, ln_ref,
                               wg_ref, wgs_ref, wu_ref, wus_ref, wd_ref,
                               wds_ref, o_ref, x2_ref, xn_ref, acc_ref,
                               *, eps: float, n_wo_blocks: int,
                               n_f_blocks: int):
    del l_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < n_wo_blocks)
    def _wo():
        y = jnp.dot(a_ref[:], wo_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        y = y * wos_ref[0, 0][None, :]
        E = x2_ref.shape[1]
        eb = E // n_wo_blocks
        x2_ref[:, pl.ds(j * eb, eb)] = (
            x_ref[:, pl.ds(j * eb, eb)].astype(jnp.float32) + y
        ).astype(x2_ref.dtype)

    @pl.when(j == n_wo_blocks)
    def _norm():
        xn_ref[:] = _rms_norm_f32(x2_ref[:], ln_ref[0, 0], eps).astype(xn_ref.dtype)

    @pl.when(j > n_wo_blocks)
    def _mlp():
        xn = xn_ref[:]
        g = jnp.dot(xn, wg_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * wgs_ref[0, 0][None, :]
        u = jnp.dot(xn, wu_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * wus_ref[0, 0][None, :]
        h = (jax.nn.silu(g) * u).astype(xn.dtype)
        y = jnp.dot(h, wd_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        acc_ref[:] += y * wds_ref[0, 0][None, :]

    @pl.when(j == n_wo_blocks + n_f_blocks)
    def _fin():
        o_ref[:] = (x2_ref[:].astype(jnp.float32) + acc_ref[:]).astype(o_ref.dtype)


def fused_out_mlp_stacked_i8(attn_out, x, wo_q, wo_s, ln_all, gateup_q,
                             gateup_s, wd_q, wd_s, layer, *,
                             eps: float = 1e-6,
                             interpret: bool | None = None):
    """:func:`fused_out_mlp_stacked` over int8 weight stacks with on-the-fly
    dequant. wo_q: [L, HD, E] int8 + wo_s [L, 1, E]; gateup_q: [L, E, 2F]
    + gateup_s [L, 1, 2F]; wd_q: [L, F, E] + wd_s [L, 1, E]."""
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    HD = attn_out.shape[1]
    L, _, F2 = gateup_q.shape
    F = F2 // 2
    act_bytes = B * (HD * 2 + E * 2 * 4 + E * 4)
    budget = 13 * 2**20 - act_bytes
    eb = None
    for cand in (512, 384, 256, 128):
        if E % cand == 0 and 2 * HD * cand <= max(budget // 4, 1):
            eb = cand
            break
    fb = None
    if eb is not None:
        for cand in (768, 512, 384, 256, 128):
            if F % cand == 0 and 3 * E * cand <= budget - 2 * HD * eb:
                fb = cand
                break
    if eb is None or fb is None:
        raise ValueError(
            f"fused_out_mlp_stacked_i8 cannot fit VMEM at E={E} F={F} "
            f"HD={HD} batch={B}")
    n_wo = E // eb
    n_f = F // fb
    grid = n_wo + 1 + n_f

    def wo_map(j, l):
        return (l[0], 0, jnp.minimum(j, n_wo - 1))

    def fblk(j):
        return jnp.clip(j - n_wo - 1, 0, n_f - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, HD), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, E), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD, eb), wo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, eb),
                         lambda j, l: (l[0], 0, jnp.minimum(j, n_wo - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, fb), lambda j, l: (l[0], 0, fblk(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, fb), lambda j, l: (l[0], 0, fblk(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, fb), lambda j, l: (l[0], 0, fblk(j) + n_f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, fb), lambda j, l: (l[0], 0, fblk(j) + n_f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb, E), lambda j, l: (l[0], fblk(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, E), lambda j, l: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, E), x.dtype),
            pltpu.VMEM((B, E), x.dtype),
            pltpu.VMEM((B, E), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_out_mlp_stacked_kernel_i8, eps=eps,
                          n_wo_blocks=n_wo, n_f_blocks=n_f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, E), x.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), attn_out, x,
      wo_q, wo_s.reshape(L, 1, E).astype(jnp.float32),
      ln_all.reshape(L, 1, E),
      gateup_q, gateup_s.reshape(L, 1, F2).astype(jnp.float32),
      gateup_q, gateup_s.reshape(L, 1, F2).astype(jnp.float32),
      wd_q, wd_s.reshape(L, 1, E).astype(jnp.float32))


def fused_i8_vmem_ok(cfg, batch: int) -> bool:
    """Gate for the int8 fused decode kernels (dense family)."""
    E, F = cfg.hidden, cfg.intermediate
    HD = cfg.n_heads * cfg.head_dim
    act_bytes = batch * (HD * 2 + E * 2 * 4 + E * 4)
    budget = 13 * 2**20 - act_bytes
    eb = next((c for c in (512, 384, 256, 128)
               if E % c == 0 and 2 * HD * c <= max(budget // 4, 1)), None)
    if eb is None:
        return False
    return any(F % c == 0 and 3 * E * c <= budget - 2 * HD * eb
               for c in (768, 512, 384, 256, 128))


def _out_router_stacked_kernel(l_ref, a_ref, x_ref, wo_ref, ln_ref, r_ref,
                               x2_ref, hn_ref, rl_ref,
                               *, eps: float, n_wo_blocks: int):
    """MoE layer back half, pre-experts: x2 = x + a@wo[l], hn = rmsnorm(x2),
    router logits = hn @ router[l]. The expert FFN itself stays outside
    (ragged_dot) — this kernel removes the wo/residual/norm/router small-op
    chain from the per-layer schedule."""
    del l_ref
    j = pl.program_id(0)

    @pl.when(j < n_wo_blocks)
    def _wo():
        y = jnp.dot(a_ref[:], wo_ref[0], preferred_element_type=jnp.float32)
        E = x2_ref.shape[1]
        eb = E // n_wo_blocks
        x2_ref[:, pl.ds(j * eb, eb)] = (
            x_ref[:, pl.ds(j * eb, eb)].astype(jnp.float32) + y
        ).astype(x2_ref.dtype)

    @pl.when(j == n_wo_blocks)
    def _norm_route():
        hn = _rms_norm_f32(x2_ref[:], ln_ref[0, 0], eps)
        hn_ref[:] = hn.astype(hn_ref.dtype)
        rl_ref[:] = jnp.dot(hn.astype(jnp.bfloat16), r_ref[0],
                            preferred_element_type=jnp.float32)


def fused_out_router_stacked(attn_out: jax.Array, x: jax.Array,
                             wo_all: jax.Array, ln_all: jax.Array,
                             router_all: jax.Array, layer: jax.Array,
                             *, eps: float = 1e-6,
                             interpret: bool | None = None
                             ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """MoE attention back half over layer-stacked weights.

    attn_out: [B, H*D]; x: [B, E]; wo_all: [L, H*D, E]; ln_all: [L, E];
    router_all: [L, E, NE]. Returns (x2 [B,E], hn [B,E] — the expert FFN
    input, router_logits [B,NE] f32). Layer blocks picked by scalar
    prefetch, same scheme as :func:`fused_out_mlp_stacked`.
    """
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    HD = attn_out.shape[1]
    L, _, NE = router_all.shape
    act_bytes = B * (HD * 2 + E * 2 * 3 + NE * 4)
    budget = 13 * 2**20 - act_bytes - 2 * E * NE * 2  # router slab resident
    eb = None
    for cand in (512, 384, 256, 128):
        if E % cand == 0 and 2 * HD * cand * 2 <= max(budget, 1):
            eb = cand
            break
    if eb is None:
        raise ValueError(
            f"fused_out_router_stacked cannot fit VMEM at E={E} HD={HD} "
            f"NE={NE} batch={B}; gate callers on fused_moe_vmem_ok()")
    n_wo = E // eb
    grid = n_wo + 1

    def wo_map(j, l):
        return (l[0], 0, jnp.minimum(j, n_wo - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, HD), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, E), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD, eb), wo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, NE), lambda j, l: (l[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, E), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, E), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, NE), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_out_router_stacked_kernel, eps=eps,
                          n_wo_blocks=n_wo),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, E), x.dtype),
                   jax.ShapeDtypeStruct((B, E), x.dtype),
                   jax.ShapeDtypeStruct((B, NE), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), attn_out, x, wo_all,
      ln_all.reshape(L, 1, E), router_all)


def fused_moe_vmem_ok(cfg, batch: int) -> bool:
    """Auto-enable gate for the MoE fused attention kernels (qkv + wo/
    router). The expert FFN stays on ragged_dot, so only the attention-side
    slabs need to fit."""
    E = cfg.hidden
    HD = cfg.n_heads * cfg.head_dim
    NE = cfg.n_experts
    act_bytes = batch * (HD * 2 + E * 2 * 3 + NE * 4)
    budget = 13 * 2**20 - act_bytes - 2 * E * NE * 2
    return any(E % cand == 0 and 2 * HD * cand * 2 <= max(budget, 1)
               for cand in (512, 384, 256, 128))


def _out_mlp_kernel(a_ref, x_ref, wo_ref, ln_ref, wg_ref, wu_ref, wd_ref,
                    o_ref, x2_ref, xn_ref, acc_ref,
                    *, eps: float, n_wo_blocks: int, n_f_blocks: int):
    """Back half of a decoder layer: x2 = x + a@wo, then the fused MLP.

    Grid is (n_wo_blocks + 1 + n_f_blocks): first the wo column blocks
    accumulate x2; one barrier step computes the rmsnorm (needs all of x2);
    then the MLP F blocks run. Index maps keep unused operands pinned to
    block 0 during the other phase (cheap: their blocks are already
    resident)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # --- phase 1: wo column block j → x2 columns ---
    @pl.when(j < n_wo_blocks)
    def _wo():
        y = jnp.dot(a_ref[:], wo_ref[:], preferred_element_type=jnp.float32)
        E = x2_ref.shape[1]
        eb = E // n_wo_blocks
        x2_ref[:, pl.ds(j * eb, eb)] = (
            x_ref[:, pl.ds(j * eb, eb)].astype(jnp.float32) + y
        ).astype(x2_ref.dtype)

    # --- phase boundary: full-row rmsnorm of x2 ---
    @pl.when(j == n_wo_blocks)
    def _norm():
        xn_ref[:] = _rms_norm_f32(x2_ref[:], ln_ref[0], eps).astype(xn_ref.dtype)

    # --- phase 2: MLP F block ---
    @pl.when(j > n_wo_blocks)
    def _mlp():
        xn = xn_ref[:]
        g = jnp.dot(xn, wg_ref[:], preferred_element_type=jnp.float32)
        u = jnp.dot(xn, wu_ref[:], preferred_element_type=jnp.float32)
        h = (jax.nn.silu(g) * u).astype(xn.dtype)
        acc_ref[:] += jnp.dot(h, wd_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == n_wo_blocks + n_f_blocks)
    def _fin():
        o_ref[:] = (x2_ref[:].astype(jnp.float32) + acc_ref[:]).astype(o_ref.dtype)


def fused_out_mlp(attn_out: jax.Array, x: jax.Array, wo: jax.Array,
                  ln_w: jax.Array, w_gate: jax.Array, w_up: jax.Array,
                  w_down: jax.Array, *, eps: float = 1e-6,
                  packed_gateup: bool = False,
                  interpret: bool | None = None) -> jax.Array:
    """x + attn_out@wo, then + swiglu(rmsnorm(·)) @ w_down — one kernel.

    attn_out: [B, H*D]; x: [B, E]; wo: [H*D, E]; w_gate/w_up: [E, F];
    w_down: [F, E]. With ``packed_gateup`` pass the engine's packed
    ``w_gateup`` [E, 2F] as BOTH w_gate and w_up — the up-projection's
    index map reads the upper F columns of the same array, so the packed
    layout streams without materializing split copies.
    """
    if interpret is None:
        from ..utils import is_tpu_backend

        interpret = not is_tpu_backend()
    B, E = x.shape
    HD = attn_out.shape[1]
    F = w_gate.shape[1] // (2 if packed_gateup else 1)
    eb = _pick_block(E)
    fb = _pick_block(F)
    n_wo = E // eb
    n_f = F // fb
    grid = n_wo + 1 + n_f
    up_off = n_f if packed_gateup else 0

    def wo_map(j):
        return (0, jnp.minimum(j, n_wo - 1))

    def fblk(j):
        jj = jnp.clip(j - n_wo - 1, 0, n_f - 1)
        return jj

    return pl.pallas_call(
        functools.partial(_out_mlp_kernel, eps=eps, n_wo_blocks=n_wo,
                          n_f_blocks=n_f),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, HD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, eb), wo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, fb), lambda j: (0, fblk(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, fb), lambda j: (0, fblk(j) + up_off),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, E), lambda j: (fblk(j), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, E), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, E), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, E), x.dtype),
            pltpu.VMEM((B, E), x.dtype),
            pltpu.VMEM((B, E), jnp.float32),
        ],
        interpret=interpret,
    )(attn_out, x, wo, ln_w.reshape(1, E), w_gate, w_up, w_down)
