"""Decode paged-attention microbenchmark (run solo on the TPU).

Isolates the per-step attention cost that dominates decode (micro_decode
r3: attention is 8.2ms of an 11.8ms step at table 512): a scan over
n_layers attention calls with a data dependency (q fed from the previous
output) so XLA cannot hoist anything. One JSON line per variant.

Variants: xla (gather), grid (pallas (B,P) kernel), grid_clamp (same, but
beyond-seq index maps repeat the previous page id so Mosaic elides the
DMA — per-row exact reads), stream (per-row DMA pipeline kernel).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepsearch_tts_tpu.ops import attention as attn_ops
from deepsearch_tts_tpu.ops.paged_attention import (
    pallas_paged_attention,
    pallas_paged_decode,
)

B = int(os.environ.get("MA_BATCH", 64))
K = int(os.environ.get("MA_KV", 8))
G = int(os.environ.get("MA_GROUP", 2))
D = int(os.environ.get("MA_D", 128))
PS = int(os.environ.get("MA_PS", 64))
P = int(os.environ.get("MA_PAGES", 4))        # table width (pages)
CTX = int(os.environ.get("MA_CTX", 192))      # valid tokens per row
L = int(os.environ.get("MA_LAYERS", 28))
STEPS = int(os.environ.get("MA_STEPS", 8))
H = K * G

rng = np.random.default_rng(0)
N = B * P + 1
k_pages = jnp.asarray(rng.standard_normal((N, PS, K, D)) * 0.1, jnp.bfloat16)
v_pages = jnp.asarray(rng.standard_normal((N, PS, K, D)) * 0.1, jnp.bfloat16)
tables = np.zeros((B, P), np.int32)
pg = 1
for b in range(B):
    for i in range(P):
        tables[b, i] = pg
        pg += 1
tables = jnp.asarray(tables)
seq_lens = jnp.full((B,), CTX, jnp.int32)
q_pos = jnp.full((B, 1), CTX - 1, jnp.int32)
q0 = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.1, jnp.bfloat16)


def timeit(name, fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / n / STEPS
    per_layer_us = dt / L * 1e6
    print(json.dumps({"what": name, "ms_per_step": round(dt * 1000, 3),
                      "us_per_layer": round(per_layer_us, 1),
                      "toks_per_s_if_step": round(B / dt, 1)}), flush=True)


def make_scan(attend):
    @jax.jit
    def run(q):
        def step(q, _):
            def layer(l, qq):
                out = attend(qq)
                # cheap data dependency: feed q from the output so neither
                # layers nor steps can be hoisted/de-duplicated
                return (qq + out.astype(qq.dtype) * 0.001)
            q = jax.lax.fori_loop(0, L, layer, q)
            return q, None
        q, _ = jax.lax.scan(step, q, None, length=STEPS)
        return q
    return run


variants = {}

variants["xla"] = make_scan(lambda q: attn_ops.paged_attention(
    q, k_pages, v_pages, tables, seq_lens, q_pos, impl="xla"))

variants["grid"] = make_scan(lambda q: pallas_paged_attention(
    q, k_pages, v_pages, tables, seq_lens, q_pos))

variants["stream"] = make_scan(lambda q: pallas_paged_decode(
    q, k_pages, v_pages, tables, seq_lens))


# ---- grid_clamp: (B, P) grid whose k/v index maps clamp the page index at
# the row's last used page — Mosaic skips the DMA when the block index is
# unchanged, so beyond-seq pages cost nothing ----
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NEG_INF = -1e30


def _clamp_kernel(tables_ref, lens_ref, used_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, scale, ps, n_kv, group):
    b = pl.program_id(0)
    p = pl.program_id(1)
    np_ = pl.num_programs(1)

    @pl.when(p == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = lens_ref[b]

    @pl.when(p * ps < seq_len)
    def _compute():
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        kf = k.reshape(ps * n_kv, -1)
        vf = v.reshape(ps * n_kv, -1)
        s = jax.lax.dot_general(q, kf, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        row_kv = (row_ids // group) % n_kv
        col_kv = col_ids % n_kv
        tok_pos = p * ps + col_ids // n_kv
        mask = (col_kv == row_kv) & (tok_pos < seq_len)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m_ref[:], jnp.max(s, axis=1, keepdims=True))
        pexp = jnp.exp(s - m_new)
        alpha = jnp.exp(m_ref[:] - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(pexp, axis=1, keepdims=True)
        pv = jax.lax.dot_general(pexp, vf, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(p == np_ - 1)
    def _fin():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def clamp_attention(q, k_pages, v_pages, page_table, seq_lens):
    Bq, T, Hq, Dq = q.shape
    Np, ps, Kq, _ = k_pages.shape
    Pq = page_table.shape[1]
    Gq = Hq // Kq
    scale = Dq ** -0.5
    qf = q.reshape(Bq, T, Kq, Gq, Dq).reshape(Bq, Hq, Dq)
    used = jnp.maximum((seq_lens + ps - 1) // ps, 1)   # pages actually read

    def page_map(b, p, tables, lens, used):
        # clamp at the row's last used page: repeated block index ⇒ no DMA
        idx = b * Pq + jnp.minimum(p, used[b] - 1)
        return (tables[idx], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Bq, Pq),
        in_specs=[
            pl.BlockSpec((1, Hq, Dq), lambda b, p, *r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps, Kq, Dq), page_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps, Kq, Dq), page_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, Dq), lambda b, p, *r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hq, 1), jnp.float32),
            pltpu.VMEM((Hq, 1), jnp.float32),
            pltpu.VMEM((Hq, Dq), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_clamp_kernel, scale=scale, ps=ps, n_kv=Kq,
                          group=Gq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bq, Hq, Dq), q.dtype),
        interpret=False,
    )(page_table.reshape(-1), seq_lens, used, qf, k_pages, v_pages)
    return out.reshape(Bq, 1, Hq, Dq)


variants["grid_clamp"] = make_scan(lambda q: clamp_attention(
    q, k_pages, v_pages, tables, seq_lens))


# ---- slot-cache variants: contiguous pool [L*B, SLOT_LEN, K, D], batch row
# == pool row. slot_xla = the engine's dynamic-slice + masked attention at
# the context bucket; slot_pal = ops/slot_attention.py multi-row streaming
# kernel with per-row-block clamping ----
SLOT_LEN = int(os.environ.get("MA_SLOT_LEN", 512))
BUCKET = int(os.environ.get("MA_BUCKET", 192))


def _make_slot_pool(seed: int):
    # device-side fill (a 3-4GB host randn would dominate startup)
    shape = (L * B, SLOT_LEN, K, D)

    @jax.jit
    def make():
        i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        j = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
        return (((i * 31 + j * 7 + seed) % 13) - 6).astype(jnp.bfloat16) * 0.05

    return make()


def _add_slot_variants():
    from deepsearch_tts_tpu.ops.slot_attention import slot_attention

    kpool = _make_slot_pool(0)
    vpool = _make_slot_pool(5)

    def slot_xla(qq, l, kpf, vpf):
        k_ctx = jax.lax.dynamic_slice_in_dim(kpf, l * B, B, 0)[:, :BUCKET]
        v_ctx = jax.lax.dynamic_slice_in_dim(vpf, l * B, B, 0)[:, :BUCKET]
        return attn_ops.masked_context_attention(
            qq, k_ctx, v_ctx, seq_lens, q_pos)

    def slot_pal(qq, l, kpf, vpf):
        lim = jnp.minimum(seq_lens, q_pos[:, 0] + 1)
        return slot_attention(qq[:, 0], kpf, vpf, lim, l, n_rows=B,
                              slot_ctx=BUCKET)[:, None]

    def make_scan_kv(attend):
        # pools ride as jit ARGUMENTS — closure capture would embed the
        # multi-GB pools as program constants (a full re-upload per remote
        # compile through the axon tunnel)
        @jax.jit
        def run(q, kpf, vpf):
            def step(q, _):
                def layer(l, qq):
                    out = attend(qq, l, kpf, vpf)
                    return qq + out.astype(qq.dtype) * 0.001
                return jax.lax.fori_loop(0, L, layer, q), None
            q, _ = jax.lax.scan(step, q, None, length=STEPS)
            return q

        return lambda q: run(q, kpool, vpool)

    variants["slot_xla"] = make_scan_kv(slot_xla)
    variants["slot_pal"] = make_scan_kv(slot_pal)


if os.environ.get("MA_SLOT"):
    _add_slot_variants()


if __name__ == "__main__":
    print(json.dumps({"what": "start"}), flush=True)
    only = os.environ.get("MA_ONLY")
    # correctness check vs xla first (single call)
    ref = jax.jit(functools.partial(
        attn_ops.paged_attention, impl="xla"))(
            q0, k_pages, v_pages, tables, seq_lens, q_pos)
    print(json.dumps({"what": "ref_done"}), flush=True)
    for name in (only.split(",") if only else variants):
        if name != "xla" and not name.startswith("slot_"):
            if name == "grid":
                got = jax.jit(pallas_paged_attention)(
                    q0, k_pages, v_pages, tables, seq_lens, q_pos)
            elif name == "stream":
                got = jax.jit(pallas_paged_decode)(
                    q0, k_pages, v_pages, tables, seq_lens)
            elif name == "grid_clamp":
                got = jax.jit(clamp_attention)(
                    q0, k_pages, v_pages, tables, seq_lens)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(json.dumps({"what": f"check_{name}", "max_err": err}),
                  flush=True)
        timeit(f"{name} B={B} ctx={CTX} P={P} ps={PS}",
               functools.partial(variants[name], q0))
