"""Ulysses (DeepSpeed-style) sequence-parallel attention via all-to-all.

The second SP strategy next to ops/ring_attention.py (SURVEY.md §2.3 marks
SP ABSENT in the reference — it truncates long contexts instead). Where
ring attention keeps heads whole and rotates K/V blocks around the ICI
ring (n-1 hops, compute/comm overlapped per block), Ulysses re-partitions
with two ``all_to_all`` collectives: sequence-sharded q/k/v become
head-sharded with the FULL sequence local, one ordinary causal attention
runs per device, and a second all_to_all restores sequence sharding.

Tradeoff on TPU: Ulysses moves each token's activations twice over ICI
(2 x B*T*H*D/n elements) regardless of context, while ring moves K/V
(n-1) times but overlaps the transfer behind block compute; Ulysses wins
when heads are plentiful and per-block compute is too small to hide the
ring's latency (short-ish chunks, many devices), ring wins at very long
context. Both are exposed through ``ops.attention.causal_attention``
(impl="ring" | "ulysses") and the engine's long-prefill routing
(``sp_impl``).

GQA: with Kh kv heads on n devices, kv all_to_all needs Kh % n == 0;
otherwise (n % Kh == 0) kv heads are all-gathered and each device slices
the one head its query-head group reads — the standard Ulysses KV
replication for GQA/MQA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ulysses_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    *, mesh: Mesh, axis: str = "tp", scale: float | None = None,
    inner_impl: str = "xla",
) -> jax.Array:
    """Causal attention with q/k/v sequence-sharded over ``axis``.

    q: [B, T, H, D] (global T, sharded on dim 1); k/v: [B, T, Kh, D].
    Returns [B, T, H, D] with the same sharding. Requires H % n == 0 and
    Kh % n == 0 or n % Kh == 0.
    """
    from jax import shard_map

    from . import attention as attn_ops

    D = q.shape[-1]
    scale = scale if scale is not None else D ** -0.5
    n = mesh.shape[axis]
    H, Kh = q.shape[2], k.shape[2]
    if H % n:
        raise ValueError(f"ulysses: n_heads {H} not divisible by mesh axis {n}")
    if Kh % n and n % Kh:
        raise ValueError(f"ulysses: kv heads {Kh} incompatible with axis {n}")

    def local(qc, kc, vc):
        # qc: [B, Tc, H, D] local sequence shard
        B, Tc, _, _ = qc.shape
        i = jax.lax.axis_index(axis)

        # seq-sharded -> head-sharded with full sequence: split the head
        # dim n ways, concatenate the exchanged shards along sequence
        qh = jax.lax.all_to_all(qc, axis, split_axis=2, concat_axis=1,
                                tiled=True)            # [B, T, H/n, D]
        if Kh % n == 0:
            kh = jax.lax.all_to_all(kc, axis, split_axis=2, concat_axis=1,
                                    tiled=True)        # [B, T, Kh/n, D]
            vh = jax.lax.all_to_all(vc, axis, split_axis=2, concat_axis=1,
                                    tiled=True)
        else:
            # n % Kh == 0: gather every kv head, keep the one this query
            # group reads (GQA group of head block i is i // (n // Kh))
            kg = jax.lax.all_gather(kc, axis, axis=1, tiled=True)
            vg = jax.lax.all_gather(vc, axis, axis=1, tiled=True)
            hd = i // (n // Kh)
            kh = jax.lax.dynamic_slice_in_dim(kg, hd, 1, axis=2)
            vh = jax.lax.dynamic_slice_in_dim(vg, hd, 1, axis=2)
        out = attn_ops.causal_attention(qh, kh, vh, scale=scale,
                                        impl=inner_impl)
        # head-sharded -> seq-sharded: inverse all_to_all
        return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2,
                                  tiled=True)          # [B, Tc, H, D]

    spec = P(None, axis, None, None)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
