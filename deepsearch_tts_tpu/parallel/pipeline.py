"""Pipeline parallelism: GPipe-style microbatch scheduling over a ``pp``
mesh axis, TPU-native (shard_map + ``ppermute`` activation hand-off).

SURVEY.md §2.3 lists PP among the parallelism modes a complete framework
needs (the reference has none of its own — it rents inference). The
TPU-idiomatic formulation: layers stack on a leading dim, each pipeline
stage owns a contiguous slice of that stack (sharded over ``pp``), and
activations flow stage-to-stage over ICI via ``ppermute`` while M
microbatches stream through. Every device executes the same SPMD program;
the classic (S-1)/M pipeline bubble shows up as masked compute instead of
idle time, which costs the same wall-clock and keeps XLA's scheduler
simple. Autodiff flows through ``ppermute``/``psum``, so the same function
trains (the backward pass is the reverse pipeline).

Composable with dp/fsdp/tp on the remaining mesh axes: inside shard_map
only the layer dim and the flow of activations are manual; matmuls inside
a stage still carry their logical shardings.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    layer_params,            # pytree; every leaf has leading dim L (layers)
    x: jax.Array,            # [B, T, E] activations entering layer 0
    block_fn,                # (lp_single_layer, x) -> x, one decoder layer
    *,
    mesh: Mesh,
    axis: str = "pp",
    n_microbatches: int | None = None,
) -> jax.Array:
    """Run ``block_fn`` over all L layers with layers sharded over ``axis``.

    ``n_microbatches`` defaults to the pipeline depth (bubble fraction
    (S-1)/(M+S-1) = 50% — raise it to amortize). B must divide by it.
    """
    S = mesh.shape[axis]
    L = jax.tree.leaves(layer_params)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} layers not divisible by {S} pipeline stages")
    M = n_microbatches or S
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")

    xs = x.reshape((M, B // M) + x.shape[1:])           # [M, b, T, E]

    def local(lp, xs):
        # lp: this stage's [L/S, ...] layer slice; xs replicated over pp
        s = jax.lax.axis_index(axis)
        is_first = s == 0
        is_last = s == S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def run_stage(h):
            def body(h, lp_one):
                return block_fn(lp_one, h), None
            h, _ = jax.lax.scan(body, h, lp)
            return h

        buf = jnp.zeros_like(xs[0])                     # inter-stage register
        outs = jnp.zeros_like(xs)

        def step(t, carry):
            buf, outs = carry
            mb = t - s                                   # my microbatch index
            active = (mb >= 0) & (mb < M)
            # stage 0 reads fresh microbatches; others read the handed-off
            # activation from the previous stage
            fresh = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(mb, 0, M - 1), keepdims=False)
            h_in = jnp.where(is_first, fresh, buf)
            h_out = run_stage(h_in)
            h_out = jnp.where(active, h_out, buf)
            # last stage banks its finished microbatch
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(active & is_last,
                          h_out,
                          jax.lax.dynamic_index_in_dim(
                              outs, jnp.clip(mb, 0, M - 1), keepdims=False)),
                jnp.clip(mb, 0, M - 1), axis=0)
            # hand my activation to the next stage over ICI
            buf = jax.lax.ppermute(h_out, axis, perm)
            return buf, outs

        buf, outs = jax.lax.fori_loop(0, M + S - 1, step, (buf, outs))
        # replicate the last stage's outputs to every stage (grads flow back
        # through this psum into the pipeline)
        outs = jax.lax.psum(
            jnp.where(is_last, outs, jnp.zeros_like(outs)), axis)
        return outs

    spec_layers = jax.tree.map(lambda _: P(axis), layer_params)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_layers, P()), out_specs=P(),
        check_vma=False,
    )(layer_params, xs)
    return out.reshape((B,) + x.shape[1:])


def make_pp_forward(cfg, *, mesh: Mesh, axis: str = "pp",
                    n_microbatches: int | None = None):
    """Dense-family (models/qwen3.py) training forward with the layer stack
    pipelined over ``axis``: embed and the LM head run replicated; the L
    decoder blocks stream microbatches through the pipeline."""
    from ..models.common import rms_norm, rope_angles
    from ..models.qwen3 import _block
    from ..ops import attention as attn_ops

    def forward(params, cfg_, tokens, positions):
        x = jnp.take(params["embed"], tokens, axis=0)
        # one broadcastable [1, T, half] table: training positions are the
        # same per row, and microbatches slice the batch dim only
        cos, sin = rope_angles(jnp.maximum(positions[:1], 0), cfg_.head_dim,
                               cfg_.rope_theta)

        def block_fn(lp, h):
            def attend(q, k, v):
                return attn_ops.causal_attention(q, k, v)
            return _block(cfg_, lp, h, cos, sin, attend)

        x = pipeline_apply(params["layers"], x, block_fn, mesh=mesh,
                           axis=axis, n_microbatches=n_microbatches)
        x = rms_norm(x, params["final_norm"], cfg_.rms_eps)
        head = params.get("lm_head")
        if head is None:
            head = params["embed"].T
        logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
        return logits, None

    return forward
