"""Mixture-of-Experts routing, dispatch, and expert compute.

No reference counterpart exists (the reference consumes hosted MoE models —
qwen3-235b-a22b, kimi-k2 — over HTTP; SURVEY.md §2.2/§2.3 marks EP ABSENT).
Two TPU-native dispatch strategies:

* :func:`moe_ragged`  — sort-by-expert + ``lax.ragged_dot`` grouped matmul.
  Static shapes (S = tokens·top_k assignment slots), one stable sort, three
  ragged matmuls. The fast single-slice path: no one-hot tensors, MXU work
  proportional to actual assignments.
* :func:`moe_capacity` — GShard-style capacity-bounded one-hot dispatch/
  combine einsums. Shardable by annotating the expert axis over the ``ep``
  mesh axis (XLA inserts the all-to-alls); tokens over capacity are dropped
  (standard capacity-factor semantics). Used for expert-parallel execution
  and as the reference implementation in tests.

Routing follows the Qwen3-MoE convention: softmax over router logits,
top-k, optional renormalization of the selected probabilities
(``norm_topk_prob``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def route_topk(router_logits: jax.Array, top_k: int, norm_topk_prob: bool = True
               ) -> tuple[jax.Array, jax.Array]:
    """[T, E_exp] logits → (probs [T, k], expert ids [T, k])."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_p, top_e = jax.lax.top_k(probs, top_k)
    if norm_topk_prob:
        top_p = top_p / jnp.maximum(jnp.sum(top_p, axis=-1, keepdims=True), 1e-9)
    return top_p, top_e.astype(jnp.int32)


def _is_quant(w) -> bool:
    return isinstance(w, dict) and "q" in w


def _expert_dot(xe: jax.Array, w) -> jax.Array:
    """Batched per-expert matmul ``[e,c,d] @ [e,d,f] -> [e,c,f]`` (f32 out).

    int8 ``{q, scales}`` weights keep the int8 operand on the MXU and fold
    the per-channel dequant into the f32 accumulator (no bf16
    materialization of w) — the expert analog of ops.quant.int8_matmul."""
    dims = (((2,), (1,)), ((0,), (0,)))
    if _is_quant(w):
        acc = jax.lax.dot_general(xe.astype(jnp.bfloat16), w["q"], dims,
                                  preferred_element_type=jnp.float32)
        return acc * w["scales"].astype(jnp.float32)   # [e,1,f] broadcast
    return jax.lax.dot_general(xe, w, dims, preferred_element_type=jnp.float32)


def _expert_ffn_blocked(x_sorted, w_gate, w_up, w_down, group_sizes,
                        capacity_factor: float = 2.0):
    """Grouped SwiGLU for int8 expert weights: ``lax.ragged_dot`` has no
    int8 path, so expert-sorted rows are scattered into fixed
    ``[n_exp, cap]`` blocks and run through batched int8 matmuls with fused
    dequant. Rows beyond an expert's capacity are dropped (standard
    capacity-factor semantics; cap defaults to 2x the balanced load)."""
    S, E = x_sorted.shape
    n = group_sizes.shape[0]
    cap = -(-int(capacity_factor * S) // int(n))
    cap = max(8, -(-cap // 8) * 8)
    ends = jnp.cumsum(group_sizes)
    rows = jnp.arange(S, dtype=jnp.int32)
    eid = jnp.searchsorted(ends, rows, side="right").astype(jnp.int32)
    pos = rows - (ends - group_sizes)[jnp.clip(eid, 0, n - 1)]
    in_cap = pos < cap
    xe = jnp.zeros((n, cap, E), x_sorted.dtype).at[
        eid, jnp.where(in_cap, pos, cap)].set(x_sorted, mode="drop")
    g = _expert_dot(xe, w_gate)
    u = _expert_dot(xe, w_up)
    h = (jax.nn.silu(g) * u).astype(x_sorted.dtype)
    y = _expert_dot(h, w_down)                                  # [n,cap,E] f32
    out = y[eid, jnp.clip(pos, 0, cap - 1)]
    return jnp.where(in_cap[:, None], out, 0.0).astype(x_sorted.dtype)


def _expert_ffn_ragged(x_sorted, w_gate, w_up, w_down, group_sizes):
    """Grouped SwiGLU over expert-sorted rows via ragged_dot (bf16) or the
    blocked int8 path (quantized expert weights).

    ``w_up=None`` means ``w_gate`` is the packed [n_exp, E, 2F] gate|up
    layout (engine.pack_weights) — one ragged_dot covers both projections.
    """
    if _is_quant(w_gate):
        return _expert_ffn_blocked(x_sorted, w_gate, w_up, w_down, group_sizes)
    if w_up is None:
        F = w_down.shape[1]
        gu = jax.lax.ragged_dot(x_sorted, w_gate, group_sizes)
        g, u = gu[:, :F], gu[:, F:]
    else:
        g = jax.lax.ragged_dot(x_sorted, w_gate, group_sizes)
        u = jax.lax.ragged_dot(x_sorted, w_up, group_sizes)
    h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x_sorted.dtype)
    return jax.lax.ragged_dot(h, w_down, group_sizes)


def moe_ragged(
    x: jax.Array,        # [T, E] tokens (flattened batch)
    router_w: jax.Array | None,  # [E, n_exp]; None with router_logits given
    w_gate: jax.Array,    # [n_exp, E, F], or packed [n_exp, E, 2F] w_up=None
    w_up: jax.Array | None,  # [n_exp, E, F]
    w_down: jax.Array,    # [n_exp, F, E]
    top_k: int,
    norm_topk_prob: bool = True,
    router_logits: jax.Array | None = None,  # [T, n_exp] precomputed (fused)
) -> jax.Array:
    T, E = x.shape
    if router_logits is None:
        router_logits = jnp.dot(x, router_w, preferred_element_type=jnp.float32)
    n_exp = router_logits.shape[1]
    top_p, top_e = route_topk(router_logits, top_k, norm_topk_prob)

    S = T * top_k
    flat_e = top_e.reshape(S)
    flat_p = top_p.reshape(S)
    order = jnp.argsort(flat_e, stable=True)              # assignments by expert
    inv = jnp.argsort(order, stable=True)
    token_of = order // top_k
    x_sorted = x[token_of]                                # [S, E]
    group_sizes = jnp.bincount(flat_e, length=n_exp).astype(jnp.int32)

    y_sorted = _expert_ffn_ragged(x_sorted, w_gate, w_up, w_down, group_sizes)
    y = y_sorted[inv].reshape(T, top_k, E)
    return jnp.sum(y * flat_p.reshape(T, top_k, 1).astype(y.dtype), axis=1).astype(x.dtype)


def moe_ep_alltoall(
    x: jax.Array,         # [T, E] tokens, sharded over the ep axis rows
    router_w: jax.Array,  # [E, n_exp] replicated
    w_gate: jax.Array, w_up: jax.Array, w_down: jax.Array,  # expert-sharded
    top_k: int,
    mesh,
    norm_topk_prob: bool = True,
    capacity_factor: float = 2.0,
    ep_axis: str = "ep",
) -> jax.Array:
    """Explicit expert-parallel MoE: tokens sharded over ``ep``, experts
    sharded over ``ep``, dispatch/return via ``jax.lax.all_to_all``.

    The 235B-class serving pattern (SURVEY.md §2.3 EP): each device routes
    its own token shard, packs assignments into fixed per-destination
    capacity buckets, exchanges them over ICI with one all-to-all, runs its
    local experts' SwiGLU, and returns results with a second all-to-all.
    Per-(src,dst) capacity is ``ceil(T_local·k/n_ep · capacity_factor)``;
    overflow drops follow the same semantics as :func:`moe_capacity` (the
    GSPMD fallback this specializes — parity-tested against it).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_ep = mesh.shape[ep_axis]
    n_exp = router_w.shape[1]
    assert n_exp % n_ep == 0, (n_exp, n_ep)
    per_dev = n_exp // n_ep

    def local(xl, rw, wg, wu, wd):
        # xl: [T_l, E]; wg/wu/wd: [per_dev, ...] this device's experts
        T_l, E = xl.shape
        cap = max(1, -(-int(capacity_factor * T_l * top_k) // n_ep))
        logits = jnp.dot(xl, rw, preferred_element_type=jnp.float32)
        top_p, top_e = route_topk(logits, top_k, norm_topk_prob)   # [T_l,k]

        dest = top_e // per_dev                                     # [T_l,k]
        local_e = top_e % per_dev
        # slot of each assignment within its destination bucket
        oh = jax.nn.one_hot(dest, n_ep, dtype=jnp.int32).reshape(
            T_l * top_k, n_ep)
        pos = (jnp.cumsum(oh, axis=0) - oh)[
            jnp.arange(T_l * top_k), dest.reshape(-1)]
        keep = pos < cap
        slot = jnp.where(keep, pos, cap)                            # cap = drop

        send_x = jnp.zeros((n_ep, cap + 1, E), xl.dtype).at[
            dest.reshape(-1), slot].set(
                jnp.repeat(xl, top_k, axis=0), mode="drop")[:, :cap]
        send_e = jnp.full((n_ep, cap + 1), -1, jnp.int32).at[
            dest.reshape(-1), slot].set(local_e.reshape(-1),
                                        mode="drop")[:, :cap]

        recv_x = jax.lax.all_to_all(send_x, ep_axis, 0, 0, tiled=False)
        recv_e = jax.lax.all_to_all(send_e, ep_axis, 0, 0, tiled=False)
        # recv_*: [n_ep, cap, ...] rows for THIS device's experts

        rx = recv_x.reshape(n_ep * cap, E)
        re = recv_e.reshape(n_ep * cap)
        # capacity-style local expert compute: scatter into [per_dev, Cl, E]
        Cl = n_ep * cap
        eoh = jax.nn.one_hot(jnp.where(re >= 0, re, per_dev), per_dev + 1,
                             dtype=jnp.int32)[:, :per_dev]          # [Cl,pd]
        epos = (jnp.cumsum(eoh, axis=0) - eoh)[
            jnp.arange(Cl), jnp.clip(re, 0, per_dev - 1)]
        xe = jnp.zeros((per_dev, Cl, E), rx.dtype).at[
            jnp.clip(re, 0, per_dev - 1),
            jnp.where(re >= 0, epos, Cl)].set(rx, mode="drop")
        g = _expert_dot(xe, wg)
        u = _expert_dot(xe, wu)
        h = (jax.nn.silu(g) * u).astype(rx.dtype)
        ye = _expert_dot(h, wd).astype(rx.dtype)                    # [pd,Cl,E]
        ry = ye[jnp.clip(re, 0, per_dev - 1), epos]
        ry = jnp.where((re >= 0)[:, None], ry, 0).reshape(n_ep, cap, E)

        back = jax.lax.all_to_all(ry, ep_axis, 0, 0, tiled=False)
        # back[d, s]: result for the assignment this device packed into
        # bucket d slot s
        got = back[dest.reshape(-1), slot.clip(0, cap - 1)]
        got = jnp.where(keep[:, None], got, 0).reshape(T_l, top_k, E)
        return jnp.sum(
            got.astype(jnp.float32) * top_p[..., None], axis=1).astype(xl.dtype)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ep_axis, None), P(), P(ep_axis), P(ep_axis), P(ep_axis)),
        out_specs=P(ep_axis, None),
        check_vma=False,
    )(x, router_w, w_gate, w_up, w_down)


def moe_capacity(
    x: jax.Array,         # [T, E]
    router_w: jax.Array,
    w_gate: jax.Array, w_up: jax.Array, w_down: jax.Array,
    top_k: int,
    norm_topk_prob: bool = True,
    capacity_factor: float = 1.25,
) -> jax.Array:
    """Capacity-bounded one-hot dispatch (shardable over the expert axis)."""
    T, E = x.shape
    n_exp = router_w.shape[1]
    cap = max(1, int(capacity_factor * T * top_k / n_exp))

    logits = jnp.dot(x, router_w, preferred_element_type=jnp.float32)
    top_p, top_e = route_topk(logits, top_k, norm_topk_prob)  # [T,k]

    # position of each assignment within its expert's capacity buffer
    onehot = jax.nn.one_hot(top_e, n_exp, dtype=jnp.int32)       # [T,k,n_exp]
    flat = onehot.reshape(T * top_k, n_exp)
    pos_in_expert = (jnp.cumsum(flat, axis=0) - flat).reshape(T, top_k, n_exp)
    pos = jnp.sum(pos_in_expert * onehot, axis=-1)               # [T,k]
    keep = pos < cap
    gates = top_p * keep                                          # dropped ⇒ 0

    # dispatch [T, n_exp, cap] one-hot combine weights
    pos_oh = jax.nn.one_hot(jnp.where(keep, pos, cap), cap + 1,
                            dtype=x.dtype)[..., :cap]              # [T,k,cap]
    disp = jnp.einsum("tke,tkc->tec", onehot.astype(x.dtype), pos_oh)
    comb = jnp.einsum("tke,tkc,tk->tec", onehot.astype(jnp.float32),
                      pos_oh.astype(jnp.float32), gates).astype(x.dtype)

    xe = jnp.einsum("tec,td->ecd", disp, x)                        # [n_exp,cap,E]
    g = _expert_dot(xe, w_gate)
    u = _expert_dot(xe, w_up)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    ye = _expert_dot(h, w_down).astype(x.dtype)                    # [n_exp,cap,E]
    return jnp.einsum("tec,ecd->td", comb, ye).astype(x.dtype)
