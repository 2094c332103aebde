"""Logical-axis → mesh-axis sharding rules.

Models annotate parameters and activations with *logical* axis names
("vocab", "embed", "heads", "mlp", "expert", ...). A :class:`ShardingRules`
table maps those to mesh axes; changing the table re-lays-out the whole model
(e.g. serving TP vs training FSDP) without touching model code. This is the
GSPMD recipe: annotate shardings, let XLA insert the collectives.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class ShardingRules:
    """Mapping of logical axis name → mesh axis (or None = replicate)."""

    rules: dict[str, Any] = field(default_factory=dict)

    def axis(self, logical: str | None):
        if logical is None:
            return None
        return self.rules.get(logical)

    def spec(self, *logical_axes: str | None) -> P:
        return P(*(self.axis(a) for a in logical_axes))


# Serving layout: megatron TP over heads/mlp; batch over dp; experts over ep.
SERVING_RULES = ShardingRules({
    "batch": "dp",
    "vocab": "tp",
    "heads": "tp",
    "kv_heads": "tp",
    "mlp": "tp",
    "expert": "ep",
    "expert_mlp": "tp",
    "embed": None,
    "seq": None,
})

# Training layout: parameters sharded over fsdp, batch over (dp, fsdp).
TRAIN_RULES = ShardingRules({
    "batch": ("dp", "fsdp"),
    "vocab": "tp",
    "heads": "tp",
    "kv_heads": "tp",
    "mlp": "tp",
    "expert": "ep",
    "expert_mlp": "tp",
    "embed": "fsdp",
    "seq": None,
})


def logical_to_spec(logical_axes: tuple[str | None, ...], rules: ShardingRules) -> P:
    return rules.spec(*logical_axes)


def shard_pytree(params, logical_tree, mesh: Mesh, rules: ShardingRules):
    """Place a parameter pytree on the mesh per its logical-axis annotations.

    ``logical_tree`` mirrors ``params`` with tuples of logical axis names.
    """
    def place(x, axes):
        sharding = NamedSharding(mesh, logical_to_spec(tuple(axes), rules))
        return jax.device_put(x, sharding)

    return jax.tree.map(place, params, logical_tree,
                        is_leaf=lambda x: isinstance(x, tuple))


def constrain(x, rules: ShardingRules, *logical_axes: str | None):
    """with_sharding_constraint by logical names (no-op outside a mesh ctx)."""
    try:
        return jax.lax.with_sharding_constraint(x, rules.spec(*logical_axes))
    except (ValueError, RuntimeError):
        return x
