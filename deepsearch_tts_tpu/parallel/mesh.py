"""Device mesh construction.

The reference has no distributed layer at all (SURVEY.md §2.3 — its only
transport is HTTPS); this module is the TPU-native substrate everything
shards over. Axis convention, outermost → innermost:

* ``dp``  — data parallel / independent batch shards (DCN-friendly)
* ``fsdp``— parameter/optimizer sharding for training (ICI)
* ``ep``  — expert parallel for MoE layers (ICI all-to-all)
* ``tp``  — tensor (megatron-style) parallel (innermost ⇒ fastest ICI hops)
* ``pp``  — pipeline parallel over the layer stack (GPipe microbatching)
* ``sp``  — sequence/context parallel for long prefill (aliases tp by default)

Collectives ride ICI when an axis maps to intra-slice devices; keep ``dp``
outermost so cross-slice traffic stays on DCN.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "pp", "fsdp", "ep", "tp")


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    ep: int = 1,
    tp: int = 1,
    pp: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a named mesh with the standard axis order.

    Total axis product must equal the device count. Use
    :func:`best_mesh_shape` to pick sizes automatically.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = (dp, pp, fsdp, ep, tp)
    want = math.prod(shape)
    if want != len(devices):
        raise ValueError(
            f"mesh {dict(zip(AXES, shape))} needs {want} devices, have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)


def best_mesh_shape(n_devices: int, prefer_tp: int | None = None) -> dict[str, int]:
    """Pick a serving-oriented mesh: as much TP as divides the device count
    (bounded by ``prefer_tp``), remainder to DP."""
    tp = prefer_tp or n_devices
    while tp > 1 and n_devices % tp:
        tp -= 1
    return {"dp": n_devices // tp, "pp": 1, "fsdp": 1, "ep": 1, "tp": tp}
