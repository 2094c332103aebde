"""Model registry: name → (config, init, forward, logical_axes).

The serving engine and trainer look models up here; adding a family means
registering its four callables. Mirrors the role of the reference's
model-name plumbing (model_config/*.json + lm_styles registry in
scripts/lcb_runner/lm_styles.py) but for in-house TPU models.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass(frozen=True)
class ModelFamily:
    name: str
    config: Any
    init_params: Callable
    forward: Callable
    logical_axes: Callable


MODEL_REGISTRY: dict[str, ModelFamily] = {}


def register(name: str, config, init_params, forward, logical_axes) -> None:
    MODEL_REGISTRY[name.lower()] = ModelFamily(
        name.lower(), config, init_params, forward, logical_axes
    )


def get_model(name: str) -> ModelFamily:
    key = name.lower()
    if key not in MODEL_REGISTRY:
        _populate()
    if key not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[key]


def _populate() -> None:
    from . import qwen3

    for name, cfg in qwen3.QWEN3_CONFIGS.items():
        register(name, cfg, qwen3.init_params, qwen3.forward,
                 lambda cfg=cfg: qwen3.logical_axes(cfg))
    try:
        from . import qwen3_moe

        for name, cfg in qwen3_moe.QWEN3_MOE_CONFIGS.items():
            register(name, cfg, qwen3_moe.init_params, qwen3_moe.forward,
                     lambda cfg=cfg: qwen3_moe.logical_axes(cfg))
    except ImportError:
        pass
    try:
        from . import deepseek_v3

        for name, cfg in deepseek_v3.DEEPSEEK_V3_CONFIGS.items():
            register(name, cfg, deepseek_v3.init_params, deepseek_v3.forward,
                     lambda cfg=cfg: deepseek_v3.logical_axes(cfg))
    except ImportError:
        pass
