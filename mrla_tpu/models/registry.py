"""Model registry: string arch name -> constructor.

Unifies the reference's three registration mechanisms (SURVEY.md §1 L2):
``models.__dict__`` reflection (resnet/train.py:24-26), timm @register_model
(deit), and mmdet @BACKBONES.register_module — one decorator, one lookup.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    """Decorator: register ``fn`` under its function name."""
    name = fn.__name__
    if name in _REGISTRY:
        raise ValueError(f"duplicate model registration: {name}")
    _REGISTRY[name] = fn
    return fn


def create_model(name: str, **kwargs):
    """Instantiate a registered architecture by name."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**kwargs)


def list_models() -> list[str]:
    return sorted(_REGISTRY)
