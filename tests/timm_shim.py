"""Minimal fake `timm` package so the reference DeiT files (which import a
handful of timm symbols) can be EXECUTED as parity oracles without timm
being installed.  Test-only code."""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


def install() -> None:
    if "timm" in sys.modules:
        return

    def _cfg(url="", **kwargs):
        return {"url": url, "num_classes": 1000, **kwargs}

    def register_model(fn):
        return fn

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype))
            return x / keep * mask

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.default_cfgs = {}
    vit._cfg = _cfg
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = register_model
    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    helpers = types.ModuleType("timm.models.layers.helpers")
    helpers.to_2tuple = to_2tuple
    layers.helpers = helpers

    timm.models = models
    models.vision_transformer = vit
    models.registry = registry
    models.layers = layers

    for name, mod in [
        ("timm", timm),
        ("timm.models", models),
        ("timm.models.vision_transformer", vit),
        ("timm.models.registry", registry),
        ("timm.models.layers", layers),
        ("timm.models.layers.helpers", helpers),
    ]:
        sys.modules[name] = mod
