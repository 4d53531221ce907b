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

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None):
            super().__init__()
            img_size = to_2tuple(img_size)
            patch_size = to_2tuple(patch_size)
            self.num_patches = (img_size[0] // patch_size[0]) * (
                img_size[1] // patch_size[1])
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            return self.norm(self.proj(x).flatten(2).transpose(1, 2))

    class SqueezeExcite(nn.Module):
        """timm efficientnet_blocks.SqueezeExcite: GAP -> 1x1 reduce ->
        ReLU -> 1x1 expand -> sigmoid gate."""

        def __init__(self, in_chs, rd_ratio=0.25, rd_channels=None,
                     act_layer=nn.ReLU, gate_layer=nn.Sigmoid, **_):
            super().__init__()
            rd_channels = rd_channels or int(round(in_chs * rd_ratio))
            self.conv_reduce = nn.Conv2d(in_chs, rd_channels, 1, bias=True)
            self.act1 = act_layer(inplace=True)
            self.conv_expand = nn.Conv2d(rd_channels, in_chs, 1, bias=True)
            self.gate = gate_layer()

        def forward(self, x):
            x_se = x.mean((2, 3), keepdim=True)
            x_se = self.conv_expand(self.act1(self.conv_reduce(x_se)))
            return x * self.gate(x_se)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.default_cfgs = {}
    vit._cfg = _cfg
    vit.Mlp = Mlp
    vit.PatchEmbed = PatchEmbed
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = register_model
    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    helpers = types.ModuleType("timm.models.layers.helpers")
    helpers.to_2tuple = to_2tuple
    layers.helpers = helpers
    effblocks = types.ModuleType("timm.models.efficientnet_blocks")
    effblocks.SqueezeExcite = SqueezeExcite

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
        ("timm.models.efficientnet_blocks", effblocks),
    ]:
        sys.modules[name] = mod
