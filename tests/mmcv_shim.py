"""Minimal fake `mmcv`/`mmdet` packaging so the reference MMDetection
backbone (/root/reference/mmdetection/mmdet/models/backbones/resnet_mrlal.py)
can be EXECUTED as a parity oracle without mmcv/mmdet installed — the same
technique as tests/timm_shim.py for the DeiT files.  Test-only code.

The reference file needs:
  * mmcv.cnn: build_conv_layer, build_norm_layer, build_plugin_layer,
    constant_init, kaiming_init  (imported, unused in the active code path)
  * mmcv.runner: BaseModule (an nn.Module that accepts init_cfg),
    load_checkpoint (unused)
  * mmdet.utils.get_root_logger  (unused)
  * mmdet.models.builder.BACKBONES with a register_module decorator
  * relative imports `.modules.*` — satisfied by installing a real package
    `mmdet.models.backbones` whose __path__ points at the reference dir.
"""

from __future__ import annotations

import importlib
import sys
import types

import torch.nn as nn

_REF = "/root/reference/mmdetection/mmdet/models/backbones"


def install() -> None:
    if "mmcv" in sys.modules:
        return

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

    def _unused(*a, **k):  # build_*_layer / *_init / load_checkpoint
        raise NotImplementedError("not used by the reference backbone")

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")
    cnn.build_conv_layer = _unused
    cnn.build_norm_layer = _unused
    cnn.build_plugin_layer = _unused
    cnn.constant_init = _unused
    cnn.kaiming_init = _unused
    runner = types.ModuleType("mmcv.runner")
    runner.BaseModule = BaseModule
    runner.load_checkpoint = _unused
    mmcv.cnn = cnn
    mmcv.runner = runner

    mmdet = types.ModuleType("mmdet")
    utils = types.ModuleType("mmdet.utils")
    utils.get_root_logger = lambda *a, **k: None
    models = types.ModuleType("mmdet.models")
    models.__path__ = []  # mark as package so ..builder resolves
    builder = types.ModuleType("mmdet.models.builder")
    builder.BACKBONES = _Registry()
    backbones = types.ModuleType("mmdet.models.backbones")
    backbones.__path__ = [_REF]  # real package path -> relative imports work
    mmdet.utils = utils
    mmdet.models = models
    models.builder = builder
    models.backbones = backbones

    for name, mod in [
        ("mmcv", mmcv),
        ("mmcv.cnn", cnn),
        ("mmcv.runner", runner),
        ("mmdet", mmdet),
        ("mmdet.utils", utils),
        ("mmdet.models", models),
        ("mmdet.models.builder", builder),
        ("mmdet.models.backbones", backbones),
    ]:
        sys.modules[name] = mod


def load_reference_backbone():
    """Import and return the executed reference module (ResNet_mrlal etc.)."""
    install()
    return importlib.import_module("mmdet.models.backbones.resnet_mrlal")
