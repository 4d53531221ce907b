"""Two-stage converter parity vs minimal-torch oracles.

Each oracle restates the mmdet head architecture (documented in the
reference's configs, faster_rcnn_r50mrlal_fpn.py:20-56 /
mask_rcnn_r50mrlal_fpn.py:56-69) in plain torch — Conv2d/Linear/
ConvTranspose2d in NCHW — and the converted weights must reproduce its
outputs through our NHWC flax heads at fp32 tolerance.  This pins the two
layout-sensitive conversions: the first shared fc's channel-major flatten
re-indexing and the deconv IOHW kernel order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from mrla_tpu.ckpt.detect_convert import (
    _convert_bbox_head,
    _convert_mask_head,
    _convert_rpn_head,
    convert_mmdet_two_stage,
)
from mrla_tpu.detect import FCNMaskHead, RPNHead, Shared2FCBBoxHead

# fp32-parity checks need full-precision matmuls, but ONLY for this module:
# a module-level jax.config.update leaks at collection time into every other
# test in the process (it put the whole suite — including on-chip Pallas
# kernels, where Mosaic rejects bf16 dots under HIGHEST — on float32).
@pytest.fixture(autouse=True)
def _fp32_matmuls():
    with jax.default_matmul_precision("float32"):
        yield


def _to_jax_nhwc(x_nchw: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))


class TorchRPNHead(tnn.Module):
    def __init__(self, c=32, a=3):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(c, c, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(c, a, 1)
        self.rpn_reg = tnn.Conv2d(c, a * 4, 1)

    def forward(self, x):
        t = F.relu(self.rpn_conv(x))
        return self.rpn_cls(t), self.rpn_reg(t)


def test_rpn_head_parity():
    torch.manual_seed(0)
    th = TorchRPNHead().eval()
    sd = {f"rpn_head.{k}": v for k, v in th.state_dict().items()}
    params = _convert_rpn_head(sd)
    x = torch.randn(2, 32, 9, 11)
    with torch.no_grad():
        tc, tr = th(x)
    jc, jr = RPNHead(feat_channels=32, num_anchors=3).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, _to_jax_nhwc(x)
    )
    np.testing.assert_allclose(
        np.asarray(jc), tc.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(jr), tr.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )


class TorchBBoxHead(tnn.Module):
    """Shared2FCBBoxHead: flatten(C,7,7) -> 2xfc(64) -> cls/reg."""

    def __init__(self, c=16, fc=64, k=6):
        super().__init__()
        self.shared_fcs = tnn.ModuleList(
            [tnn.Linear(c * 49, fc), tnn.Linear(fc, fc)]
        )
        self.fc_cls = tnn.Linear(fc, k + 1)
        self.fc_reg = tnn.Linear(fc, k * 4)

    def forward(self, x):  # x [N, C, 7, 7]
        x = x.flatten(1)
        for fc in self.shared_fcs:
            x = F.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


def test_bbox_head_parity_flatten_reindex():
    torch.manual_seed(1)
    th = TorchBBoxHead().eval()
    sd = {f"roi_head.bbox_head.{k}": v for k, v in th.state_dict().items()}
    params = _convert_bbox_head(sd)
    x = torch.randn(5, 16, 7, 7)
    with torch.no_grad():
        tc, tr = th(x)
    head = Shared2FCBBoxHead(num_classes=6, fc_out_channels=64)
    # our head takes [..., 7, 7, C]
    jc, jr = head.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=3e-5)


class TorchMaskHead(tnn.Module):
    def __init__(self, c=16, k=3, num_convs=2):
        super().__init__()
        self.convs = tnn.ModuleList()
        for _ in range(num_convs):
            m = tnn.Module()
            m.conv = tnn.Conv2d(c, c, 3, padding=1)
            self.convs.append(m)
        self.upsample = tnn.ConvTranspose2d(c, c, 2, stride=2)
        self.conv_logits = tnn.Conv2d(c, k, 1)

    def forward(self, x):
        for m in self.convs:
            x = F.relu(m.conv(x))
        x = F.relu(self.upsample(x))
        return self.conv_logits(x)


def test_mask_head_parity_deconv():
    torch.manual_seed(2)
    th = TorchMaskHead().eval()
    sd = {f"roi_head.mask_head.{k}": v for k, v in th.state_dict().items()}
    params = _convert_mask_head(sd)
    x = torch.randn(4, 16, 14, 14)
    with torch.no_grad():
        tm = th(x)
    head = FCNMaskHead(num_classes=3, conv_out_channels=16, num_convs=2)
    jm = head.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    assert jm.shape == (4, 28, 28, 3)
    np.testing.assert_allclose(
        np.asarray(jm), tm.numpy().transpose(0, 2, 3, 1), atol=3e-5
    )


def test_convert_two_stage_assembles_full_tree():
    """Synthetic full-checkpoint key set (tiny dims) assembles the scopes
    FasterRCNN/MaskRCNN expect; missing rpn raises."""
    torch.manual_seed(3)
    sd = {}
    # backbone keys with the real grammar: a tiny executed-reference trunk
    from tests.mmcv_shim import load_reference_backbone

    ref = load_reference_backbone()
    trunk = ref.ResNet_mrlal(layers=[1, 1, 1, 1])
    sd.update(
        {f"backbone.{k}": v for k, v in trunk.state_dict().items()}
    )
    for i in range(4):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = torch.randn(8, 8, 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = torch.randn(8)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = torch.randn(8, 8, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = torch.randn(8)
    sd.update(
        {f"rpn_head.{k}": v for k, v in TorchRPNHead().state_dict().items()}
    )
    sd.update(
        {
            f"roi_head.bbox_head.{k}": v
            for k, v in TorchBBoxHead().state_dict().items()
        }
    )
    tree = convert_mmdet_two_stage(sd)
    assert set(tree["params"]) == {
        "backbone", "neck", "rpn_head", "bbox_head",
    }
    sd.update(
        {
            f"roi_head.mask_head.{k}": v
            for k, v in TorchMaskHead().state_dict().items()
        }
    )
    tree = convert_mmdet_two_stage(sd)
    assert "mask_head" in tree["params"]
    # one-stage-only checkpoint: loud failure
    with pytest.raises(ValueError):
        convert_mmdet_two_stage(
            {k: v for k, v in sd.items() if not k.startswith("rpn_head.")}
        )
