"""Full-model logit parity: our Flax ResNets vs the reference PyTorch models.

The reference code is EXECUTED (not copied) on CPU as the golden oracle: we
construct small instances with its own classes, convert its randomly
initialized state_dict through mrla_tpu.ckpt, and require logits to match at
fp32 tolerance.  This validates model topology, every init quirk that lives
in the state_dict, and the converter in one shot.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

# The reference's models/__init__.py crashes on import: it star-imports
# resnet152_mrlal which is exported in __all__ but never defined (the latent
# bug documented in SURVEY.md §2.7).  Bypass the package __init__ with a
# synthetic namespace package so the submodules load directly.
sys.path.insert(0, "/root/reference/resnet")
if "models" not in sys.modules:
    _pkg = types.ModuleType("models")
    _pkg.__path__ = ["/root/reference/resnet/models"]
    sys.modules["models"] = _pkg

from mrla_tpu.ckpt import convert_resnet_state_dict
from mrla_tpu.models.resnet import ResNet
from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight

LAYERS = [1, 1, 1, 1]  # minimal depth exercises every stage transition
RTOL, ATOL = 2e-3, 2e-4


def _logit_compare(flax_model, torch_model, seed=0, size=64):
    torch_model.eval()
    variables = convert_resnet_state_dict(torch_model.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(flax_model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_resnet_baseline_parity():
    from models.resnet import ResNet as TorchResNet, Bottleneck

    torch.manual_seed(0)
    tm = TorchResNet(Bottleneck, LAYERS, num_classes=10)
    fm = ResNet(layers=LAYERS, num_classes=10)
    _logit_compare(fm, tm)


def test_resnet_se_eca_parity():
    from models.resnet import ResNet as TorchResNet, Bottleneck

    torch.manual_seed(1)
    tm = TorchResNet(Bottleneck, LAYERS, num_classes=10, SE=True, ECA=[3, 3, 5, 5])
    fm = ResNet(layers=LAYERS, num_classes=10, se=True, eca=(3, 3, 5, 5))
    _logit_compare(fm, tm)


def test_resnext_parity():
    from models.resnet import ResNet as TorchResNet, Bottleneck

    torch.manual_seed(2)
    tm = TorchResNet(Bottleneck, LAYERS, num_classes=10, groups=32, width_per_group=4)
    fm = ResNet(layers=LAYERS, num_classes=10, groups=32, width_per_group=4)
    _logit_compare(fm, tm)


def test_resnet_mrlal_parity():
    from models.resnet_mrla_light import ResNet_mrlal, MRLA_Bottleneck

    torch.manual_seed(3)
    tm = ResNet_mrlal(MRLA_Bottleneck, LAYERS, num_classes=10)
    fm = ResNetMRLALight(layers=LAYERS, num_classes=10)
    _logit_compare(fm, tm)


def test_resnet_mrlab_parity():
    from models.resnet_mrla_base import ResNet_mrlab, MRLA_Bottleneck as MRLAB_Block

    from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

    torch.manual_seed(5)
    tm = ResNet_mrlab(MRLAB_Block, LAYERS, num_classes=10)
    fm = ResNetMRLABase(layers=LAYERS, num_classes=10)
    _logit_compare(fm, tm)


def test_resnet_mrlab22_parity():
    from models.resnet_mrla_base22 import ResNet_mrlab, MRLA_Bottleneck as B22_Block

    from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

    torch.manual_seed(6)
    tm = ResNet_mrlab(B22_Block, LAYERS, num_classes=10)
    fm = ResNetMRLABase(
        layers=LAYERS, num_classes=10, deep_stem=False, relu_on_attn=False
    )
    _logit_compare(fm, tm)


def test_resnet_dw_parity():
    from models.resnet_dw import ResNet_dw, Bottleneck_dw

    from mrla_tpu.models.resnet import ResNet

    torch.manual_seed(7)
    tm = ResNet_dw(Bottleneck_dw, LAYERS, num_classes=10)
    fm = ResNet(layers=LAYERS, num_classes=10, dw_epilogue=True)
    _logit_compare(fm, tm)


def test_resnet_la_eq4_parity():
    from models.resnet_la_eq4 import ResNet_la_eq4, LABottleneck

    from mrla_tpu.models.resnet_la_eq4 import ResNetLAEq4

    torch.manual_seed(8)
    tm = ResNet_la_eq4(LABottleneck, LAYERS, num_classes=10)
    fm = ResNetLAEq4(layers=LAYERS, num_classes=10)
    _logit_compare(fm, tm)


@pytest.mark.slow
def test_resnet50_mrlal_full_parity():
    """The flagship at full depth (slow: ~1 min on CPU)."""
    from models.resnet_mrla_light import ResNet_mrlal, MRLA_Bottleneck

    torch.manual_seed(4)
    tm = ResNet_mrlal(MRLA_Bottleneck, [3, 4, 6, 3], num_classes=1000)
    fm = ResNetMRLALight(layers=[3, 4, 6, 3], num_classes=1000)
    _logit_compare(fm, tm, size=128)


@pytest.mark.slow
def test_resnet101_mrlab_full_parity_scan_roundtrip():
    """MRLA-base at the HARD depth (VERDICT r2 next-8): resnet101's 23-block
    stage 3 is the SURVEY §3.3 memory case (V cache grows to
    23x[B,C,H,W]).  Executed-reference logits through the converted state
    dict AND the stack_scan_params round-trip into the lax.scan model —
    the deep-variant serving/training default."""
    from models.resnet_mrla_base import ResNet_mrlab, MRLA_Bottleneck as MRLAB_Block

    from mrla_tpu.ckpt.scan_adapter import stack_scan_params
    from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

    layers = [3, 4, 23, 3]
    torch.manual_seed(9)
    tm = ResNet_mrlab(MRLAB_Block, layers, num_classes=1000)
    tm.eval()
    variables = convert_resnet_state_dict(tm.state_dict())

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    # unrolled model on the converted tree
    fm_u = ResNetMRLABase(layers=layers, num_classes=1000, use_scan=False)
    got_u = np.asarray(
        fm_u.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x),
                   train=False)
    )
    np.testing.assert_allclose(got_u, want, rtol=RTOL, atol=ATOL)

    # scan model on the stacked tree (the O(1)-compile form for this depth)
    vs = {
        "params": stack_scan_params(variables["params"], layers),
        "batch_stats": stack_scan_params(variables["batch_stats"], layers),
    }
    fm_s = ResNetMRLABase(layers=layers, num_classes=1000, use_scan=True)
    got_s = np.asarray(
        fm_s.apply(jax.tree.map(jnp.asarray, vs), jnp.asarray(x),
                   train=False)
    )
    np.testing.assert_allclose(got_s, want, rtol=RTOL, atol=ATOL)
