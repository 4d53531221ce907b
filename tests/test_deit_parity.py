"""Logit parity: Flax DeiT(-MRLA) vs the executed reference PyTorch models
(via a minimal timm shim), through convert_vit_state_dict."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import torch

from tests.timm_shim import install

install()
sys.path.insert(0, "/root/reference/deit")

from mrla_tpu.ckpt.torch_convert import convert_vit_state_dict
from mrla_tpu.models.deit import VisionTransformer
from mrla_tpu.models.deit_mrla import ViTMRLA

RTOL, ATOL = 2e-3, 2e-4


def _compare(fm, tm, variant, seed=0, train_out=False):
    tm.eval()
    variables = jax.tree.map(
        jnp.asarray, convert_vit_state_dict(tm.state_dict(), variant=variant)
    )
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = fm.apply(variables, jnp.asarray(x), train=False)
    if isinstance(want, tuple):
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=RTOL, atol=ATOL)
    else:
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=RTOL, atol=ATOL)


def test_deit_tiny_baseline_parity():
    from deit import deit_tiny_patch16_224 as torch_factory

    torch.manual_seed(0)
    tm = torch_factory()
    fm = VisionTransformer(embed_dim=192, depth=12, num_heads=3)
    _compare(fm, tm, "plain")


def test_deit_mrlal_tiny_parity():
    from deit_mrla_light import deit_mrlal_tiny_patch16_224 as torch_factory

    torch.manual_seed(1)
    tm = torch_factory()
    fm = ViTMRLA(embed_dim=192, depth=12, num_heads=3, dim_mrla=16, variant="light")
    _compare(fm, tm, "light")


def test_deit_mrlab_tiny_parity():
    from deit_mrla_base import deit_mrlab_tiny_patch16_224 as torch_factory

    torch.manual_seed(2)
    tm = torch_factory()
    fm = ViTMRLA(
        embed_dim=192, depth=12, num_heads=3, dim_mrla=16, variant="base",
        drop_path_rate=0.1, drop_path_uniform=True,
    )
    _compare(fm, tm, "base")
