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


def test_deit_384_factories_registered():
    """deit/models.py:152-179 registers base(+distilled) at 384px."""
    from mrla_tpu.models import create_model, list_models

    names = list_models()
    for n in ("deit_base_patch16_384", "deit_base_distilled_patch16_384"):
        assert n in names
        m = create_model(n)
        assert m.img_size == 384 and m.embed_dim == 768 and m.depth == 12


def test_deit_384_geometry_parity():
    """Executed-reference parity at the 384px geometry (577 tokens), small
    dims for CPU speed — exercises the same pos-embed/token path as
    deit_base_patch16_384 (deit/models.py:152-165)."""
    from deit import ViT

    torch.manual_seed(3)
    tm = ViT(img_size=384, patch_size=16, embed_dim=64, depth=2, num_heads=2,
             qkv_bias=True)
    fm = VisionTransformer(img_size=384, embed_dim=64, depth=2, num_heads=2)
    tm.eval()
    variables = jax.tree.map(
        jnp.asarray, convert_vit_state_dict(tm.state_dict(), variant="plain")
    )
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 384, 384, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_finetune_224_to_384_pos_embed():
    """224-ckpt -> 384 finetune path (deit/main.py:259-293): bicubic
    pos-embed interpolation 14x14 -> 24x24 grid, then the 384 model applies
    the interpolated params end to end."""
    from mrla_tpu.utils.finetune import interpolate_pos_embed

    fm224 = VisionTransformer(embed_dim=64, depth=2, num_heads=2)
    v = fm224.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                   train=False)
    params = jax.tree.map(lambda a: a, v["params"])
    pe = params["pos_embed"]
    assert pe.shape == (1, 14 * 14 + 1, 64)
    params["pos_embed"] = interpolate_pos_embed(pe, 24 * 24,
                                                num_extra_tokens=1)
    assert params["pos_embed"].shape == (1, 24 * 24 + 1, 64)

    fm384 = VisionTransformer(img_size=384, embed_dim=64, depth=2,
                              num_heads=2)
    out = fm384.apply({"params": params}, jnp.zeros((2, 384, 384, 3)),
                      train=False)
    assert out.shape == (2, 1000)
    assert bool(jnp.isfinite(out).all())
