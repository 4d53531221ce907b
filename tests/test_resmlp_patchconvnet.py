"""ResMLP / PatchConvNet baselines: shapes + executed-reference parity."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import torch

from tests.timm_shim import install

install()
sys.path.insert(0, "/root/reference/deit")

from mrla_tpu.models import create_model
from mrla_tpu.models.resmlp import ResMLP


def test_resmlp_runs():
    m = create_model("resmlp_12", num_classes=10)
    v = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    out = m.apply(v, jnp.zeros((2, 224, 224, 3)), train=False)
    assert out.shape == (2, 10)


def test_resmlp_parity_vs_reference():
    from resmlp_models import resmlp_models, layers_scale_mlp_blocks  # noqa: F401

    torch.manual_seed(0)
    tm = resmlp_models(embed_dim=64, depth=2, num_classes=10, init_scale=0.1).eval()
    fm = ResMLP(embed_dim=64, depth=2, num_classes=10, init_scale=0.1)

    # convert: patch_embed + blocks + norm + head
    sd = tm.state_dict()
    params = {
        "patch_embed": {"proj": {
            "kernel": np.transpose(sd["patch_embed.proj.weight"].numpy(), (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"].numpy(),
        }},
        "norm": {"alpha": sd["norm.alpha"].numpy(), "beta": sd["norm.beta"].numpy()},
        "head": {"kernel": sd["head.weight"].numpy().T,
                 "bias": sd["head.bias"].numpy()},
    }
    for i in range(2):
        p = f"blocks.{i}."
        params[f"block{i}"] = {
            "norm1": {"alpha": sd[p + "norm1.alpha"].numpy(),
                      "beta": sd[p + "norm1.beta"].numpy()},
            "norm2": {"alpha": sd[p + "norm2.alpha"].numpy(),
                      "beta": sd[p + "norm2.beta"].numpy()},
            "attn": {"kernel": sd[p + "attn.weight"].numpy().T,
                     "bias": sd[p + "attn.bias"].numpy()},
            "mlp": {"fc1": {"kernel": sd[p + "mlp.fc1.weight"].numpy().T,
                            "bias": sd[p + "mlp.fc1.bias"].numpy()},
                    "fc2": {"kernel": sd[p + "mlp.fc2.weight"].numpy().T,
                            "bias": sd[p + "mlp.fc2.bias"].numpy()}},
            "gamma_1": sd[p + "gamma_1"].numpy(),
            "gamma_2": sd[p + "gamma_2"].numpy(),
        }
    variables = {"params": jax.tree.map(jnp.asarray, params)}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_patchconvnet_parity_vs_reference():
    """Executed-reference logit parity (same method as the ResMLP test):
    a small random-init /root/reference/deit/patchconvnet_models.PatchConvnet
    converted layer-by-layer into our PatchConvNet."""
    from patchconvnet_models import PatchConvnet  # noqa: F401

    from mrla_tpu.models.patchconvnet import PatchConvNet

    depth, c, ncls = 2, 64, 10
    torch.manual_seed(0)
    from functools import partial

    import torch.nn as tnn

    tm = PatchConvnet(
        img_size=64, patch_size=16, embed_dim=c, depth=depth, num_heads=1,
        qkv_bias=True, mlp_ratio_clstk=3.0, init_scale=0.1, num_classes=ncls,
        norm_layer=partial(tnn.LayerNorm, eps=1e-6),  # the S60/S120/B60/B120
        # factories all pass eps=1e-6 (patchconvnet_models.py:337)
    ).eval()
    fm = PatchConvNet(embed_dim=c, depth=depth, num_classes=ncls, init_scale=0.1)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    conv = lambda w: np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    lin = lambda p: {"kernel": sd[p + ".weight"].T, "bias": sd[p + ".bias"]}
    ln = lambda p: {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    params = {
        "patch_embed": {
            f"conv{i}": {"kernel": conv(sd[f"patch_embed.proj.{2*i}.0.weight"])}
            for i in range(4)
        },
        "cls_token": sd["cls_token"],
        "cls_gamma_1": sd["blocks_token_only.0.gamma_1"],
        "cls_gamma_2": sd["blocks_token_only.0.gamma_2"],
        "cls_norm1": ln("blocks_token_only.0.norm1"),
        "cls_norm2": ln("blocks_token_only.0.norm2"),
        "cls_attn": {k: lin(f"blocks_token_only.0.attn.{k}")
                     for k in ("q", "k", "v", "proj")},
        "cls_mlp": {"fc1": lin("blocks_token_only.0.mlp.fc1"),
                    "fc2": lin("blocks_token_only.0.mlp.fc2")},
        "norm": ln("norm"),
        "head": lin("head"),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        params[f"norm{i}"] = ln(p + "norm1")
        params[f"gamma_{i}"] = sd[p + "gamma_1"]
        params[f"block{i}"] = {
            "pw1": {"kernel": conv(sd[p + "attn.qkv_pos.0.weight"]),
                    "bias": sd[p + "attn.qkv_pos.0.bias"]},
            "dw": {"kernel": conv(sd[p + "attn.qkv_pos.2.weight"]),
                   "bias": sd[p + "attn.qkv_pos.2.bias"]},
            "se_fc1": {"kernel": sd[p + "attn.qkv_pos.4.conv_reduce.weight"][:, :, 0, 0].T,
                       "bias": sd[p + "attn.qkv_pos.4.conv_reduce.bias"]},
            "se_fc2": {"kernel": sd[p + "attn.qkv_pos.4.conv_expand.weight"][:, :, 0, 0].T,
                       "bias": sd[p + "attn.qkv_pos.4.conv_expand.bias"]},
            "pw2": {"kernel": conv(sd[p + "attn.qkv_pos.5.weight"]),
                    "bias": sd[p + "attn.qkv_pos.5.bias"]},
        }
    variables = {"params": jax.tree.map(jnp.asarray, params)}

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_patchconvnet_l_and_multi_registered():
    """patchconvnet_models.py:381-420 registers L60/L120/S60_multi."""
    from mrla_tpu.models import list_models

    from mrla_tpu.models.patchconvnet import PatchConvNet

    names = list_models()
    for n in ("patchconvnet_l60", "patchconvnet_l120", "patchconvnet_s60_multi"):
        assert n in names
    m = create_model("patchconvnet_l60")
    assert isinstance(m, PatchConvNet)
    assert m.embed_dim == 1024 and m.depth == 60
    mm = create_model("patchconvnet_s60_multi")
    assert mm.multiclass and mm.embed_dim == 384 and mm.init_scale == 1e-4


def test_patchconvnet_multiclass_parity_vs_reference():
    """Executed-reference parity for the S60_multi architecture family
    (patchconvnet_models.py:77-112,407-420): one cls token per class,
    class attention with q over the cls tokens / k,v over the patch tokens
    only, and per-class 1-logit heads.

    Reference quirk: Learned_Aggregation_Layer_multi hardcodes
    num_classes=1000 (the token block never forwards num_classes,
    patchconvnet_models.py:183-186), so it only works when the model's
    num_classes happens to be 1000.  We implement the intended semantics
    (q over the actual cls tokens) and patch the reference instance's
    attn.num_classes to match the test's small class count."""
    from functools import partial

    import torch.nn as tnn

    from patchconvnet_models import (  # noqa: F401
        Conv_blocks_se, ConvStem, Learned_Aggregation_Layer_multi, PatchConvnet,
    )

    from mrla_tpu.models.patchconvnet import PatchConvNet

    depth, c, ncls = 2, 64, 10
    torch.manual_seed(4)
    tm = PatchConvnet(
        img_size=64, patch_size=16, embed_dim=c, depth=depth, num_heads=1,
        qkv_bias=True, mlp_ratio_clstk=3.0, num_classes=ncls,
        norm_layer=partial(tnn.LayerNorm, eps=1e-6),
        Patch_layer=ConvStem, Attention_block=Conv_blocks_se,
        Attention_block_token_only=Learned_Aggregation_Layer_multi,
        depth_token_only=1, multiclass=True,
    ).eval()
    tm.blocks_token_only[0].attn.num_classes = ncls  # see docstring
    fm = PatchConvNet(embed_dim=c, depth=depth, num_classes=ncls,
                      init_scale=1e-4, multiclass=True)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    conv = lambda w: np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    lin = lambda p: {"kernel": sd[p + ".weight"].T, "bias": sd[p + ".bias"]}
    ln = lambda p: {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    params = {
        "patch_embed": {
            f"conv{i}": {"kernel": conv(sd[f"patch_embed.proj.{2*i}.0.weight"])}
            for i in range(4)
        },
        "cls_token": sd["cls_token"],
        "cls_gamma_1": sd["blocks_token_only.0.gamma_1"],
        "cls_gamma_2": sd["blocks_token_only.0.gamma_2"],
        "cls_norm1": ln("blocks_token_only.0.norm1"),
        "cls_norm2": ln("blocks_token_only.0.norm2"),
        "cls_attn": {k: lin(f"blocks_token_only.0.attn.{k}")
                     for k in ("q", "k", "v", "proj")},
        "cls_mlp": {"fc1": lin("blocks_token_only.0.mlp.fc1"),
                    "fc2": lin("blocks_token_only.0.mlp.fc2")},
        "norm": ln("norm"),
        "head_multi_kernel": np.stack(
            [sd[f"head.{i}.weight"][0] for i in range(ncls)]
        ),
        "head_multi_bias": np.concatenate(
            [sd[f"head.{i}.bias"] for i in range(ncls)]
        ),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        params[f"norm{i}"] = ln(p + "norm1")
        params[f"gamma_{i}"] = sd[p + "gamma_1"]
        params[f"block{i}"] = {
            "pw1": {"kernel": conv(sd[p + "attn.qkv_pos.0.weight"]),
                    "bias": sd[p + "attn.qkv_pos.0.bias"]},
            "dw": {"kernel": conv(sd[p + "attn.qkv_pos.2.weight"]),
                   "bias": sd[p + "attn.qkv_pos.2.bias"]},
            "se_fc1": {"kernel": sd[p + "attn.qkv_pos.4.conv_reduce.weight"][:, :, 0, 0].T,
                       "bias": sd[p + "attn.qkv_pos.4.conv_reduce.bias"]},
            "se_fc2": {"kernel": sd[p + "attn.qkv_pos.4.conv_expand.weight"][:, :, 0, 0].T,
                       "bias": sd[p + "attn.qkv_pos.4.conv_expand.bias"]},
            "pw2": {"kernel": conv(sd[p + "attn.qkv_pos.5.weight"]),
                    "bias": sd[p + "attn.qkv_pos.5.bias"]},
        }
    variables = {"params": jax.tree.map(jnp.asarray, params)}

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    assert want.shape == (2, ncls)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_patchconvnet_runs():
    m = create_model("patchconvnet_s60", num_classes=10)
    # shrink depth via direct instantiation for CPU speed
    from mrla_tpu.models.patchconvnet import PatchConvNet

    m = PatchConvNet(embed_dim=64, depth=2, num_classes=10)
    v = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = m.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())
