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


def test_patchconvnet_runs():
    m = create_model("patchconvnet_s60", num_classes=10)
    # shrink depth via direct instantiation for CPU speed
    from mrla_tpu.models.patchconvnet import PatchConvNet

    m = PatchConvNet(embed_dim=64, depth=2, num_classes=10)
    v = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = m.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())
