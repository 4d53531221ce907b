"""Hub surface: the torch-hub-equivalent entry point (ref deit/hubconf.py,
deit/helpers.py named_apply)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu import hub


def test_attribute_resolves_registered_arch():
    ctor = hub.resnet50_mrlal
    assert callable(ctor)
    assert "resnet50_mrlal" in dir(hub)
    with pytest.raises(AttributeError, match="not a registered arch"):
        hub.definitely_not_a_model


def test_load_fresh_init_runs():
    model, variables = hub.load("resnet50", image_size=64, num_classes=10)
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 10)


@pytest.mark.slow  # full-depth resnet50_mrlal on CPU (~2 min)
def test_load_torch_checkpoint_roundtrip(tmp_path):
    """hub.load on a reference .pth.tar matches the EXECUTED reference."""
    import sys
    import types

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/resnet")
    if "models" not in sys.modules:  # same __init__ bypass as test_resnet_parity
        pkg = types.ModuleType("models")
        pkg.__path__ = ["/root/reference/resnet/models"]
        sys.modules["models"] = pkg
    from models.resnet_mrla_light import resnet50_mrlal as torch_ctor

    torch.manual_seed(0)
    ref = torch_ctor(num_classes=10)
    ref.eval()
    path = tmp_path / "ref.pth.tar"
    torch.save({"state_dict": ref.state_dict()}, path)

    model, variables = hub.load("resnet50_mrlal", str(path), num_classes=10)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    ours = model.apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(x), train=False
    )
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=2e-3, atol=2e-4
    )


def test_convert_dispatch_rejects_unknown_family():
    with pytest.raises(ValueError, match="no torch-checkpoint converter"):
        hub.convert_torch_state_dict("resmlp_12", {})


def test_named_apply_order_and_paths():
    tree = {"a": {"b": {"w": 1}, "c": {"w": 2}}, "d": {"w": 3}}
    seen = []
    hub.named_apply(lambda subtree, name: seen.append(name), tree,
                    include_root=True)
    # depth-first: children before parents, root last (reference order)
    assert seen == ["a.b", "a.c", "a", "d", ""]
    pre = []
    hub.named_apply(lambda subtree, name: pre.append(name), tree,
                    depth_first=False, include_root=True)
    assert pre[0] == ""
