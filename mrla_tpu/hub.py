"""Torch-hub-equivalent model entry point.

Native equivalent of the reference's hub surface: ``deit/hubconf.py:3-8``
re-exports every registered constructor so ``torch.hub.load(repo, name)``
resolves it by attribute, and ``deit/helpers.py:19-27`` ships
``named_apply`` (a depth-first module walk).  Here the registry already
unifies every constructor (SURVEY.md §1 L2), so the hub surface is:

- attribute access on this module resolves ANY registered arch name
  (``from mrla_tpu import hub; model = hub.deit_small_patch16_224()``),
- :func:`load` is the one-call create + init (+ torch-checkpoint convert)
  path, returning ``(model, variables)`` ready for ``model.apply``,
- :func:`named_apply` is the Flax-tree analog of the reference helper.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

from mrla_tpu.models import registry

# The reference lists its hub deps (hubconf.py:8); ours for symmetry.
dependencies = ["jax", "flax"]


def __getattr__(name: str):
    """PEP 562: resolve any registered arch name as a module attribute."""
    try:
        return registry._REGISTRY[name]
    except KeyError:
        raise AttributeError(
            f"module 'mrla_tpu.hub' has no attribute '{name}' "
            f"(not a registered arch; see mrla_tpu.hub.list_models())"
        ) from None


def __dir__():
    return sorted(set(globals()) | set(registry.list_models()))


def list_models() -> list:
    return registry.list_models()


def convert_torch_state_dict(arch: str, state_dict: Mapping[str, Any]) -> Dict:
    """Route a reference torch state_dict to the right converter by arch.

    Mirrors the dispatch the serving CLI uses (serving/cli.py): MRLA-base
    checkpoints nest one extra module level, ViT-family checkpoints use the
    token layout, everything convolutional goes through the ResNet-family
    converter.
    """
    from mrla_tpu.ckpt import (
        convert_mrla_base_state_dict,
        convert_resnet_state_dict,
        convert_vit_state_dict,
    )

    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    if "_mrlab" in arch:
        return convert_mrla_base_state_dict(sd)
    if arch.startswith(("deit", "vit")):
        variant = "light" if "mrlal" in arch else (
            "base" if "mrlab" in arch else "plain"
        )
        return convert_vit_state_dict(sd, variant=variant)
    if arch.startswith(("resnet", "resnext", "efficientnet")):
        return convert_resnet_state_dict(sd)
    raise ValueError(
        f"no torch-checkpoint converter for arch family '{arch}'; "
        "load the weights manually (see docs/RUNBOOK.md)"
    )


def load(
    name: str,
    checkpoint: Optional[str] = None,
    *,
    image_size: int = 224,
    seed: int = 0,
    **kwargs,
) -> Tuple[Any, Dict]:
    """Create a registered model and its variables in one call.

    The hub analog of ``torch.hub.load(..., name, pretrained=True)``:
    without ``checkpoint`` the variables are a fresh ``model.init``; with
    it, a reference ``.pth.tar`` is converted via
    :func:`convert_torch_state_dict` (an orbax checkpoint directory also
    works — it is detected by not being a loadable torch file).

    Returns ``(model, variables)``; run with
    ``model.apply(variables, x, train=False)``.
    """
    import jax
    import jax.numpy as jnp

    model = registry.create_model(name, **kwargs)
    if checkpoint is None:
        variables = model.init(
            jax.random.key(seed),
            jnp.zeros((1, image_size, image_size, 3), jnp.float32),
            train=False,
        )
        return model, dict(variables)

    import os

    if os.path.isdir(checkpoint):
        from mrla_tpu.ckpt import restore_checkpoint

        for ckpt_name in ("best", "checkpoint"):
            out = restore_checkpoint(checkpoint, None, name=ckpt_name)
            if out is not None:
                return model, dict(out)
        raise FileNotFoundError(
            f"no 'best' or 'checkpoint' entry under {checkpoint}"
        )

    import torch

    sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd.get("model", sd)) if isinstance(sd, dict) else sd
    return model, convert_torch_state_dict(name, sd)


def named_apply(
    fn: Callable,
    tree: Mapping[str, Any],
    name: str = "",
    depth_first: bool = True,
    include_root: bool = False,
) -> Mapping[str, Any]:
    """Flax-tree analog of the reference's module walk (helpers.py:19-27).

    Calls ``fn(subtree=..., name=...)`` on every dict node of a nested
    variables/params tree with its dotted path, in the reference's
    depth-first/include-root order.  ``fn`` mutates in place (the torch
    idiom); the tree is returned for chaining.
    """
    if not depth_first and include_root:
        fn(subtree=tree, name=name)
    for child_name, child in tree.items():
        if isinstance(child, Mapping):
            path = f"{name}.{child_name}" if name else child_name
            named_apply(fn, child, name=path, depth_first=depth_first,
                        include_root=True)
    if depth_first and include_root:
        fn(subtree=tree, name=name)
    return tree
