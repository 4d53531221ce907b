"""Params & FLOPs accounting (replaces the reference's thop wrappers,
resnet/paras_flops.py + deit/params_flops.py) via XLA's own cost analysis."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params: Any) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def count_flops(model, input_shape=(1, 224, 224, 3), variables=None) -> Optional[float]:
    """Forward-pass FLOPs from XLA cost analysis (MACs*2 convention ≈ thop*2)."""
    if variables is None:
        variables = model.init(jax.random.key(0), jnp.zeros(input_shape), train=False)
    lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
        variables, jnp.zeros(input_shape)
    )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", float("nan"))) if cost else None


def profile_model(name: str, input_shape=(1, 224, 224, 3), **model_kw) -> dict:
    """Equivalent of the reference compute_params scripts: build by arch name,
    report params and forward FLOPs."""
    from mrla_tpu.models import create_model

    model = create_model(name, **model_kw)
    variables = model.init(jax.random.key(0), jnp.zeros(input_shape), train=False)
    n_params = count_params(variables["params"])
    flops = count_flops(model, input_shape, variables)
    return {
        "model": name,
        "params": n_params,
        "params_m": round(n_params / 1e6, 3),
        "flops": flops,
        # None (no cost analysis on this backend) and NaN both -> None
        "gflops": (
            round(flops / 1e9, 3)
            if flops is not None and flops == flops
            else None
        ),
    }


if __name__ == "__main__":
    import argparse
    import json

    p = argparse.ArgumentParser("FLOPs/params profiler")
    p.add_argument("models", nargs="+")
    p.add_argument("--image-size", type=int, default=224)
    args = p.parse_args()
    for name in args.models:
        print(json.dumps(profile_model(
            name, (1, args.image_size, args.image_size, 3))))
