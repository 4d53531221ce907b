"""EfficientNet-B0(-MRLA) sanity: shapes, param count, residual structure."""

import numpy as np
import jax
import jax.numpy as jnp

from mrla_tpu.models import create_model


def test_efficientnet_b0_shape_and_params():
    m = create_model("efficientnet_b0", num_classes=1000)
    v = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    # canonical B0 ≈ 5.29M params
    assert 5.0e6 < n < 5.6e6, n
    out = m.apply(v, jnp.zeros((2, 224, 224, 3)), train=False)
    assert out.shape == (2, 1000)


def test_efficientnet_b0_stage_shapes_and_flops():
    """Pin the B0 trunk against the paper table (EfficientNet Table 1):
    stage output channels [16,24,40,80,112,192,320] at resolutions
    [112,56,28,14,14,7,7] for 224px input, and ~0.39 GMACs total."""
    from mrla_tpu.utils.flops import count_flops

    m = create_model("efficientnet_b0", num_classes=1000)
    v = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)

    _, inter = m.apply(v, jnp.zeros((1, 224, 224, 3)), train=False,
                       capture_intermediates=True)
    inter = inter["intermediates"]
    expect = [(112, 16), (56, 24), (28, 40), (14, 80), (14, 112), (7, 192),
              (7, 320)]
    repeats = [1, 2, 2, 3, 3, 4, 1]
    for si, ((hw, ch), rep) in enumerate(zip(expect, repeats)):
        out = inter[f"stage{si}_{rep - 1}"]["__call__"][0]
        assert out.shape == (1, hw, hw, ch), (si, out.shape)

    flops = count_flops(m, (1, 224, 224, 3), variables=v)
    # XLA cost analysis counts mul+add separately: ~2 * 0.39 GMACs.
    assert flops is not None and 0.65e9 < flops < 0.95e9, flops


def test_efficientnet_mrlal_b0_placement_and_param_delta():
    """Pin the re-derived mrlal variant the same way the b0 baseline is
    pinned (no reference source exists — SURVEY §0): MRLA-light lands on
    exactly the residual-capable MBConv blocks (stride 1, in==out, i.e.
    every non-first block of each stage: 9 of 16 blocks), and the param
    delta vs plain b0 equals the closed-form MRLA+bn_mrla cost per block:
    2k (wq,wk conv1d taps, ECA heuristic) + 9C (dw3x3 value) + C (lambda)
    + 2C (bn_mrla scale/bias)."""
    from mrla_tpu.ops.common import eca_kernel_size

    mb = create_model("efficientnet_mrlal_b0", num_classes=1000)
    m0 = create_model("efficientnet_b0", num_classes=1000)
    vb = mb.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    v0 = m0.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)

    # placement: exactly the residual blocks (bi > 0 in every stage)
    repeats = [1, 2, 2, 3, 3, 4, 1]
    chans = [16, 24, 40, 80, 112, 192, 320]
    expect_blocks = {
        f"stage{si}_{bi}"
        for si, rep in enumerate(repeats)
        for bi in range(1, rep)
    }
    have_blocks = {
        name for name in vb["params"] if "mrla" in vb["params"].get(name, {})
    }
    assert have_blocks == expect_blocks, (have_blocks, expect_blocks)
    assert len(expect_blocks) == 9

    # closed-form param delta
    count = lambda v: sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v))
    delta = count(vb["params"]) - count(v0["params"])
    expect_delta = sum(
        (rep - 1) * (2 * eca_kernel_size(c) + 9 * c + c + 2 * c)
        for rep, c in zip(repeats, chans)
    )
    assert delta == expect_delta, (delta, expect_delta)

    # per-block shape pins on one representative stage (C=112, k from the
    # ECA heuristic)
    p = vb["params"]["stage4_1"]["mrla"]["mrla"]["proj"]
    k = eca_kernel_size(112)
    assert p["wq"].shape == (k,) and p["wk"].shape == (k,)
    assert p["wv"].shape == (3, 3, 1, 112)
    assert vb["params"]["stage4_1"]["mrla"]["lambda_t"].shape == (112,)

    # FLOPs delta: MRLA is lightweight — under 3% on top of b0's ~0.78 GF
    from mrla_tpu.utils.flops import count_flops

    f0 = count_flops(m0, (1, 224, 224, 3), variables=v0)
    fb = count_flops(mb, (1, 224, 224, 3), variables=vb)
    if f0 is not None and fb is not None:
        assert fb > f0, (fb, f0)
        assert (fb - f0) / f0 < 0.03, (fb, f0)


def test_efficientnet_mrlal_b0_runs():
    m = create_model("efficientnet_mrlal_b0", num_classes=10)
    v = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    # MRLA adds params only on residual-capable blocks
    has_mrla = [k for k in jax.tree_util.tree_flatten_with_path(v["params"])[0]
                if any("mrla" in str(p) for p in k[0])]
    assert has_mrla
    out = m.apply(
        v, jnp.asarray(np.random.default_rng(0).standard_normal((2, 224, 224, 3)),
                       jnp.float32),
        train=False,
    )
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
