"""Golden-value tests: JAX MRLA ops vs independent torch oracles (fp32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mrla_tpu.ops import (
    eca_kernel_size,
    channel_conv1d,
    eca_gate,
    se_gate,
    mrla_light_attention,
    mrla_base_attention,
    la_eq4_attention,
    linear_la_step,
)
from mrla_tpu.ops.common import depthwise_conv3x3, max_pool_same_torch
from mrla_tpu.ops.mrla import MRLAParams
from mrla_tpu.ops.drop import drop_path

from tests.torch_oracles import (
    channel_conv1d_torch,
    mrla_light_oracle,
    mrla_base_oracle,
    la_eq4_oracle,
    linear_la_oracle,
    linear_la_svd_oracle,
    se_oracle,
    eca_oracle,
)

RTOL, ATOL = 1e-4, 1e-5


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _dw_oihw(wv_hwio):
    # [3,3,1,C] HWIO -> [C,1,3,3] OIHW
    return torch.from_numpy(np.transpose(wv_hwio, (3, 2, 0, 1)))


def test_eca_kernel_size_heuristic():
    # ECA: k = t if t odd else t+1, t = int(|log2(C)+1|/2)
    assert eca_kernel_size(64) == 3
    assert eca_kernel_size(256) == 5
    assert eca_kernel_size(512) == 5
    assert eca_kernel_size(1024) == 5
    assert eca_kernel_size(2048) == 7
    assert eca_kernel_size(192) == 5


@pytest.mark.parametrize("k", [1, 3, 5, 7])
def test_channel_conv1d(k):
    rng = np.random.default_rng(0)
    y = _rand(rng, 4, 64)
    w = _rand(rng, k)
    got = channel_conv1d(jnp.asarray(y), jnp.asarray(w))
    want = channel_conv1d_torch(torch.from_numpy(y), torch.from_numpy(w))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=RTOL, atol=ATOL)


def test_depthwise_conv3x3():
    rng = np.random.default_rng(1)
    x = _rand(rng, 2, 8, 8, 16)
    wv = _rand(rng, 3, 3, 1, 16)
    got = depthwise_conv3x3(jnp.asarray(x), jnp.asarray(wv))
    want = torch.nn.functional.conv2d(_nchw(x), _dw_oihw(wv), padding=1, groups=16)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(want), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("heads,gelu_v", [(2, False), (4, False), (4, True)])
def test_mrla_light(heads, gelu_v):
    rng = np.random.default_rng(2)
    c = 32
    x = _rand(rng, 2, 6, 6, c)
    wq, wk = _rand(rng, 3), _rand(rng, 3)
    wv = _rand(rng, 3, 3, 1, c)
    params = MRLAParams(jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv))
    # torch F.gelu defaults to exact erf; jax.nn.gelu defaults to tanh approx
    act = (lambda v: jax.nn.gelu(v, approximate=False)) if gelu_v else None
    got = mrla_light_attention(jnp.asarray(x), params, heads, act_v=act)
    want = mrla_light_oracle(
        _nchw(x), torch.from_numpy(wq), torch.from_numpy(wk), _dw_oihw(wv),
        heads, gelu_v=gelu_v,
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(want), rtol=1e-3, atol=1e-4)


def test_mrla_base_recurrence():
    rng = np.random.default_rng(3)
    c, heads, layers = 32, 2, 4
    xs = [_rand(rng, 2, 5, 5, c) for _ in range(layers)]
    wqs = [_rand(rng, 3) for _ in range(layers)]
    wks = [_rand(rng, 3) for _ in range(layers)]
    wvs = [_rand(rng, 3, 3, 1, c) for _ in range(layers)]

    cache = None
    got = []
    for t in range(layers):
        params = MRLAParams(jnp.asarray(wqs[t]), jnp.asarray(wks[t]), jnp.asarray(wvs[t]))
        out, cache = mrla_base_attention(jnp.asarray(xs[t]), params, heads, cache)
        got.append(np.asarray(out))
    assert cache.k.shape == (2, layers, c)
    assert cache.v.shape == (2, layers, 5, 5, c)

    want = mrla_base_oracle(
        [_nchw(x) for x in xs],
        [torch.from_numpy(w) for w in wqs],
        [torch.from_numpy(w) for w in wks],
        [_dw_oihw(w) for w in wvs],
        heads,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, _to_nhwc(w), rtol=1e-3, atol=1e-4)


def test_la_eq4():
    rng = np.random.default_rng(4)
    c, heads, t = 16, 4, 3
    x = _rand(rng, 2, 4, 4, c)
    ctx = _rand(rng, 2, t, 4, 4, c)
    wq, wk = _rand(rng, 3), _rand(rng, 3)
    wv = _rand(rng, 3, 3, 1, c)
    params = MRLAParams(jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv))
    got = la_eq4_attention(jnp.asarray(x), jnp.asarray(ctx), params, heads)
    want = la_eq4_oracle(
        _nchw(x),
        torch.from_numpy(np.transpose(ctx, (0, 1, 4, 2, 3))),
        torch.from_numpy(wq), torch.from_numpy(wk), _dw_oihw(wv), heads,
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(want), rtol=1e-3, atol=1e-4)


def test_linear_la_recurrence():
    rng = np.random.default_rng(5)
    c, layers = 8, 3
    xs = [_rand(rng, 2, 4, 4, c) for _ in range(layers)]
    wqs = [_rand(rng, 3) for _ in range(layers)]
    wks = [_rand(rng, 3) for _ in range(layers)]
    wvs = [_rand(rng, 3, 3, 1, c) for _ in range(layers)]

    s = z = None
    got = []
    for t in range(layers):
        params = MRLAParams(jnp.asarray(wqs[t]), jnp.asarray(wks[t]), jnp.asarray(wvs[t]))
        out, s, z = linear_la_step(jnp.asarray(xs[t]), s, z, params)
        got.append(np.asarray(out))

    want = linear_la_oracle(
        [_nchw(x) for x in xs],
        [torch.from_numpy(w) for w in wqs],
        [torch.from_numpy(w) for w in wks],
        [_dw_oihw(w) for w in wvs],
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, _to_nhwc(w), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("rank", [None, 4])
def test_linear_la_svd_recurrence(rank):
    """svd=True carries the state factorized (+ optional rank-k truncation),
    reference linear_la.py:86-105.  Compared against the torch restatement
    on OUTPUTS (SVD factors have per-column sign ambiguity across libraries;
    outputs are invariant)."""
    rng = np.random.default_rng(15)
    c, layers = 8, 3
    xs = [_rand(rng, 2, 4, 4, c) for _ in range(layers)]
    wqs = [_rand(rng, 3) for _ in range(layers)]
    wks = [_rand(rng, 3) for _ in range(layers)]
    wvs = [_rand(rng, 3, 3, 1, c) for _ in range(layers)]

    s = z = None
    got = []
    for t in range(layers):
        params = MRLAParams(
            jnp.asarray(wqs[t]), jnp.asarray(wks[t]), jnp.asarray(wvs[t])
        )
        out, s, z = linear_la_step(
            jnp.asarray(xs[t]), s, z, params, svd=True, svd_rank=rank
        )
        got.append(np.asarray(out))
    assert len(s) == 3 and s[1].shape[-1] == (rank or c)

    want = linear_la_svd_oracle(
        [_nchw(x) for x in xs],
        [torch.from_numpy(w) for w in wqs],
        [torch.from_numpy(w) for w in wks],
        [_dw_oihw(w) for w in wvs],
        rank=rank,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, _to_nhwc(w), rtol=1e-3, atol=1e-4)

    if rank is None:
        # Reduced (untruncated) factorization must be lossless: identical
        # trajectory to the plain recurrence.
        plain = linear_la_oracle(
            [_nchw(x) for x in xs],
            [torch.from_numpy(w) for w in wqs],
            [torch.from_numpy(w) for w in wks],
            [_dw_oihw(w) for w in wvs],
        )
        for g, w in zip(got, plain):
            np.testing.assert_allclose(g, _to_nhwc(w), rtol=1e-3, atol=1e-4)


def test_se_gate():
    rng = np.random.default_rng(6)
    c, r = 32, 4
    x = _rand(rng, 2, 4, 4, c)
    w1 = _rand(rng, c, c // r)   # ours: [C, C//r]
    w2 = _rand(rng, c // r, c)
    got = se_gate(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))
    want = se_oracle(_nchw(x), torch.from_numpy(w1.T.copy()), torch.from_numpy(w2.T.copy()))
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(want), rtol=1e-4, atol=1e-5)


def test_eca_gate():
    rng = np.random.default_rng(7)
    c = 64
    x = _rand(rng, 2, 4, 4, c)
    w = _rand(rng, 3)
    got = eca_gate(jnp.asarray(x), jnp.asarray(w))
    want = eca_oracle(_nchw(x), torch.from_numpy(w))
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(want), rtol=1e-4, atol=1e-5)


def test_max_pool_matches_torch():
    rng = np.random.default_rng(8)
    x = _rand(rng, 2, 9, 9, 4)
    got = max_pool_same_torch(jnp.asarray(x), window=3, stride=2)
    want = torch.nn.functional.max_pool2d(_nchw(x), 3, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(want), rtol=RTOL, atol=ATOL)


def test_drop_path():
    x = jnp.ones((8, 4, 4, 4))
    # deterministic: identity
    np.testing.assert_array_equal(np.asarray(drop_path(x, 0.5, None, True)), np.ones_like(x))
    # stochastic: rows are either 0 or 1/keep
    out = drop_path(x, 0.5, jax.random.key(0), False)
    per_sample = np.asarray(out).reshape(8, -1)
    for row in per_sample:
        assert np.allclose(row, 0.0) or np.allclose(row, 2.0)
