"""Tests: distillation loss vs torch oracle, pos-embed interp, randaugment,
FLOPs counting, log tools."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mrla_tpu.train.losses import distillation_loss, cross_entropy
from mrla_tpu.utils import interpolate_pos_embed, reset_classifier, count_params
from mrla_tpu.utils.logtools import best_from_txt, best_from_jsonl, txt_to_csv
from mrla_tpu.data.randaugment import rand_augment


def test_distillation_soft_matches_torch():
    rng = np.random.default_rng(0)
    s = rng.standard_normal((4, 10)).astype(np.float32)
    t = rng.standard_normal((4, 10)).astype(np.float32)
    tau, alpha, base = 3.0, 0.5, 1.7

    # torch reference formulation (deit/losses.py:54-63 soft branch):
    # F.kl_div(..., reduction='sum') * τ² / numel — numel = B*K ("legacy
    # PyTorch behavior" per the reference's own comment)
    st, tt = torch.from_numpy(s), torch.from_numpy(t)
    kl = F.kl_div(
        F.log_softmax(st / tau, dim=1), F.log_softmax(tt / tau, dim=1),
        reduction="sum", log_target=True,
    ) * (tau * tau) / st.numel()
    want = base * (1 - alpha) + float(kl) * alpha

    got = float(distillation_loss(jnp.float32(base), jnp.asarray(s), jnp.asarray(t),
                                  kind="soft", alpha=alpha, tau=tau))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_distillation_hard():
    s = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
    t = jnp.asarray([[5.0, 0.0], [0.0, 5.0]])
    out = distillation_loss(jnp.float32(1.0), s, t, kind="hard", alpha=1.0)
    assert float(out) < 0.01  # student already matches teacher argmax


def test_interpolate_pos_embed():
    pe = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1 + 196, 8)),
                     jnp.float32)
    out = interpolate_pos_embed(pe, new_num_patches=576)  # 24x24
    assert out.shape == (1, 577, 8)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pe[:, 0]))
    # identity when grid unchanged
    same = interpolate_pos_embed(pe, 196)
    np.testing.assert_allclose(np.asarray(same), np.asarray(pe), atol=1e-5)


def test_reset_classifier():
    params = {"head": {"kernel": jnp.ones((8, 10)), "bias": jnp.ones((10,))},
              "block0": {"w": jnp.ones((3, 3))}}
    out = reset_classifier(params, 21, jax.random.key(0))
    assert out["head"]["kernel"].shape == (8, 21)
    # reference fine-tune keeps the model's fresh head init: trunc-normal
    # std 0.02 weight, zero bias (not an all-zero head)
    k = np.asarray(out["head"]["kernel"])
    assert 0.005 < k.std() < 0.04 and abs(k).max() <= 0.04 + 1e-6
    assert float(np.abs(np.asarray(out["head"]["bias"])).sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(out["block0"]["w"]), np.ones((3, 3)))


def test_rand_augment_batch():
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (4, 24, 24, 3)), jnp.float32
    )
    out = rand_augment(jax.random.key(0), imgs)
    assert out.shape == imgs.shape
    assert bool(jnp.isfinite(out).all())
    # different keys -> different augmentations
    out2 = rand_augment(jax.random.key(1), imgs)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_count_params_and_logtools(tmp_path):
    assert count_params({"a": jnp.ones((2, 3)), "b": {"c": jnp.ones(5)}}) == 11

    run = tmp_path / "run"
    os.makedirs(run)
    with open(run / "val_acc1.txt", "w") as f:
        f.write("0 10.0\n1 30.0\n2 20.0\n")
    with open(run / "train_loss.txt", "w") as f:
        f.write("0 2.0\n1 1.0\n2 0.5\n")
    with open(run / "log.txt", "w") as f:
        for e, a in [(0, 10.0), (1, 30.0), (2, 20.0)]:
            f.write(json.dumps({"epoch": e, "test_acc1": a}) + "\n")

    assert best_from_txt(str(run / "val_acc1.txt")) == {"epoch": 1, "value": 30.0}
    assert best_from_jsonl(str(run / "log.txt"))["epoch"] == 1
    n = txt_to_csv(str(run), str(tmp_path / "out.csv"))
    assert n == 3


def test_interpolate_pos_embed_matches_torch_bicubic():
    """Pos-embed interpolation must be torch-EXACT: F.interpolate bicubic
    uses the A=-0.75 cubic convolution (deit/main.py:283), while
    jax.image.resize bicubic is the Keys A=-0.5 kernel — the difference is
    O(1e-2) relative and breaks converted-checkpoint parity."""
    rng = np.random.default_rng(0)
    grid = rng.standard_normal((1, 1 + 14 * 14, 16)).astype(np.float32)

    got = np.asarray(interpolate_pos_embed(jnp.asarray(grid), 24 * 24))

    pt = torch.from_numpy(grid[:, 1:].reshape(1, 14, 14, 16).transpose(0, 3, 1, 2))
    want_grid = F.interpolate(pt, size=(24, 24), mode="bicubic",
                              align_corners=False)
    want = want_grid.permute(0, 2, 3, 1).reshape(1, 24 * 24, 16).numpy()
    np.testing.assert_allclose(got[:, 1:], want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[:, 0], grid[:, 0])
