"""Backbone pyramid contract + FPN shapes + freeze mask semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.detect import FPN, MRLABackboneFPN, freeze_mask
from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight


def test_backbone_pyramid_contract():
    m = ResNetMRLALight(layers=[1, 1, 1, 1], features_only=True, use_drop_path=False)
    v = m.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)), train=False)
    feats = m.apply(v, jnp.zeros((2, 128, 128, 3)), train=False)
    # C2..C5 at strides 4/8/16/32, channels 256/512/1024/2048
    assert [f.shape for f in feats] == [
        (2, 32, 32, 256),
        (2, 16, 16, 512),
        (2, 8, 8, 1024),
        (2, 4, 4, 2048),
    ]


def test_fpn_num_outs_and_shapes():
    feats = [
        jnp.zeros((2, 32, 32, 256)),
        jnp.zeros((2, 16, 16, 512)),
        jnp.zeros((2, 8, 8, 1024)),
        jnp.zeros((2, 4, 4, 2048)),
    ]
    # faster-rcnn style: 5 outs, maxpool extra
    fpn = FPN(out_channels=256, num_outs=5)
    v = fpn.init(jax.random.key(0), feats)
    outs = fpn.apply(v, feats)
    assert [o.shape for o in outs] == [
        (2, 32, 32, 256), (2, 16, 16, 256), (2, 8, 8, 256),
        (2, 4, 4, 256), (2, 2, 2, 256),
    ]
    # retinanet style: start_level=1, extra convs on input
    fpn2 = FPN(out_channels=256, num_outs=5, start_level=1, add_extra_convs="on_input")
    v2 = fpn2.init(jax.random.key(0), feats)
    outs2 = fpn2.apply(v2, feats)
    assert [o.shape for o in outs2] == [
        (2, 16, 16, 256), (2, 8, 8, 256), (2, 4, 4, 256),
        (2, 2, 2, 256), (2, 1, 1, 256),
    ]


def test_backbone_fpn_end_to_end_and_freeze():
    m = MRLABackboneFPN(layers=(1, 1, 1, 1))
    v = m.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)), train=False)
    outs = m.apply(v, jnp.zeros((1, 128, 128, 3)), train=False)
    assert len(outs) == 5

    mask = freeze_mask(v["params"], frozen_stages=1)
    import flax

    flat = flax.traverse_util.flatten_dict(mask)
    stem_keys = [k for k in flat if k[0] == "backbone" and k[1].startswith("stem")]
    l1 = [k for k in flat if k[0] == "backbone" and k[1].startswith("layer1_")]
    l2 = [k for k in flat if k[0] == "backbone" and k[1].startswith("layer2_")]
    neck = [k for k in flat if k[0] == "neck"]
    assert stem_keys and all(not flat[k] for k in stem_keys)
    assert l1 and all(not flat[k] for k in l1)
    assert l2 and all(flat[k] for k in l2)
    assert neck and all(flat[k] for k in neck)


def test_load_backbone_from_classification():
    """Grafted classification weights must reproduce the classification
    trunk's features through the joint backbone+FPN module (the reference's
    init_cfg=Pretrained flow, faster_rcnn_r50mrlal_fpn.py:14)."""
    from mrla_tpu.detect import load_backbone_from_classification

    layers = [1, 1, 1, 1]
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 64, 64, 3)), jnp.float32
    )

    # "classification checkpoint": a features_only trunk with its own init
    cls = ResNetMRLALight(layers=layers, features_only=True,
                          use_drop_path=False)
    cls_vars = cls.init(jax.random.key(5), jnp.zeros((1, 64, 64, 3)),
                        train=False)
    want = cls.apply(cls_vars, x, train=False)

    det = MRLABackboneFPN(layers=layers)
    det_vars = det.init(jax.random.key(6), jnp.zeros((1, 64, 64, 3)),
                        train=False)
    grafted = load_backbone_from_classification(
        jax.device_get(det_vars), jax.device_get(cls_vars)
    )

    # truth: classification features -> FPN with the det tree's neck params
    neck = FPN()
    want_out = neck.apply({"params": grafted["params"]["neck"]}, want)
    got_out = det.apply(grafted, x, train=False)
    for got, ref in zip(got_out, want_out):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    # missing keys fail loudly
    import pytest as _pytest

    broken = jax.tree.map(lambda a: a, cls_vars)
    del broken["params"]["stem"]
    with _pytest.raises(KeyError):
        load_backbone_from_classification(jax.device_get(det_vars),
                                          jax.device_get(broken))


def test_fpn_odd_feature_sizes():
    """MMDet interpolates the top-down path to the EXACT lateral size; odd
    feature maps (the presets' own 1333px side gives 334/167/84/42) must
    not crash the lateral add."""
    fpn = FPN(out_channels=8)
    feats = [
        jnp.zeros((1, 334, 167, 16)),
        jnp.zeros((1, 167, 84, 32)),
        jnp.zeros((1, 84, 42, 64)),
        jnp.zeros((1, 42, 21, 128)),
    ]
    v = fpn.init(jax.random.key(0), feats)
    outs = fpn.apply(v, feats)
    assert [o.shape[1:3] for o in outs] == [
        (334, 167), (167, 84), (84, 42), (42, 21), (21, 11)
    ]


def test_fpn_num_outs_trim():
    """mmdet end_level semantics (ADVICE r2): with num_outs < pyramid depth
    the excluded top levels get NO lateral/output conv params and feed no
    top-down contribution."""
    fpn = FPN(out_channels=8, num_outs=3)
    feats = [jnp.zeros((1, 2 ** (5 - i), 2 ** (5 - i), 8)) for i in range(4)]
    v = fpn.init(jax.random.key(0), feats)
    outs = fpn.apply(v, feats)
    assert len(outs) == 3
    conv_names = set(v["params"])
    assert "lateral3" not in conv_names and "fpn_conv3" not in conv_names
    # excluded level does not contribute: changing feats[3] changes nothing
    feats2 = list(feats)
    feats2[3] = feats2[3] + 100.0
    outs2 = fpn.apply(v, feats2)
    for a, b in zip(outs, outs2):
        assert jnp.array_equal(a, b)


# ---------------------------------------------------------------------------
# Executed-reference parity for the MMDetection backbone (VERDICT r2 next-2):
# the mmdet ResNet_mrlal differs from the classification model (no DropPath
# in the epilogue :86,:116; frozen-stage semantics :307-323; norm_eval BN
# freeze :358-367) — execute the reference via tests/mmcv_shim.py and
# require C2..C5 feature parity through convert_resnet_state_dict.
# ---------------------------------------------------------------------------


def _mmdet_pair(layers=(1, 1, 1, 1), seed=0, **ref_kw):
    import torch

    from tests.mmcv_shim import load_reference_backbone

    from mrla_tpu.ckpt import convert_resnet_state_dict
    from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight

    ref = load_reference_backbone()
    torch.manual_seed(seed)
    tm = ref.ResNet_mrlal(layers=list(layers), **ref_kw)
    # randomize BN running stats so frozen-BN parity is non-trivial
    g = torch.Generator().manual_seed(seed + 1)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    fm = ResNetMRLALight(layers=list(layers), features_only=True,
                         use_drop_path=False)
    variables = jax.tree.map(
        jnp.asarray, convert_resnet_state_dict(tm.state_dict())
    )
    return tm, fm, variables


def _pyramid_allclose(got, want_torch):
    import numpy as np

    assert len(got) == len(want_torch) == 4
    for g, w in zip(got, want_torch):
        w = np.transpose(w.numpy(), (0, 2, 3, 1))  # NCHW -> NHWC
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-3, atol=3e-4)


def test_mmdet_backbone_eval_parity():
    import numpy as np
    import torch

    tm, fm, variables = _mmdet_pair()
    tm.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = fm.apply(variables, jnp.asarray(x), train=False)
    _pyramid_allclose(got, want)


def test_mmdet_backbone_norm_eval_train_mode_parity():
    """norm_eval=True (the configs' default): .train() keeps every BN in
    eval mode (resnet_mrlal.py:358-367), so the reference's TRAIN-mode
    forward equals our train=False apply (the mmdet epilogue has no
    DropPath and the backbone has no dropout)."""
    import numpy as np
    import torch

    tm, fm, variables = _mmdet_pair(seed=3, norm_eval=True)
    tm.train()  # triggers the norm_eval BN re-freeze
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = fm.apply(variables, jnp.asarray(x), train=False)
    _pyramid_allclose(got, want)


def test_mmdet_frozen_stages_matches_reference_requires_grad():
    """freeze_mask reproduces the reference's _freeze_stages requires_grad
    pattern (resnet_mrlal.py:307-323): frozen_stages=k freezes conv1/bn1
    and layer1..layerk."""
    import flax

    for frozen in (-1, 0, 1, 2):
        tm, fm, variables = _mmdet_pair(seed=5, frozen_stages=frozen)
        tm.train()  # _freeze_stages runs inside .train()

        want = {}  # torch: name -> requires_grad
        for name, p in tm.named_parameters():
            want[name] = p.requires_grad

        mask = freeze_mask({"backbone": variables["params"]}, frozen)
        flat = flax.traverse_util.flatten_dict(mask["backbone"])

        def torch_name(key):
            # ("stem","conv1","kernel") -> conv1 ; ("layer2_0","conv1",...)
            if key[0] == "stem":
                return {"conv1": "conv1", "bn1": "bn1"}[key[1]]
            stage, block = key[0].split("_")
            return f"layer{stage[len('layer'):]}.{block}"

        for key, trainable in flat.items():
            prefix = torch_name(key)
            ref_vals = {v for n, v in want.items() if n.startswith(prefix)}
            assert len(ref_vals) == 1, (prefix, ref_vals)
            assert trainable == ref_vals.pop(), (key, frozen)


def test_convert_mmdet_full_checkpoint():
    """A full mmdet-style detector state dict (backbone.* from the EXECUTED
    reference ResNet_mrlal + neck.lateral_convs/fpn_convs in mmdet naming)
    converts into the MRLABackboneFPN tree: backbone features match the
    torch reference, and the neck weights land on the right FPN convs
    (verified by applying the flax FPN with the same weights fed manually)."""
    import torch

    from tests.mmcv_shim import load_reference_backbone

    from mrla_tpu.ckpt import convert_mmdet_state_dict

    ref = load_reference_backbone()
    torch.manual_seed(11)
    tm = ref.ResNet_mrlal(layers=[1, 1, 1, 1])
    tm.eval()

    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    # mmdet-style neck: 4 laterals (1x1), 4 fpn convs (3x3)
    g = torch.Generator().manual_seed(12)
    in_ch = [256, 512, 1024, 2048]
    for i in range(4):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = torch.randn(
            (256, in_ch[i], 1, 1), generator=g) * 0.05
        sd[f"neck.lateral_convs.{i}.conv.bias"] = torch.randn((256,), generator=g)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = torch.randn(
            (256, 256, 3, 3), generator=g) * 0.05
        sd[f"neck.fpn_convs.{i}.conv.bias"] = torch.randn((256,), generator=g)
    # ignored head keys must not break conversion
    sd["rpn_head.rpn_conv.weight"] = torch.zeros((256, 256, 3, 3))

    det_vars = jax.tree.map(
        jnp.asarray,
        convert_mmdet_state_dict({k: v for k, v in sd.items()
                                  if not k.startswith("rpn_head")}),
    )

    det = MRLABackboneFPN(layers=(1, 1, 1, 1))
    x = np.random.default_rng(13).standard_normal((2, 64, 64, 3)).astype(
        np.float32)
    got = det.apply(det_vars, jnp.asarray(x), train=False)
    assert len(got) == 5

    # backbone features parity vs the executed reference
    with torch.no_grad():
        c_feats = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    backbone = ResNetMRLALight(layers=[1, 1, 1, 1], features_only=True,
                               use_drop_path=False)
    bb_vars = {"params": det_vars["params"]["backbone"],
               "batch_stats": det_vars["batch_stats"]["backbone"]}
    bb_got = backbone.apply(bb_vars, jnp.asarray(x), train=False)
    for gf, wf in zip(bb_got, c_feats):
        np.testing.assert_allclose(
            np.asarray(gf), np.transpose(wf.numpy(), (0, 2, 3, 1)),
            rtol=2e-3, atol=3e-4)

    # neck weights landed correctly: applying the flax FPN with the
    # converted neck params to the backbone features reproduces the joint
    # module's output exactly
    neck_out = FPN().apply({"params": det_vars["params"]["neck"]}, bb_got)
    for a, b in zip(got, neck_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
