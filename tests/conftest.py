"""Test environment: force CPU with 8 virtual devices (the JAX fake-backend
trick, SURVEY.md §4) so sharding tests run without multi-chip TPU hardware.

Note: this machine's sitecustomize registers an 'axon' TPU backend and sets
jax.config jax_platforms='axon,cpu' at interpreter start, overriding the
JAX_PLATFORMS env var — so we must update the config again here, before any
device is touched.
"""

import os

_ON_TPU = os.environ.get("MRLA_TPU_TESTS") == "1"

if not _ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    # NOTE: do NOT enable jax_compilation_cache_dir here — compiles route
    # through this machine's remote-compile service and the cached CPU AOT
    # artifacts target the SERVER's microarchitecture (SIGILL risk on load).

    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the CPU backend"
    )
    assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"
# MRLA_TPU_TESTS=1 leaves the default backend (the real chip) in place so
# the `tpu`-marked Pallas-numerics tests can execute:
#   MRLA_TPU_TESTS=1 pytest -m tpu -q tests/test_kernels_tpu.py


# Suite rebalance (round 4): the heavyweight executed-reference /
# CLI / multi-process integration tests, auto-marked slow so the
# DEFAULT 1-core CPU run stays under ~15 min.  Durations measured
# 2026-08-20 (full suite 79 min); every subsystem keeps at least one
# fast representative in the default run.  Full coverage:
#   python -m pytest tests/ -q                     (default, ~15 min)
#   python -m pytest tests/ -q -m "not tpu"        (full CPU run, ~80 min)
_AUTO_SLOW = {
    "tests/test_cifar_distill.py::test_distillation_train_step",
    "tests/test_cli_archs.py::test_cli_internal_dropout_archs_train[deit_mrlab_tiny_patch16_224-extra1]",
    "tests/test_cli_archs.py::test_cli_internal_dropout_archs_train[efficientnet_mrlal_b0-extra0]",
    "tests/test_detect_cli.py::test_coco_cli_end_to_end",
    "tests/test_detect_cli.py::test_faster_rcnn_cli_synthetic_and_resume",
    "tests/test_detect_cli.py::test_mask_rcnn_cli_coco_segmentation",
    "tests/test_detect_cli.py::test_mask_rcnn_cli_synthetic_segm_eval",
    "tests/test_detect_cli.py::test_pretrained_backbone_graft_from_classification_run",
    "tests/test_detect_cli.py::test_retinanet_cli_dp8",
    "tests/test_detect_cli.py::test_retinanet_cli_synthetic",
    "tests/test_detect_multidevice.py::test_retinanet_dp_matches_single_device",
    "tests/test_detect_multidevice.py::test_retinanet_dp_training_steps",
    "tests/test_detect_train.py::test_retinanet_learns_synthetic_square",
    "tests/test_finetune_cli.py::test_finetune_new_head_and_grid",
    "tests/test_graft_entry.py::test_dryrun_multichip_4",
    "tests/test_mesh_stateful.py::test_deit_mrlal_ema_distill_dp_matches_single_device",
    "tests/test_mesh_stateful.py::test_mrlab_scan_dp_matches_single_device",
    "tests/test_mesh_stateful.py::test_mrlab_unrolled_dp_matches_single_device",
    "tests/test_multihost.py::test_four_process_training",
    "tests/test_multihost.py::test_two_process_training",
    "tests/test_pipeline.py::test_pp_grads_match_single_device",
    "tests/test_resnet_parity.py::test_resnet101_mrlab_full_parity_scan_roundtrip",
    "tests/test_runbook_real_weights.py::test_runbook_detection_torch_to_map",
    "tests/test_server.py::test_http_detections_with_masks",
    "tests/test_serving.py::test_microbatch_chains_bitwise_equal",
    "tests/test_serving.py::test_mrlab_microbatch_chains_bitwise_equal",
    "tests/test_serving_cli.py::test_cli_mrlab_engine",
    "tests/test_serving_cli.py::test_cli_precast_engine",
    "tests/test_serving_cli.py::test_cli_quant_int8",
    "tests/test_serving_cli.py::test_cli_resume_from_orbax_run",
    "tests/test_serving_deit.py::test_deit_engine_matches_flax[deit_mrlab_tiny_patch16_224]",
    "tests/test_serving_deit.py::test_deit_engine_matches_flax[deit_mrlal_tiny_patch16_224]",
    "tests/test_serving_deit.py::test_deit_microbatch_chains_bitwise_equal",
    "tests/test_serving_deit.py::test_precast_engine_efficientnet",
    "tests/test_serving_quant.py::test_quant_close_to_fp32_engine[True-True]",
    "tests/test_serving_quant.py::test_quant_engine_matches_fake_quant_reference",
    "tests/test_serving_quant.py::test_quant_microbatch_chains_bitwise_equal[True-True]",
    "tests/test_serving_sharded.py::test_sharded_detection_serving_matches_single_device",
    "tests/test_train_multidevice.py::test_tp_sharding_rules",
    "tests/test_trainer_resume.py::test_resume_continues_at_next_epoch",
    "tests/test_two_stage.py::test_faster_rcnn_end_to_end",
    "tests/test_two_stage.py::test_remat_forward_identical",
    "tests/test_two_stage_train.py::test_faster_rcnn_train_loss_and_grads",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.nodeid in _AUTO_SLOW:
            item.add_marker(pytest.mark.slow)
