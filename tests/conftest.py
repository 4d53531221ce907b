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
