"""Persistent XLA compilation cache for the CLI entry points.

The fused serving programs are expensive to compile cold — the microbatched
resnet engine takes minutes and the two-stage detector (Pallas RoIAlign +
NMS + decode at 800x1344) ~12 min (ROADMAP round-4 ledger).  XLA can
serialize compiled executables to disk; enabling that turns every repeat
launch (daemon restart, repeated --eval-only run, driver bench) into a
seconds-long warmup.  bench.py has carried this pattern since round 2
(bench.py:48-56); VERDICT round-4 weak #5 asked for it in the daemons too.

Environment override: ``MRLA_TPU_JAX_CACHE`` sets the directory.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point jax at a persistent on-disk executable cache and return the
    directory used.  Safe to call more than once; call before the first
    jit compilation for full effect."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "MRLA_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "mrla_tpu_jax"),
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # only persist programs whose compile is actually expensive
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    return cache_dir
