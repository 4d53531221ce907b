#!/usr/bin/env python
"""Measure the persistent-compile-cache warm-restart win (VERDICT r4
weak #5 / round-5 item 4).

Runs the SAME serving-engine warmup (resnet50_mrlal mb32 bs128 — the
daemon's default program, a multi-minute compile) in two fresh
subprocesses sharing one empty cache dir: the first pays the cold
compile, the second should warm in seconds.  Prints both
time-to-first-batch numbers; ROADMAP records them.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
t_start = time.perf_counter()
import jax, jax.numpy as jnp
from mrla_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(os.environ["CACHE_DIR"])
from mrla_tpu.models import create_model
from mrla_tpu.serving.resnet_mrlal import (
    prepare_inference_params, resnet_mrlal_forward)
model = create_model("resnet50_mrlal")
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 224, 224, 3)), train=False)
sp = prepare_inference_params(variables)
x = jnp.zeros((128, 224, 224, 3), jnp.bfloat16)
# NONCE makes the program's HLO novel so the FIRST run is cold at every
# cache layer (this machine's terminal-side remote-compile service has
# its own cache, which confounds a naive cold/warm pair)
nonce = jnp.bfloat16(float(os.environ["NONCE"]))
fwd = jax.jit(lambda x: resnet_mrlal_forward(sp, x * nonce))
t0 = time.perf_counter()
fwd(x).block_until_ready()
print(f"CHILD_RESULT import+init {t0 - t_start:.1f}s "
      f"first-batch {time.perf_counter() - t0:.1f}s", flush=True)
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as cache:
        # one nonce per script run: first child cold at EVERY layer,
        # second child identical HLO -> client persistent-cache hit
        # bf16-representable distinct values (x is zeros; scale harmless)
        nonce = 1.0 + (int(time.time()) % 100) * 0.0078125
        env = dict(os.environ, CACHE_DIR=cache, NONCE=repr(nonce))
        for tag in ("cold", "warm"):
            t0 = time.perf_counter()
            out = subprocess.run(
                [sys.executable, "-c", CHILD % {"repo": repo}],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("CHILD_RESULT")]
            assert line, out.stdout[-2000:] + out.stderr[-2000:]
            print(f"{tag}: {line[-1].split(' ', 1)[1]} "
                  f"(process wall {time.perf_counter() - t0:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
