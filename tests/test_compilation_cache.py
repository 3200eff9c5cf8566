"""Persistent compilation cache knob (utils/compilation_cache.py).

Runs in a subprocess: the cache dir is process-global jax config, and
flipping it inside the shared test process would redirect every later
test's compiles into a deleted tmpdir.
"""

import subprocess
import sys


def test_enable_compilation_cache_writes_entries(tmp_path):
    cache = tmp_path / "cache"
    code = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from molecular_dynamics_neural_operator_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)
enable_compilation_cache({str(cache)!r})
import jax.numpy as jnp
out = jax.jit(lambda x: jnp.tanh(x) @ x)(jnp.ones((64, 64)))
out.block_until_ready()
import pathlib
entries = list(pathlib.Path({str(cache)!r}).iterdir())
assert entries, "no cache entries written"
print("CACHE_OK", len(entries))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "CACHE_OK" in proc.stdout
