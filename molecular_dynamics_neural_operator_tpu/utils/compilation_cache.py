"""Persistent XLA compilation cache (opt-in via ``--compilation_cache``).

No reference counterpart (torch has no AOT compile step to cache). On
TPU the first jit of the flagship training step or a long rollout costs
minutes of XLA compile time; JAX's persistent cache keys the serialized
computation + compile options + platform and replays the compiled
executable on later runs of the SAME program — across processes, so
repeated CLI invocations (sweeps, resumes, eval re-runs) skip straight
to execution.

Call before the first jit dispatch. Harmless when the backend cannot
use it (the cache simply stays empty); honest about that in the log.
"""

from __future__ import annotations

from pathlib import Path


def enable_compilation_cache(path) -> None:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing) and drop the min-compile-time/min-size thresholds so every
    entry is cached — the right trade when compiles cross a slow tunnel."""
    import jax

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
