"""Persistent XLA compilation cache setup.

The train-step variants compile in ~150-200 s each on TPU (4 stages x SH
degrees x multi-step chunks); without a persistent cache every process
relaunch pays that again. JAX ships a content-addressed on-disk cache —
this module enables it with thresholds tuned so only the expensive
programs (the train/render steps) are persisted, not trivial ops.

Called by every CLI entry point (train.py, eval.py, bench.py,
train_gcn.py) and safe to call more than once. Override the location with
GPT_COMPILE_CACHE (set to "0" to disable).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/gaussianprediction_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    env = os.environ.get("GPT_COMPILE_CACHE")
    if env == "0":
        return None
    cache_dir = cache_dir or env or _DEFAULT_DIR
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # persist anything that took >=2 s to compile (the steps take minutes;
    # skipping sub-second programs keeps the cache small)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
