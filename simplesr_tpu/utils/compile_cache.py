"""Persistent XLA compilation cache.

Large train-step compiles (16-block SRResNet fwd+bwd, GAN fused steps) cost
minutes on TPU; nothing in the reference mitigates this (TF2 retraces every
process, reference `simple_sr/operations/training.py`). JAX can persist
compiled executables to disk keyed by computation + platform, so every
process after the first loads in milliseconds — across training runs,
campaign stages, serving restarts and sweeps.

Opt-in two ways:
  - `simplesr_tpu.utils.enable_compile_cache("/path")` before the first jit
    execution;
  - `SIMPLESR_COMPILE_CACHE=/path` in the environment — the CLI entry points
    (`examples.run_example`, `tools/serve`, `tools/upscale`) honour it at
    startup via `enable_compile_cache_from_env()`.
"""

import logging
import os

import jax

_ENV_VAR = "SIMPLESR_COMPILE_CACHE"
_log = logging.getLogger("simplesr_tpu")


def enable_compile_cache(cache_dir, min_compile_time_secs=1.0):
    """Persist XLA executables under ``cache_dir``.

    Only computations that took >= ``min_compile_time_secs`` to compile are
    written (tiny jits are cheaper to recompile than to deserialize). Safe
    to call repeatedly; must run before the computations it should capture
    are first executed — already-live executables are not retroactively
    cached.
    """
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # cache regardless of entry size; the time threshold is the real gate
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # jax memoizes its cache object on first use (_cache_initialized in
    # jax._src.compilation_cache), so once any computation ran with a
    # previous cache setting — including cache-off — the config updates
    # above would silently never take effect in this process. Drop the
    # memo so the new directory is live from the next compile.
    try:
        from jax._src import compilation_cache as _jax_cc
        _jax_cc.reset_cache()
    except Exception as exc:  # private API moved — cache may be stale
        _log.warning("could not reset jax compilation cache memo: %s", exc)
    _log.info("persistent compilation cache at %s", cache_dir)
    return cache_dir


def enable_compile_cache_from_env():
    """Enable the cache iff ``SIMPLESR_COMPILE_CACHE`` is set (its value is
    the cache directory). Returns the directory or None."""
    path = os.environ.get(_ENV_VAR, "").strip()
    if not path:
        return None
    return enable_compile_cache(path)
