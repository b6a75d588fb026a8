"""Persistent compilation cache knob (utils/compile_cache.py).

The cache must be configured through jax's public config surface and honour
the SIMPLESR_COMPILE_CACHE env contract used by the CLI entry points."""

import os

import jax

from simplesr_tpu.utils import (enable_compile_cache,
                                enable_compile_cache_from_env)


def test_enable_sets_jax_config_and_creates_dir(tmp_path, monkeypatch):
    target = tmp_path / "cache" / "nested"
    got = enable_compile_cache(str(target), min_compile_time_secs=0.25)
    try:
        assert got == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.25
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_env_contract(tmp_path, monkeypatch):
    monkeypatch.delenv("SIMPLESR_COMPILE_CACHE", raising=False)
    assert enable_compile_cache_from_env() is None

    target = tmp_path / "envcache"
    monkeypatch.setenv("SIMPLESR_COMPILE_CACHE", str(target))
    try:
        assert enable_compile_cache_from_env() == str(target)
        assert target.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_cache_dir_switch_takes_effect(tmp_path):
    """jax memoizes its cache object on first use; enable_compile_cache must
    drop that memo or a second enable (new dir) silently never writes — the
    exact order-dependence that made the populate test below flaky when any
    earlier test in the process had already exercised the cache."""
    import random

    import jax.numpy as jnp

    first, second = tmp_path / "first", tmp_path / "second"
    try:
        enable_compile_cache(str(first), min_compile_time_secs=0.0)
        salt = float(random.randint(1, 10**6))
        jax.jit(lambda x: jnp.sin(x) * salt)(
            jnp.ones((random.randint(11, 61), 5))).block_until_ready()

        enable_compile_cache(str(second), min_compile_time_secs=0.0)
        salt2 = float(random.randint(1, 10**6))
        n = random.randint(11, 61)
        jax.jit(lambda x: jnp.cosh(x + salt2) @ x.T)(
            jnp.ones((n, n + 3))).block_until_ready()
        assert any(os.scandir(str(second))), \
            "cache-dir switch ignored (stale jax cache memo)"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_cache_populates_on_slow_compile(tmp_path):
    """An actually-compiled computation above the time threshold lands on
    disk (threshold 0 so even a trivial jit qualifies).

    The computation must be UNIQUE within this process: if an identical
    jaxpr was compiled by any earlier test, jax's in-memory executable
    cache serves it and no disk entry is ever written (this made the test
    order-dependent in full-suite runs). A random shape and a random
    constant folded into the graph guarantee a fresh compile.
    """
    import random

    target = tmp_path / "popcache"
    enable_compile_cache(str(target), min_compile_time_secs=0.0)
    try:
        import jax.numpy as jnp

        n = random.randint(11, 61)
        salt = float(random.randint(1, 10**6))

        @jax.jit
        def f(x):
            return jnp.tanh(x + salt) @ x.T

        f(jnp.ones((n, n + 6))).block_until_ready()
        assert any(os.scandir(str(target))), "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
