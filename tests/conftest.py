"""Test configuration: force CPU backend with an 8-device virtual mesh so
sharding/collective code paths run without TPU hardware (SURVEY.md §7)."""

import os

# Must be set before jax initializes its backends. Force CPU even if the
# shell exported JAX_PLATFORMS=axon (the TPU tunnel): unit tests are the
# 8-virtual-device CPU surface; TPU runs happen via bench.py / verify flows.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Keep TF (used only as a parity oracle in tests) quiet and off any accelerator.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# oneDNN's Winograd/blocked conv kernels give ~1e-3-level numeric drift vs
# XLA's direct convolutions; disable for bit-comparable parity oracles.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import jax  # noqa: E402

# A pytest plugin may import jax before this conftest runs, after which the
# env var is ignored — force the platform through the config API too (safe
# as long as no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
