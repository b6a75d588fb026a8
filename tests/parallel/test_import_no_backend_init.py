"""Importing the library must NOT initialize the XLA backend.

Multi-host users must be able to `import simplesr_tpu` and then call
`initialize_multihost(...)` — jax.distributed.initialize() is rejected once
any backend exists, so an import-time jnp constant anywhere in the package
would make multi-host init impossible (this bit tests/parallel/
test_multihost_two_process.py's workers before ops/metrics.py was fixed)."""

import subprocess
import sys

CHECK = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
from jax._src import xla_bridge
import simplesr_tpu
import simplesr_tpu.ops
import simplesr_tpu.models
import simplesr_tpu.data
import simplesr_tpu.parallel
import simplesr_tpu.train
import simplesr_tpu.losses
import simplesr_tpu.config
import simplesr_tpu.eval
assert not xla_bridge._backends, (
    "importing simplesr_tpu initialized the XLA backend: %s"
    % list(xla_bridge._backends))
print("IMPORT_CLEAN")
"""


def test_import_does_not_initialize_backend():
    r = subprocess.run([sys.executable, "-c", CHECK], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0 and "IMPORT_CLEAN" in r.stdout, (
        r.stdout + r.stderr)
