"""Real 2-process jax.distributed certification (VERDICT r4 #7).

Spawns two worker processes (tests/parallel/_multihost_worker.py), each
with 2 virtual CPU devices, that form one 4-device {"data": 4} mesh via
``initialize_multihost`` over a localhost coordinator. Certifies what the
single-process no-op tests (test_multihost_helpers.py) cannot:

  * coordinator init actually runs (process_count() == 2 in each worker)
  * DataPipeline(shard_by_process=True) gives each process a disjoint
    file shard whose union is the full corpus
  * data-parallel training with the gradient all-reduce spanning the
    process boundary is numerically equal to single-process training
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_worker.py")
NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multihost")
    port = _free_port()
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    outs = [str(tmp / f"worker{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"
    return [json.load(open(o)) for o in outs]


def test_coordinator_init_two_processes(worker_results):
    for r in worker_results:
        assert r["process_count"] == 2
        assert r["n_global_devices"] == 4
    assert {r["process_index"] for r in worker_results} == {0, 1}


def test_file_shards_disjoint_and_complete(worker_results):
    from simplesr_tpu.data import DataPipeline

    shards = [set(r["files"]) for r in worker_results]
    assert shards[0] & shards[1] == set()
    # the two process shards must tile the UNSHARDED train list exactly
    # (train_val_split moves some files to validation before sharding)
    unsharded = DataPipeline(
        hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25, batch_size=4,
        crop_size=(16, 16, 3), num_crops=1, random_seed=0,
        shard_by_process=False)
    want = {os.path.basename(f) for f in unsharded.train_imgs}
    assert len(want) == 6
    assert shards[0] | shards[1] == want


def test_dp_training_equals_single_process(worker_results):
    """Re-run the worker's exact training single-process and compare."""
    import optax
    from simplesr_tpu.models.srresnet import SRResNet

    rng = np.random.default_rng(0)
    LR = rng.uniform(0, 1, (8, 8, 8, 3)).astype(np.float32)
    HR = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    mod = SRResNet(upsample_factor=2, num_filters=8, num_res_blocks=1,
                   batch_norm=False, dtype=jnp.float32)
    params = mod.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)),
                      train=True)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss(p, x, y):
        return jnp.mean((mod.apply({"params": p}, x, train=True) - y) ** 2)

    @jax.jit
    def step(p, s, x, y):
        g = jax.grad(loss)(p, x, y)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(3):
        params, opt_state = step(params, opt_state, jnp.asarray(LR),
                                 jnp.asarray(HR))
    want = {
        "/".join(str(k.key) for k in path): np.asarray(leaf).ravel()
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    for r in worker_results:
        got = {k: np.asarray(v, np.float32) for k, v in r["params"].items()}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(
                got[k], want[k], atol=1e-6, rtol=1e-5,
                err_msg=f"process {r['process_index']} param {k}")
