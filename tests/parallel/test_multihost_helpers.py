"""Multi-host helper logic (single-process checks of the sharding math)."""

import jax

from simplesr_tpu.parallel import local_batch_slice, initialize_multihost
from simplesr_tpu.data import DataPipeline

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


def test_local_batch_slice_single_host():
    s = local_batch_slice(32)
    assert s == slice(0, 32)


def test_initialize_multihost_noop():
    initialize_multihost()  # no coordinator → no-op, must not raise
    assert jax.process_count() == 1


def test_shard_by_process_single_host_keeps_all_files():
    p = DataPipeline(hr_img_path=NOISE_DIR, scale=2, train_val_split=0.25,
                     batch_size=4, crop_size=(16, 16, 3), num_crops=1,
                     random_seed=0, shard_by_process=True)
    assert len(p.train_imgs) == 6  # process_count()==1 → unsharded


def test_global_batch_single_process():
    """Single-process path: device_put with the requested sharding."""
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from simplesr_tpu.parallel import make_mesh, global_batch

    mesh = make_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    g = global_batch(mesh, x)  # default: sharded on the data axis
    assert g.shape == x.shape
    np.testing.assert_array_equal(np.asarray(g), x)
    r = global_batch(mesh, x, P())  # replicated
    np.testing.assert_array_equal(np.asarray(r), x)
    assert r.sharding.is_fully_replicated
