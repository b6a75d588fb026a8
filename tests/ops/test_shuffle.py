import numpy as np

from simplesr_tpu.ops import depth_to_space, space_to_depth


def _tf():
    import tensorflow as tf
    return tf


def test_depth_to_space_matches_tf(rng):
    x = rng.uniform(size=(2, 4, 6, 12)).astype(np.float32)
    tf = _tf()
    ours = np.asarray(depth_to_space(x, 2))
    theirs = tf.nn.depth_to_space(x, 2).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_roundtrip(rng):
    x = rng.uniform(size=(1, 8, 8, 16)).astype(np.float32)
    y = space_to_depth(depth_to_space(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(y), x)
