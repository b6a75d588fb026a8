"""Core primitives: range contracts, dtype policy, PRNG discipline."""

import numpy as np
import pytest
import jax.numpy as jnp

from simplesr_tpu.core import (
    normalize_01, normalize_11, denormalize_11, to_01_from_11,
    Policy, default_policy,
)
from simplesr_tpu.core.prng import KeySequence
from simplesr_tpu.core.ranges import to_uint8


def test_range_contracts(rng):
    x = rng.uniform(0, 255, size=(4, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(normalize_01(x)), x / 255.0)
    np.testing.assert_allclose(np.asarray(normalize_11(x)), x / 127.5 - 1)
    np.testing.assert_allclose(
        np.asarray(denormalize_11(normalize_11(x))), x, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(to_01_from_11(normalize_11(x))), x / 255.0, atol=1e-6)


def test_to_uint8():
    img = jnp.asarray([[-1.0, 0.0, 1.0]])[..., None]
    out = np.asarray(to_uint8(img, from_range="11")).ravel()
    np.testing.assert_array_equal(out, [0, 128, 255])


def test_policy():
    p = default_policy()
    assert p.compute_dtype == jnp.bfloat16 and p.param_dtype == jnp.float32
    assert default_policy(mixed=False).compute_dtype == jnp.float32
    x = jnp.ones((2,), jnp.float32)
    assert p.cast_to_compute(x).dtype == jnp.bfloat16
    assert p.cast_to_output(p.cast_to_compute(x)).dtype == jnp.float32


def test_key_sequence_deterministic():
    import jax

    a = KeySequence(7)
    b = KeySequence(7)
    ka = [np.asarray(jax.random.key_data(a.next())) for _ in range(3)]
    kb = [np.asarray(jax.random.key_data(b.next())) for _ in range(3)]
    for x, y in zip(ka, kb):
        np.testing.assert_array_equal(x, y)
    # no repeats within a stream
    assert not np.array_equal(ka[0], ka[1])
    ks = b.next_n(4)
    assert len(ks) == 4
