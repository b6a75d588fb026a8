"""Experimental VMEM-resident trunk kernel: semantics check in interpreter
mode (within bf16 rounding of the flax path). See the module docstring and
docs/performance.md for why this is not wired into the default path."""

import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.models import SRResNet
from simplesr_tpu.models.srresnet import ResBlock
from simplesr_tpu.ops.pallas.trunk_kernel import srresnet_trunk_pallas


def test_matches_flax_trunk_within_bf16():
    model = SRResNet(upsample_factor=2, num_res_blocks=2, num_filters=64,
                     batch_norm=False, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]

    def trunk_ref(t):
        for blk in range(2):
            p = {"params": params[f"ResBlock_{blk}"]}
            t = ResBlock(64, batch_norm=False, dtype=jnp.float32).apply(p, t, False)
        return t

    t_in = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (2, 16, 16, 64)), jnp.float32)
    ref = np.asarray(trunk_ref(t_in))
    got = np.asarray(srresnet_trunk_pallas(t_in, params, num_blocks=2,
                                           band=8, interpret=True))
    rel = np.abs(ref - got).max() / np.abs(ref).max()
    assert rel < 0.01  # bf16 inter-layer storage vs f32 reference
