"""Polyphase inference variant of SRResNet — the TPU-fast tail.

The trained SRResNet tail (subpixel conv blocks + 9x9 output conv, parity
with reference model_builder.py:132-134,275-282) spends ~75 % of the x4
forward pass on TPU: convs at 2x/4x resolution with 64/3 channels waste MXU
lanes and every depth_to_space is an expensive sublane relayout
(scripts/bench_upsample_tail.py: tail 38.8 ms -> 12.5 ms rewritten, of a
~52 ms batch-16 forward).

`SRResNetPolyphase` is a *mathematically identical* reparameterization for
inference: the head + trunk are byte-for-byte the same modules (shared code
with SRResNet, identical parameter tree), while every tail conv runs at LR
resolution on the DCR phase tensor, with ONE depth_to_space at the very
end. `polyphase_variables` converts trained SRResNet weights in weight
space (ops/polyphase.py) — no retraining, no approximation beyond bf16
summation order.

Usage:
    poly = SRResNetPolyphase(**{f: getattr(model, f) for f in (
        "upsample_factor", "num_filters", "num_res_blocks", "momentum",
        "batch_norm", "dtype", "bn_axis_name")})
    pvars = polyphase_variables(model, variables)
    sr = poly.apply(pvars, lr, train=False)   # == model.apply(variables, lr)

or the one-call `polyphase_model(model, variables)`.
"""

import numpy as np
import jax.numpy as jnp
import flax
import flax.linen as nn

from simplesr_tpu.models.srresnet import SRResNet
from simplesr_tpu.models.blocks import PReLU
from simplesr_tpu.ops.polyphase import (coarsen_conv_kernel,
                                        phase_merge_permutation, tile_phase)
from simplesr_tpu.ops.shuffle import depth_to_space

__all__ = ["SRResNetPolyphase", "polyphase_variables", "polyphase_model",
           "fast_inference"]


class SRResNetPolyphase(SRResNet):
    """SRResNet with the subpixel tail rewritten in phase space.

    Inference only (the reparameterized tail is not the training
    parameterization). Construct with the same hyperparameters as the
    trained SRResNet and load weights via `polyphase_variables`.
    """

    def _tail(self, x, train: bool):
        c = self.num_filters
        s = 1
        while s < self.upsample_factor:
            # fine: conv3x3 C -> 4C at s*LR, d2s(2), PReLU.  coarse: one
            # conv at LR producing the direct (2s)-phase tensor.
            x = nn.Conv(4 * s * s * c, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"PolyUp_{s}")(x)
            x = PReLU(name=f"PolyPReLU_{s}")(x)
            s *= 2

        x = nn.Conv(3 * s * s, (3, 3) if s > 2 else (5, 5), padding="SAME",
                    dtype=jnp.float32, name="PolyOut")(
            jnp.asarray(x, jnp.float32))
        return jnp.tanh(depth_to_space(x, s))


def polyphase_variables(model: SRResNet, variables):
    """Transform trained SRResNet variables into SRResNetPolyphase
    variables (weight-space, host-side, exact)."""
    variables = flax.core.unfreeze(variables)
    params = variables["params"]
    c = model.num_filters
    scale = model.upsample_factor

    new_params = {k: v for k, v in params.items()
                  if not k.startswith("SubpixelConvBlock_") and k != "Conv_0"}

    s, idx = 1, 0
    while s < scale:
        block = params[f"SubpixelConvBlock_{idx}"]
        kern = np.asarray(block["Conv_0"]["kernel"])      # (3,3,C,4C)
        bias = np.asarray(block["Conv_0"]["bias"])        # (4C,)
        alpha = np.asarray(block["PReLU_0"]["alpha"])     # (C,)

        kc, bc = coarsen_conv_kernel(kern, s, bias)
        perm = phase_merge_permutation(s, 2, c)
        new_params[f"PolyUp_{s}"] = {"kernel": jnp.asarray(kc[..., perm]),
                                     "bias": jnp.asarray(bc[perm])}
        new_params[f"PolyPReLU_{s}"] = {
            "alpha": jnp.asarray(tile_phase(alpha, 2 * s))}
        s, idx = s * 2, idx + 1

    out = params["Conv_0"]
    kc, bc = coarsen_conv_kernel(np.asarray(out["kernel"]), scale,
                                 np.asarray(out["bias"]))
    new_params["PolyOut"] = {"kernel": jnp.asarray(kc),
                             "bias": jnp.asarray(bc)}

    return {**variables, "params": new_params}


def fast_inference(module, variables):
    """Best-effort inference reparameterization: polyphase tail for
    SRResNet (measured 2x end-to-end on TPU, bench.py), identity for
    architectures without a rewrite. Safe default for serving paths."""
    if type(module) is SRResNet:
        return polyphase_model(module, variables)
    return module, variables


def polyphase_model(model: SRResNet, variables):
    """One call: (SRResNetPolyphase, converted variables) for a trained
    SRResNet. Raises TypeError for other generators (RRDB has its own
    upsample structure; see models/rrdb.py)."""
    if type(model) is not SRResNet:
        raise TypeError(f"polyphase tail supports SRResNet, got {type(model)}")
    fields = ("upsample_factor", "num_filters", "num_res_blocks", "momentum",
              "batch_norm", "dtype", "bn_axis_name")
    poly = SRResNetPolyphase(**{f: getattr(model, f) for f in fields})
    return poly, polyphase_variables(model, variables)
