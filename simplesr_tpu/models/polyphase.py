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

from typing import Any

import numpy as np
import jax.numpy as jnp
import flax
import flax.linen as nn

from simplesr_tpu.models.srresnet import SRResNet
from simplesr_tpu.models.rrdb import RRDBNet
from simplesr_tpu.models.blocks import PReLU
from simplesr_tpu.ops.polyphase import (coarsen_conv_kernel,
                                        phase_merge_permutation,
                                        phase_split_permutation, tile_phase)
from simplesr_tpu.ops.shuffle import depth_to_space

__all__ = ["SRResNetPolyphase", "polyphase_variables", "polyphase_model",
           "RRDBNetPolyphase", "rrdb_polyphase_variables",
           "rrdb_polyphase_model", "fast_inference"]


class SRResNetPolyphase(SRResNet):
    """SRResNet with the subpixel tail rewritten in phase space.

    Inference only (the reparameterized tail is not the training
    parameterization). Construct with the same hyperparameters as the
    trained SRResNet and load weights via `polyphase_variables`.

    `out_dtype` controls the coarse output conv's compute dtype. float32
    (default) matches the training-form module's final conv exactly;
    bfloat16 computes it like the rest of the tail (MXU accumulates f32
    internally) — outputs stay visually identical but no longer agree with
    the training form to float precision.
    """

    out_dtype: Any = jnp.float32

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
                    dtype=self.out_dtype, name="PolyOut")(
            jnp.asarray(x, self.out_dtype))
        return jnp.tanh(depth_to_space(x, s).astype(jnp.float32))


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


class RRDBNetPolyphase(RRDBNet):
    """RRDB/ESRGAN with the upsample tail rewritten in phase space.

    Unlike SRResNet, RRDB's tail has a 3x3 64->64 HR conv whose full-coarse
    embedding inflates FLOPs scale^2-fold, so the profitable depth of the
    rewrite is hardware-dependent. **Measured verdict (v5e, batch 16x128^2,
    scripts/bench_rrdb_tail.py + bench.py --rrdb): the production lowering
    WINS for RRDB** — tail 17.4 ms vs 20.6 ("up") / 23.5 ("2phase") /
    38.4 ms ("full"); end-to-end 22.05 vs 21.69 MPix/s — because the 3x3
    output conv fuses well (unlike SRResNet's 9x9) and RRDB is trunk-bound.
    `fast_inference` therefore leaves RRDB in production form; these modes
    stay available (exact, tested) for hardware where the economics flip.
    `mode`:

    - "up":     subpixel stages coarse at LR, ONE d2s(scale), HR/out convs
                unchanged at HR resolution.
    - "2phase": additionally run HR/out convs at (scale/2)x resolution in
                2-phase form (4x FLOPs, full-lane shapes).
    - "full":   everything at LR (scale^2-fold HR-conv FLOPs).

    All modes are exact reparameterizations of the trained weights.
    """

    mode: str = "up"

    def _tail(self, x):
        c, scale = self.num_filters, self.upsample_factor
        s = 1
        while s < scale:
            x = nn.Conv(4 * s * s * c, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"PolyUp_{s}")(x)
            x = nn.leaky_relu(x, 0.2)
            s *= 2

        mode = "full" if (self.mode == "2phase" and scale == 2) else self.mode
        if mode == "full":
            hr_c, out_c, final = scale * scale * c, scale * scale * 3, scale
        elif mode == "2phase":
            # split phases: outer (scale/2) level materialized now, inner
            # 2-phase level stays in channel space for the HR/out convs
            x = x[..., phase_split_permutation(scale // 2, 2, c)]
            x = depth_to_space(x, scale // 2)
            hr_c, out_c, final = 4 * c, 4 * 3, 2
        elif mode == "up":
            x = depth_to_space(x, scale)
            hr_c, out_c, final = c, 3, 1
        else:
            raise ValueError(f"unknown polyphase mode {self.mode!r}")

        x = nn.Conv(hr_c, (3, 3), padding="SAME", dtype=self.dtype,
                    name="PolyHr")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(out_c, (3, 3), padding="SAME", dtype=jnp.float32,
                    name="PolyOut")(jnp.asarray(x, jnp.float32))
        return jnp.tanh(depth_to_space(x, final) if final > 1 else x)


def rrdb_polyphase_variables(model: RRDBNet, variables, mode="up"):
    """Transform trained RRDBNet variables into RRDBNetPolyphase variables
    (weight-space, host-side, exact)."""
    variables = flax.core.unfreeze(variables)
    params = variables["params"]
    c = model.num_filters
    scale = model.upsample_factor

    new_params = {k: v for k, v in params.items()
                  if not k.startswith("SubpixelConvBlock_")
                  and k not in ("Conv_2", "Conv_3")}

    s, idx = 1, 0
    while s < scale:
        block = params[f"SubpixelConvBlock_{idx}"]["Conv_0"]
        kc, bc = coarsen_conv_kernel(np.asarray(block["kernel"]), s,
                                     np.asarray(block["bias"]))
        perm = phase_merge_permutation(s, 2, c)
        new_params[f"PolyUp_{s}"] = {"kernel": jnp.asarray(kc[..., perm]),
                                     "bias": jnp.asarray(bc[perm])}
        s, idx = s * 2, idx + 1

    eff = "full" if (mode == "2phase" and scale == 2) else mode
    coarse_at = {"up": 1, "2phase": 2, "full": scale}[eff]
    for src, dst in (("Conv_2", "PolyHr"), ("Conv_3", "PolyOut")):
        kern = np.asarray(params[src]["kernel"])
        bias = np.asarray(params[src]["bias"])
        if coarse_at == 1:
            new_params[dst] = {"kernel": jnp.asarray(kern),
                               "bias": jnp.asarray(bias)}
        else:
            kc, bc = coarsen_conv_kernel(kern, coarse_at, bias)
            new_params[dst] = {"kernel": jnp.asarray(kc),
                               "bias": jnp.asarray(bc)}

    return {**variables, "params": new_params}


def rrdb_polyphase_model(model: RRDBNet, variables, mode="up"):
    """(RRDBNetPolyphase, converted variables) for a trained RRDBNet."""
    if type(model) is not RRDBNet:
        raise TypeError(f"rrdb polyphase supports RRDBNet, got {type(model)}")
    if model.kernel_size != 3:
        raise ValueError("rrdb polyphase tail assumes 3x3 HR/out convs "
                         f"(got kernel_size={model.kernel_size})")
    fields = ("upsample_factor", "num_filters", "num_rrdb_blocks",
              "num_dense_blocks", "num_convs", "kernel_size",
              "residual_scaling", "dtype", "growth_channels")
    poly = RRDBNetPolyphase(mode=mode,
                            **{f: getattr(model, f) for f in fields})
    return poly, rrdb_polyphase_variables(model, variables, mode)


def fast_inference(module, variables, paired_ways=0, polyphase=True):
    """Best-effort inference reparameterization: polyphase tail for
    SRResNet (measured 2x end-to-end on TPU, bench.py), identity for
    architectures without a rewrite. Safe default for serving paths.

    `paired_ways` additionally applies the batch→channel paired-trunk
    rewrite (models/paired.py) where one exists — SRResNet (composed with
    the polyphase tail unless `polyphase=False`, i.e. --no-fast) and RRDB
    (production tail either way — its measured winner). The paired module
    requires the batch to be divisible by `ways`; serving callers pad
    (evaluation._as_predictor)."""
    if type(module) is SRResNet:
        if paired_ways:
            from simplesr_tpu.models.paired import paired_model
            return paired_model(module, variables, ways=paired_ways,
                                polyphase=polyphase)
        return polyphase_model(module, variables)
    if type(module) is RRDBNet and paired_ways:
        from simplesr_tpu.models.paired import rrdb_paired_model
        return rrdb_paired_model(module, variables, ways=paired_ways)
    return module, variables


def polyphase_model(model: SRResNet, variables, out_dtype=jnp.float32):
    """One call: (SRResNetPolyphase, converted variables) for a trained
    SRResNet. Raises TypeError for other generators (RRDB has its own
    upsample structure; see models/rrdb.py)."""
    if type(model) is not SRResNet:
        raise TypeError(f"polyphase tail supports SRResNet, got {type(model)}")
    fields = ("upsample_factor", "num_filters", "num_res_blocks", "momentum",
              "batch_norm", "dtype", "bn_axis_name")
    poly = SRResNetPolyphase(out_dtype=out_dtype,
                             **{f: getattr(model, f) for f in fields})
    return poly, polyphase_variables(model, variables)
