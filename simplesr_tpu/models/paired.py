"""Batch→channel paired inference variants of SRResNet.

`SRResNetPaired` packs `ways` consecutive batch items into the channel
dimension for the head + residual trunk, running every trunk conv at
`ways · num_filters` channels with block-diagonally expanded kernels
(ops/pairing.py), then unpacks back to the real batch for the tail. The
rewrite is mathematically exact (convolution is linear; block-diagonal
kernels keep streams independent; per-channel params tile), trading
structural-zero MACs for MXU lane fill — the measured C=64→C=128 trunk
rates (docs/performance.md: 53→155 TFLOP/s) price the w=2 trade at ~1.46×
useful trunk throughput at equal total batch.

`SRResNetPairedPolyphase` composes this with the polyphase tail rewrite
(models/polyphase.py) — paired trunk at LR, lane-filled phase-space tail —
the full serving lowering.

Inference only (BatchNorm would mix streams under training; the packed
layout is not the training parameterization). Batch must be divisible by
`ways`; serving paths that batch in power-of-two buckets satisfy this for
free.

No reference counterpart — this is TPU MXU geometry, meaningless for the
reference's cuDNN target (see ops/pairing.py).
"""

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from simplesr_tpu.models.srresnet import SRResNet
from simplesr_tpu.models.rrdb import RRDBNet
from simplesr_tpu.models.polyphase import SRResNetPolyphase, polyphase_model
from simplesr_tpu.ops.pairing import (blockdiag_kernel_segmented, pack_batch,
                                      unpack_batch, pair_param_tree)

__all__ = ["SRResNetPaired", "SRResNetPairedPolyphase", "paired_variables",
           "paired_model", "RRDBNetPaired", "rrdb_paired_variables",
           "rrdb_paired_model"]

_TRUNK_PREFIXES = ("ConvLayer_", "PReLU_", "ResBlock_")


class SRResNetPaired(SRResNet):
    """SRResNet with `ways` batch items packed into trunk channels.

    Construct with the same hyperparameters as the trained model and load
    weights via `paired_variables` (or use the one-call `paired_model`)."""

    ways: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train:
            raise ValueError("paired variants are inference-only "
                             "(BatchNorm would mix packed streams)")
        x = pack_batch(x, self.ways)
        x = self._features(x, train)
        x = unpack_batch(x, self.ways)
        return self._tail(x, train)

    def _trunk_width(self) -> int:
        return self.ways * self.num_filters


class SRResNetPairedPolyphase(SRResNetPaired, SRResNetPolyphase):
    """Paired trunk + polyphase tail: both lane-filling rewrites at once.

    MRO: `__call__`/`_trunk_width` from SRResNetPaired, `_tail` from
    SRResNetPolyphase — the trunk runs packed at LR, the tail runs the
    phase-space lowering on the unpacked batch."""


def paired_variables(variables, ways: int = 2):
    """Expand trained SRResNet (or SRResNetPolyphase) variables for the
    paired trunk: trunk kernels block-diagonal, per-channel trunk vectors
    tiled; tail parameters pass through unchanged (weight-space,
    host-side, exact)."""
    import flax

    variables = flax.core.unfreeze(variables)
    out = dict(variables)
    out["params"] = {
        k: (pair_param_tree(v, ways)
            if k.startswith(_TRUNK_PREFIXES) else v)
        for k, v in variables["params"].items()}
    if variables.get("batch_stats"):
        # batch_stats exist only under trunk ConvLayers/ResBlocks
        out["batch_stats"] = pair_param_tree(variables["batch_stats"], ways)
    return out


class RRDBNetPaired(RRDBNet):
    """RRDB/ESRGAN with `ways` batch items packed into trunk channels.

    The reference-topology RRDB runs its dense convs at num_filters//2 = 32
    OUTPUT channels — a quarter of the 128 MXU lanes — and is trunk-bound
    (docs/performance.md: 22 MPix/s ×4). Pairing widens every dense conv to
    `ways`·growth output lanes with segment-aware block-diagonal kernels
    (the dense concat keeps each packed tensor contiguous, see
    ops/pairing.py `blockdiag_kernel_segmented`). The production tail is
    kept — it's the measured winner for RRDB (models/polyphase.py).

    Whether the w-fold structural-zero MACs pay for the lane fill at
    growth=32 is hardware-dependent; `bench.py --rrdb-paired` measures it.
    Inference-only; load weights via `rrdb_paired_variables`."""

    ways: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BatchNorm in RRDB — signature kept uniform
        x = pack_batch(x, self.ways)
        x = self._features(x)
        x = unpack_batch(x, self.ways)
        return self._tail(x)

    def _trunk_width(self) -> int:
        return self.ways * self.num_filters

    def _trunk_growth(self):
        g = self.growth_channels
        return None if g is None else self.ways * g


def _pair_conv(leaf, ways: int, segments):
    return {"kernel": jnp.asarray(blockdiag_kernel_segmented(
                np.asarray(leaf["kernel"]), ways, segments)),
            "bias": jnp.asarray(np.tile(np.asarray(leaf["bias"]), ways))}


def rrdb_paired_variables(model: RRDBNet, variables, ways: int = 2):
    """Expand trained RRDBNet variables for the paired trunk (weight-space,
    host-side, exact). Head/post-trunk convs expand block-diagonally; each
    dense conv expands with the concat's segment structure ([C] + k·[g]);
    tail parameters pass through unchanged."""
    import flax

    variables = flax.core.unfreeze(variables)
    c = model.num_filters
    g = model.growth_channels or c // 2
    nc = model.num_convs

    new_params = {}
    for name, sub in variables["params"].items():
        if name in ("Conv_0", "Conv_1"):      # head (3→C) / post-trunk (C→C)
            cin = np.asarray(sub["kernel"]).shape[2]
            new_params[name] = _pair_conv(sub, ways, [cin])
        elif name.startswith("RRDBBlock_"):
            new_params[name] = {
                dname: {f"Conv_{i}": _pair_conv(dsub[f"Conv_{i}"], ways,
                                                [c] + [g] * i)
                        for i in range(nc + 1)}
                for dname, dsub in sub.items()}
        else:                                  # tail: SubpixelConvBlock_*,
            new_params[name] = sub             # Conv_2, Conv_3
    return {**variables, "params": new_params}


def rrdb_paired_model(model: RRDBNet, variables, ways: int = 2):
    """(RRDBNetPaired, converted variables) for a trained RRDBNet."""
    if type(model) is not RRDBNet:
        raise TypeError(f"rrdb pairing supports RRDBNet, got {type(model)}")
    fields = ("upsample_factor", "num_filters", "num_rrdb_blocks",
              "num_dense_blocks", "num_convs", "kernel_size",
              "residual_scaling", "dtype", "growth_channels")
    paired = RRDBNetPaired(ways=ways,
                           **{f: getattr(model, f) for f in fields})
    return paired, rrdb_paired_variables(model, variables, ways)


def paired_model(model, variables, ways: int = 2, polyphase: bool = True):
    """(paired module, converted variables) for a trained SRResNet.

    With `polyphase=True` (default) the result also carries the polyphase
    tail (the production serving lowering); pass a plain SRResNet either
    way — an already-polyphase model/variables pair is composed as-is."""
    fields = ("upsample_factor", "num_filters", "num_res_blocks", "momentum",
              "batch_norm", "dtype", "bn_axis_name")
    if type(model) is SRResNet:
        if polyphase:
            model, variables = polyphase_model(model, variables)
        else:
            paired = SRResNetPaired(
                ways=ways, **{f: getattr(model, f) for f in fields})
            return paired, paired_variables(variables, ways)
    if type(model) is not SRResNetPolyphase:
        raise TypeError("paired trunk supports SRResNet/SRResNetPolyphase, "
                        f"got {type(model)}")
    paired = SRResNetPairedPolyphase(
        ways=ways, out_dtype=model.out_dtype,
        **{f: getattr(model, f) for f in fields})
    return paired, paired_variables(variables, ways)
