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

import flax.linen as nn

from simplesr_tpu.models.srresnet import SRResNet
from simplesr_tpu.models.polyphase import SRResNetPolyphase, polyphase_model
from simplesr_tpu.ops.pairing import pack_batch, unpack_batch, pair_param_tree

__all__ = ["SRResNetPaired", "SRResNetPairedPolyphase", "paired_variables",
           "paired_model"]

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
