"""Export TPU model files to reference-loadable Keras ``.h5`` generators.

The reverse of `tools/import_keras.py`, completing two-way migration with
the reference framework (bw0248/SimpleSR): a model trained here — SRResNet
/SRGAN or RRDB/ESRGAN family — becomes a legacy-HDF5 Keras model that the
reference's evaluation/inference loads directly
(``tf.keras.models.load_model``, reference operations/evaluation.py:322-328)
and that ``build_or_load_generator_model(pretrained_model_path=...)``
(reference utils/models/model_builder.py:13-19) accepts as a GAN warm start:

    python -m simplesr_tpu.tools.export_keras model.msgpack out.h5 \
        --reference /path/to/SimpleSR

Unlike the importer (which reads the HDF5 layout directly and needs no TF),
exporting requires the *target* framework: the graph is built by the
reference's OWN ``model_builder`` — guaranteeing the saved file is exactly
what the reference produces itself — and our weights are replayed into it
in creation order. The reference package is found via ``--reference``, the
``SIMPLESR_REFERENCE`` env var, or an already-importable ``simple_sr``.
TensorFlow (legacy Keras: ``TF_USE_LEGACY_KERAS=1``) must be installed —
it ships with the reference's own requirements, so the export environment
is the migration target's environment.

Weight-format conversions (inverse of the importer): flax HWIO conv
kernels are Keras-native already; PReLU alpha (C,) broadcasts back to the
layer's shared-axes shape; BN params {scale, bias} + batch_stats
{mean, var} → [gamma, beta, mean, var].

Exportability limits (checked, loud errors): the reference hardcodes
dense-block growth convs at ``num_filters//2`` (model_builder.py:333), so
RRDBs with a custom ``growth_channels`` (e.g. the lane-filled `rrdb_wide`)
have no reference-side representation.
"""

import argparse
import os

import numpy as np


def _load_reference_builder(reference=None):
    """Import the reference's `model_builder`, from `reference` (a checkout
    root), $SIMPLESR_REFERENCE, or the current environment."""
    import importlib
    import sys

    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    reference = reference or os.environ.get("SIMPLESR_REFERENCE")
    if reference:
        reference = os.path.abspath(reference)
        if not os.path.isdir(os.path.join(reference, "simple_sr")):
            raise FileNotFoundError(
                f"{reference!r} does not contain a simple_sr package")
        if reference not in sys.path:
            sys.path.insert(0, reference)
    try:
        return importlib.import_module("simple_sr.utils.models.model_builder")
    except ImportError as e:
        raise ImportError(
            "the reference framework (simple_sr) is not importable — pass "
            "--reference /path/to/SimpleSR or set SIMPLESR_REFERENCE"
        ) from e


def _kind(name):
    """Layer kind from a Keras auto-generated name ('conv2d_3' → 'conv2d')."""
    base = name.rsplit("_", 1)
    if len(base) == 2 and base[1].isdigit():
        name = base[0]
    return name


def _conv(p):
    return "conv2d", [np.asarray(p["kernel"]), np.asarray(p["bias"])]


def _prelu(p):
    return "p_re_lu", [np.asarray(p["alpha"])]


def _bn(p, s):
    return "batch_normalization", [np.asarray(p["scale"]),
                                   np.asarray(p["bias"]),
                                   np.asarray(s["mean"]),
                                   np.asarray(s["var"])]


def _srresnet_weight_sequence(config, variables):
    """Our flax tree → the reference build_resnet creation-order weight
    list [(kind, arrays)] (reference model_builder.py:99-134,275-319)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    bn = config.get("batch_norm", True)
    seq = [_conv(params["ConvLayer_0"]["Conv_0"]),
           _prelu(params["PReLU_0"])]
    for i in range(config["num_blocks"]):
        blk_p = params[f"ResBlock_{i}"]
        blk_s = stats.get(f"ResBlock_{i}", {})
        seq.append(_conv(blk_p["ConvLayer_0"]["Conv_0"]))
        if bn:
            seq.append(_bn(blk_p["ConvLayer_0"]["BatchNorm_0"],
                           blk_s["ConvLayer_0"]["BatchNorm_0"]))
        seq.append(_prelu(blk_p["PReLU_0"]))
        seq.append(_conv(blk_p["ConvLayer_1"]["Conv_0"]))
        if bn:
            seq.append(_bn(blk_p["ConvLayer_1"]["BatchNorm_0"],
                           blk_s["ConvLayer_1"]["BatchNorm_0"]))
    seq.append(_conv(params["ConvLayer_1"]["Conv_0"]))
    if bn:
        seq.append(_bn(params["ConvLayer_1"]["BatchNorm_0"],
                       stats["ConvLayer_1"]["BatchNorm_0"]))
    k = 0
    while f"SubpixelConvBlock_{k}" in params:
        seq.append(_conv(params[f"SubpixelConvBlock_{k}"]["Conv_0"]))
        seq.append(_prelu(params[f"SubpixelConvBlock_{k}"]["PReLU_0"]))
        k += 1
    seq.append(_conv(params["Conv_0"]))
    return seq


def _rrdb_weight_sequence(config, variables):
    """Our flax tree → the reference build_enhanced_resnet creation-order
    weight list (reference model_builder.py:42-97,328-351)."""
    params = variables["params"]
    num_convs = config.get("num_convs", 4)
    seq = [_conv(params["Conv_0"])]
    for i in range(config["num_blocks"]):
        blk = params[f"RRDBBlock_{i}"]
        for j in range(config.get("num_dense_blocks", 3)):
            dense = blk[f"DenseBlock_{j}"]
            for k in range(num_convs + 1):
                seq.append(_conv(dense[f"Conv_{k}"]))
    seq.append(_conv(params["Conv_1"]))
    k = 0
    while f"SubpixelConvBlock_{k}" in params:
        seq.append(_conv(params[f"SubpixelConvBlock_{k}"]["Conv_0"]))
        k += 1
    seq.append(_conv(params["Conv_2"]))
    seq.append(_conv(params["Conv_3"]))
    return seq


def _build_reference_model(builder, config):
    arch = config.get("architecture", "srresnet")
    if arch == "srresnet":
        return builder.build_resnet(
            upsample_factor=config["upsample_factor"],
            num_filters=config.get("num_filters", 64),
            num_res_blocks=config["num_blocks"],
            batch_normalization=config.get("batch_norm", True))
    if arch == "rrdb":
        nf = config.get("num_filters", 64)
        growth = config.get("growth_channels") or nf // 2
        if growth != nf // 2:
            raise ValueError(
                f"growth_channels={growth} is not representable in the "
                f"reference builder (it hardcodes num_filters//2={nf // 2}, "
                "model_builder.py:333) — wide-growth RRDBs cannot be "
                "exported")
        return builder.build_enhanced_resnet(
            upsample_factor=config["upsample_factor"],
            num_filters=nf,
            num_rrdb_blocks=config["num_blocks"],
            num_dense_blocks=config.get("num_dense_blocks", 3),
            num_convs=config.get("num_convs", 4),
            residual_scaling_factor=config.get("residual_scaling", 0.2))
    raise ValueError(f"unknown architecture {arch!r} (srresnet|rrdb)")


def export_keras_model(model_path, out_path=None, reference=None):
    """Convert a `.msgpack` model file → reference Keras model; when
    `out_path` is given, also save the legacy `.h5` the way the reference's
    SRModel does (sr_model.py:233-244)."""
    from simplesr_tpu.train import serialization

    config, variables = serialization.load_payload(model_path)
    arch = config.get("architecture", "srresnet")
    if arch == "srresnet":
        seq = _srresnet_weight_sequence(config, variables)
    elif arch == "rrdb":
        seq = _rrdb_weight_sequence(config, variables)
    else:
        raise ValueError(f"unknown architecture {arch!r} (srresnet|rrdb)")

    builder = _load_reference_builder(reference)
    model = _build_reference_model(builder, config)

    pos = 0
    for layer in model.layers:
        current = layer.get_weights()
        if not current:
            continue
        if pos >= len(seq):
            raise ValueError(
                f"reference model has more weight-bearing layers than the "
                f"exported tree provides (at {layer.name!r})")
        kind, arrays = seq[pos]
        pos += 1
        if _kind(layer.name) != kind:
            raise ValueError(
                f"layer order mismatch: reference expects "
                f"{_kind(layer.name)!r} at position {pos - 1}, tree "
                f"provides {kind!r} — config does not match the weights?")
        # PReLU alpha is stored flat here; restore the layer's shared-axes
        # shape (1,1,C). Everything else is already Keras-native layout.
        arrays = [np.asarray(a, dtype=np.float32).reshape(np.shape(c))
                  for a, c in zip(arrays, current)]
        layer.set_weights(arrays)
    if pos != len(seq):
        raise ValueError(
            f"exported tree has {len(seq)} weight groups but the reference "
            f"model consumed only {pos} — config/weights mismatch")

    if out_path is not None:
        model.save(out_path)  # legacy HDF5, exactly the reference's format
    return model, config


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", help="TPU model file (.msgpack)")
    p.add_argument("out", help="output Keras model (.h5)")
    p.add_argument("--reference",
                   help="path to a SimpleSR checkout (else "
                        "$SIMPLESR_REFERENCE or an importable simple_sr)")
    args = p.parse_args(argv)
    _, config = export_keras_model(args.model, args.out,
                                   reference=args.reference)
    print(f"exported {args.model} -> {args.out}\n  config: {config}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
