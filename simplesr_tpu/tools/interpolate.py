"""Network interpolation between two trained models (ESRGAN §3.4).

Blends the parameters of a PSNR-oriented model and a GAN-finetuned model,
`theta = (1 - alpha) * theta_psnr + alpha * theta_gan`, trading pixel
fidelity against perceptual sharpness WITHOUT retraining — the published
ESRGAN deployment recipe for tuning the fidelity/texture balance. Pairs
naturally with this framework's two-stage flow (pixel pretrain →
`resnet_checkpoint` warm-started GAN): the two stages produce exactly the
compatible model pair this tool expects.

No reference counterpart (bw0248/SimpleSR stops at the two-stage training,
examples/training/example_without_yaml.py:79-142); the technique is from
Wang et al., ESRGAN, arXiv:1809.00219.

    python -m simplesr_tpu.tools.interpolate \
        --psnr resnet_gen_best.msgpack --gan gan_gen_final.msgpack \
        --alpha 0.8 --output blended.msgpack

Sweep several alphas in one call (files get an `_a{alpha}` postfix):

    ... --alpha 0.2 0.5 0.8 --output out_dir/
"""

import argparse
import os

import jax
import numpy as np

from simplesr_tpu.train import serialization


def interpolate_models(psnr_path, gan_path, alpha):
    """Blend two saved models → (module_config, variables).

    The architecture configs must match (same topology — interpolation is
    defined parameter-wise). ALL float leaves are blended, including BN
    `batch_stats` running means/variances (a linear mix of two valid
    activation statistics — the convention torch ESRGAN interpolation also
    uses); only non-float leaves (integer step counters) are taken from the
    GAN model verbatim.
    """
    cfg_a, var_a = serialization.load_payload(psnr_path)
    cfg_b, var_b = serialization.load_payload(gan_path)
    # configs are build_generator_model kwargs; knobs added after a model
    # was saved are simply absent from its config and default to None, so
    # compare over the key union with missing == None (e.g. a pre-
    # growth_channels save vs its own warm-started GAN stage)
    keys = set(cfg_a) | set(cfg_b)
    if any(cfg_a.get(k) != cfg_b.get(k) for k in keys):
        raise ValueError(
            f"model architectures differ — psnr={cfg_a} gan={cfg_b}; "
            "interpolation needs the same topology (the two-stage "
            "pretrain->GAN flow produces a compatible pair)")

    def blend(a, b):
        a, b = np.asarray(a), np.asarray(b)
        if a.shape != b.shape:
            raise ValueError(f"parameter shape mismatch: {a.shape} vs {b.shape}")
        if not np.issubdtype(a.dtype, np.floating):
            return b
        return ((1.0 - alpha) * a.astype(np.float64)
                + alpha * b.astype(np.float64)).astype(a.dtype)

    blended = jax.tree.map(blend, var_a, var_b)
    return cfg_b, blended


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--psnr", required=True, help="pixel-trained model (.msgpack)")
    p.add_argument("--gan", required=True, help="GAN-finetuned model (.msgpack)")
    p.add_argument("--alpha", type=float, nargs="+", default=[0.8],
                   help="GAN weight(s) in [0,1]; several values sweep")
    p.add_argument("--output", required=True,
                   help="output file (single alpha) or directory (sweep)")
    args = p.parse_args(argv)

    single = len(args.alpha) == 1 and not os.path.isdir(args.output) \
        and not args.output.endswith(os.sep)
    outputs = []
    for alpha in args.alpha:
        if not 0.0 <= alpha <= 1.0:
            raise SystemExit(f"alpha must be in [0,1], got {alpha}")
        cfg, blended = interpolate_models(args.psnr, args.gan, alpha)
        if single:
            out = args.output
        else:
            stem = os.path.splitext(os.path.basename(args.gan))[0]
            out = os.path.join(args.output, f"{stem}_a{alpha:g}.msgpack")
        serialization.save_model(cfg, blended, out)
        print(f"alpha={alpha:g} -> {out}")
        outputs.append(out)
    return outputs


if __name__ == "__main__":
    main()
