"""Single-command upscaler: one model file, images in, SR images out.

    python -m simplesr_tpu.tools.upscale \
        --model runs/.../resnet_gen_best.msgpack \
        --scale 4 --output out_dir input1.png input2.png ...

Large images automatically go through the overlap-tiled memory-efficient
path (with the Pallas DMA extraction kernel on TPU). This is the minimal
"serving" surface on top of the eval machinery.
"""

import argparse
import os
import time

import numpy as np


def upscale_files(model_path, inputs, output_dir, scale, tile_threshold=1000,
                  fast=True, ensemble=False, paired=0):
    import jax.numpy as jnp
    from PIL import Image

    from simplesr_tpu.data import read_img
    from simplesr_tpu.eval.evaluation import _as_predictor, _upscale
    from simplesr_tpu.eval.rendering import tensor_to_img

    predict = _as_predictor(model_path, fast=fast, ensemble=ensemble,
                            paired=paired)
    os.makedirs(output_dir, exist_ok=True)
    outputs = []
    for path in inputs:
        img = read_img(path) / 255.0  # LR contract: [0, 1]
        t0 = time.perf_counter()
        sr = _upscale(predict, jnp.asarray(img)[None], scale)
        sr = np.asarray(sr[0])
        dt = time.perf_counter() - t0
        out_path = os.path.join(
            output_dir,
            os.path.splitext(os.path.basename(path))[0] + f"_x{scale}.png")
        # SR output is [-1, 1] (tanh); map to display range explicitly
        arr = np.clip((sr + 1.0) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(out_path)
        print(f"{path} -> {out_path}  {img.shape[1]}x{img.shape[0]} -> "
              f"{arr.shape[1]}x{arr.shape[0]}  ({dt:.2f}s)")
        outputs.append(out_path)
    return outputs


def main(argv=None):
    from simplesr_tpu.utils import enable_compile_cache_from_env
    enable_compile_cache_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True, help="saved model (.msgpack)")
    p.add_argument("--scale", type=int, default=4, help="model upsample factor")
    p.add_argument("--output", default=".", help="output directory")
    p.add_argument("--no-fast", action="store_true",
                   help="serve the training-form module (skip the exact "
                        "polyphase serving reparameterization)")
    p.add_argument("--ensemble", action="store_true",
                   help="x8 geometric self-ensemble (rotations+flips "
                        "averaged) — higher PSNR at ~8x the compute")
    p.add_argument("--paired", type=int, default=0, metavar="W",
                   help="batch-to-channel paired trunk (W items packed "
                        "into channels for MXU lane fill; exact rewrite — "
                        "pays off on the tiled/ensemble batched paths)")
    p.add_argument("inputs", nargs="+", help="input image files")
    args = p.parse_args(argv)
    if args.paired and args.paired < 2:
        p.error(f"--paired must be >= 2, got {args.paired}")
    upscale_files(args.model, args.inputs, args.output, args.scale,
                  fast=not args.no_fast, ensemble=args.ensemble,
                  paired=args.paired)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
