"""Measure the ACTUAL TF2 reference's SRResNet x4 inference throughput on
this machine's CPU — the honest measured floor for bench.py's vs_baseline.

The reference (bw0248/SimpleSR) publishes no performance numbers anywhere
(BASELINE.md); its thesis hardware was a CUDA-10.1-era GPU we don't have.
What we CAN measure is the reference code itself, unmodified
(/root/reference/simple_sr/utils/models/model_builder.py:99-134), executing
its inference forward pass on this host's CPU under TF 2.21 legacy-Keras.
That number is a floor, not the reference's GPU throughput — label it as
such wherever it is used.

Run:  TF_USE_LEGACY_KERAS=1 TF_ENABLE_ONEDNN_OPTS=0 \
      python scripts/measure_reference_floor.py
Prints one JSON line with the measured MPix/s (output pixels).
"""

import json
import os
import sys
import time

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

sys.path.insert(0, "/root/reference")

BATCH = 16   # bench.py's config: batch 16 x 128x128 LR -> 512x512 SR
LR_HW = 128
SCALE = 4
REPEATS = 3


def main_train():
    """Reference TRAINING floor: its own SRResNet + MSE + Adam fused step
    (the hot loop of /root/reference/simple_sr/operations/training.py:46-49,
    GradientTape in sr_model.train_step), graph-compiled, on this host CPU.
    Config matches bench.py --train: batch 16 × 96² HR crops at ×4."""
    import numpy as np
    import tensorflow as tf
    from simple_sr.utils.models import model_builder

    crop = 96
    model = model_builder.build_resnet(
        upsample_factor=SCALE, num_filters=64, num_res_blocks=16)
    opt = tf.keras.optimizers.Adam(1e-4)
    mse = tf.keras.losses.MeanSquaredError()
    rng = np.random.default_rng(0)
    lr = tf.constant(rng.uniform(0, 1, (16, crop // SCALE, crop // SCALE, 3)),
                     tf.float32)
    hr = tf.constant(rng.uniform(-1, 1, (16, crop, crop, 3)), tf.float32)

    @tf.function
    def step(lr, hr):
        with tf.GradientTape() as tape:
            sr = model(lr, training=True)
            loss = mse(hr, sr)
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    step(lr, hr).numpy()  # trace + warm
    best = 0.0
    steps = 10
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(steps):
            loss = step(lr, hr)
        _ = loss.numpy()
        dt = (time.perf_counter() - t0) / steps
        best = max(best, 16 * crop * crop / dt / 1e6)

    print(json.dumps({
        "metric": "reference_tf2_srresnet_x4_train_mpix_per_s",
        "value": round(best, 3),
        "unit": "HR MPix/s",
        "hardware": f"host CPU ({os.cpu_count()} core), TF "
                    + tf.__version__ + " legacy-Keras",
        "note": "measured floor — the reference's own fused train step on "
                "the only hardware available",
    }))


def main():
    import numpy as np
    import tensorflow as tf
    from simple_sr.utils.models import model_builder

    model = model_builder.build_resnet(
        upsample_factor=SCALE, num_filters=64, num_res_blocks=16)
    lr = np.random.default_rng(0).uniform(
        0, 1, (BATCH, LR_HW, LR_HW, 3)).astype(np.float32)

    # the reference's inference call: model(batch, training=False)
    # (operations/evaluation.py:351-359), graph-compiled as in training
    fwd = tf.function(lambda x: model(x, training=False))
    out = fwd(lr)  # trace + warm
    _ = out.numpy()

    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = fwd(lr).numpy()  # .numpy() forces full materialization
        dt = time.perf_counter() - t0
        best = max(best, BATCH * (LR_HW * SCALE) ** 2 / dt / 1e6)

    print(json.dumps({
        "metric": "reference_tf2_srresnet_x4_inference_mpix_per_s",
        "value": round(best, 3),
        "unit": "MPix/s",
        "hardware": f"host CPU ({os.cpu_count()} core), TF "
                    + tf.__version__ + " legacy-Keras",
        "note": "measured floor — the reference's own code on the only "
                "hardware available; its thesis-era GPU would be faster",
    }))


if __name__ == "__main__":
    if "--train" in sys.argv[1:]:
        main_train()
    else:
        main()
