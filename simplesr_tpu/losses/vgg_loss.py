"""VGG perceptual loss (SRGAN/ESRGAN), pre- or post-activation features.

Parity with reference loss_functions/vgg_loss.py:59-180: multi-layer MSE over
(optionally scaled) VGG19/VGG16 feature maps, loss_weight applied per layer,
optional total-variation term, [-1,1]→[0,255] denormalization + Keras 'caffe'
preprocess_input (RGB→BGR, ImageNet mean subtraction).

TPU-native redesign: the reference builds a second Keras VGG graph and runs
it under its own @tf.function; here the feature extractor is a flax module
whose params are captured at functor construction, so the two VGG forwards
fuse into the generator's jitted train step (one XLA program, no graph
boundary). Weights load from an .npz (models/vgg.py) or fall back to a
seeded random init — this environment has no ImageNet download path.
"""

from typing import Optional, Sequence

import jax.numpy as jnp

from simplesr_tpu.losses.base import Loss
from simplesr_tpu.models.vgg import (VGGFeatures, default_vgg_weights_path,
                                     init_vgg_params, load_vgg_weights_npz)

# Keras caffe-mode ImageNet means, BGR order (vgg19.preprocess_input).
_IMAGENET_MEAN_BGR = (103.939, 116.779, 123.68)


def vgg_preprocess(img_0_255):
    """RGB [0,255] → BGR, mean-subtracted (Keras preprocess_input 'caffe')."""
    bgr = img_0_255[..., ::-1]
    return bgr - jnp.asarray(_IMAGENET_MEAN_BGR, img_0_255.dtype)


def total_variation(images):
    """Sum of absolute spatial differences per image (tf.image.total_variation
    semantics), summed over the batch like the reference (vgg_loss.py:166-169)."""
    dh = jnp.abs(images[..., 1:, :, :] - images[..., :-1, :, :])
    dw = jnp.abs(images[..., :, 1:, :] - images[..., :, :-1, :])
    return jnp.sum(dh) + jnp.sum(dw)


class VGGLoss(Loss):
    """Perceptual loss functor.

    Args mirror the reference (vgg_loss.py:59): ``output_layers`` (str or
    list), ``feature_scale``, ``loss_weight`` (always applied, unlike pixel
    losses), ``total_variation_loss``/``total_varation_weight`` (sic — name
    kept for YAML compat), ``after_activation``, ``vgg16``,
    ``custom_weights_path`` (.npz). Extra arg ``vgg_params`` injects an
    already-loaded params pytree (used by tests and to share one VGG).
    """

    name = "vgg_loss"

    def __init__(self, output_layers, feature_scale=1.0, loss_weight=1.0,
                 total_variation_loss=False, total_varation_weight=2e-7,
                 after_activation=True, track_metrics=True, vgg16=False,
                 custom_weights=False, custom_weights_path: Optional[str] = None,
                 vgg_params=None):
        super().__init__(weighted=(loss_weight != 1.0), loss_weight=1.0,
                         track_metrics=track_metrics)
        # The reference applies loss_weight unconditionally inside the layer
        # sum (vgg_loss.py:164) — keep that, not the pixel-loss gating.
        self.loss_weight = loss_weight
        self.feature_scale = feature_scale
        self.total_variation_loss = total_variation_loss
        self.total_variation_weight = total_varation_weight
        self.after_activation = after_activation
        if isinstance(output_layers, (str,)):
            output_layers = [output_layers]
        self.output_layers: Sequence[str] = tuple(output_layers)
        variant = "vgg16" if vgg16 else "vgg19"
        self.variant = variant

        if vgg_params is not None:
            self._params = vgg_params
        elif custom_weights or custom_weights_path:
            if custom_weights_path is None:
                raise ValueError("no custom weights path supplied")
            self._params = load_vgg_weights_npz(custom_weights_path, variant)
        else:
            path = default_vgg_weights_path(variant)
            if path is not None:
                self._params = load_vgg_weights_npz(path, variant)
            else:
                import logging
                logging.getLogger("simple_sr").warning(
                    "VGGLoss: no ImageNet %s weights found (set "
                    "SIMPLESR_VGG_WEIGHTS or drop %s.npz next to models/"
                    "vgg.py) — falling back to RANDOM-init features. "
                    "Perceptual loss values will not match the SRGAN/ESRGAN "
                    "papers; see docs/README 'Weights note'.", variant, variant)
                self._params = init_vgg_params(variant)

        self._module = VGGFeatures(
            variant=variant, output_layers=self.output_layers,
            before_activation=not after_activation,
        )

    def features(self, img_0_255):
        taps = self._module.apply(self._params, vgg_preprocess(img_0_255))
        return [taps[name] for name in self.output_layers]

    def __call__(self, hr_batch, sr_batch, hr_critic=None, sr_critic=None,
                 denormalize=True):
        hr = jnp.asarray(hr_batch, jnp.float32)
        sr = jnp.asarray(sr_batch, jnp.float32)
        if denormalize:
            hr = (hr + 1.0) * 127.5
            sr = (sr + 1.0) * 127.5
        loss = 0.0
        for hr_f, sr_f in zip(self.features(hr), self.features(sr)):
            diff = hr_f * self.feature_scale - sr_f * self.feature_scale
            loss = loss + jnp.mean(diff * diff) * self.loss_weight
        if self.total_variation_loss:
            loss = loss + self.total_variation_weight * total_variation(sr_batch)
        metrics = {self.name: loss} if self.track_metrics else {}
        return loss, metrics

    def visualize_feature_maps(self, picture, denormalize=True):
        p = jnp.asarray(picture, jnp.float32)
        if denormalize:
            p = (p + 1.0) * 127.5
        return self.features(p)

    def __str__(self):
        return (f"## Vgg Loss\n"
                f"output layers: {list(self.output_layers)}\n"
                f"feature scaling: {self.feature_scale}\n"
                f"after activation: {self.after_activation}\n"
                f"loss weight: {self.loss_weight}\n"
                f"total variation loss: {self.total_variation_loss}\n"
                f"total variation loss weight: {self.total_variation_weight}\n")
