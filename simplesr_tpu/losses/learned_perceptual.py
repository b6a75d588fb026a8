"""Learned perceptual loss from an SR-pretrained encoder.

The SRGAN/ESRGAN papers use ImageNet-VGG features as the perceptual space
(losses/vgg_loss.py). This environment has no download path for those
weights (BASELINE.md "Weights note"), so this is the measured in-domain
substitute: the feature space of a PIXEL-PRETRAINED SR generator's trunk.
The trunk of a converged SRResNet maps an image to the representation it
needs for reconstructing high-frequency detail — exactly the kind of
feature space a perceptual loss wants (rationale: "deep features from any
sufficiently trained network are a perceptual metric", Zhang et al., LPIPS,
arXiv:1801.03924 §4; SR-specific encoders are the in-domain variant).

Contract mirrors VGGLoss: inputs in [-1,1] (denormalize=True), MSE over
feature maps, ``feature_scale``/``loss_weight`` applied the same way. The
extractor params are captured at functor construction and the whole forward
fuses into the generator's jitted train step — no graph boundary, same as
the flax VGG path.

No reference counterpart (bw0248/SimpleSR has only the Keras-VGG loss,
loss_functions/vgg_loss.py); this exists to keep the two-stage GAN recipes
honest in a zero-egress environment.
"""

import dataclasses
import inspect

import jax.numpy as jnp
import flax.linen as nn

from simplesr_tpu.losses.base import Loss


def _trunk_module(module):
    """A module that runs only ``module._features`` (head + trunk + skip),
    sharing the base class's parameter tree — the models/polyphase.py
    subclass pattern. Works for any generator exposing ``_features``."""
    base_cls = type(module)
    takes_train = "train" in inspect.signature(base_cls._features).parameters

    class Trunk(base_cls):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return (self._features(x, train) if takes_train
                    else self._features(x))

    Trunk.__name__ = f"{base_cls.__name__}Trunk"
    fields = {f.name: getattr(module, f.name)
              for f in dataclasses.fields(module)
              if f.name not in ("parent", "name")}
    return Trunk(**fields)


class LearnedPerceptualLoss(Loss):
    """Perceptual loss over a saved SR model's trunk features.

    Args:
      model_path: a ``.msgpack`` saved generator (train/serialization.py) —
        typically the pixel-pretrained stage-1 model; its trunk becomes the
        feature extractor. Alternatively pass ``extractor=(module,
        variables)`` directly (tests, sharing one extractor).
      feature_scale, loss_weight: as in VGGLoss (reference vgg_loss.py:59).
    """

    name = "learned_perceptual_loss"

    def __init__(self, model_path=None, feature_scale=1.0, loss_weight=1.0,
                 track_metrics=True, extractor=None):
        super().__init__(weighted=(loss_weight != 1.0), loss_weight=1.0,
                         track_metrics=track_metrics)
        # like VGGLoss: loss_weight applied unconditionally inside the sum
        self.loss_weight = loss_weight
        self.feature_scale = feature_scale
        if extractor is not None:
            self._module, self._variables = extractor
        elif model_path is not None:
            from simplesr_tpu.train.serialization import load_model
            self._module, self._variables = load_model(model_path)
        else:
            raise ValueError("need model_path or extractor=(module, variables)")
        if not hasattr(self._module, "_features"):
            raise ValueError(
                f"{type(self._module).__name__} has no trunk feature method")
        self._trunk = _trunk_module(self._module)

    def features(self, img_01):
        """Trunk features of an image batch in [0,1] (the SR generators'
        input contract, models/srresnet.py:9-10)."""
        return self._trunk.apply(self._variables, img_01, train=False)

    def __call__(self, hr_batch, sr_batch, hr_critic=None, sr_critic=None,
                 denormalize=True):
        hr = jnp.asarray(hr_batch, jnp.float32)
        sr = jnp.asarray(sr_batch, jnp.float32)
        if denormalize:  # [-1,1] → [0,1], the extractor's input range
            hr = (hr + 1.0) * 0.5
            sr = (sr + 1.0) * 0.5
        diff = (self.features(hr) - self.features(sr)).astype(jnp.float32)
        loss = jnp.mean(diff * diff) * (self.feature_scale ** 2) * self.loss_weight
        metrics = {self.name: loss} if self.track_metrics else {}
        return loss, metrics

    def __str__(self):
        return (f"## Learned Perceptual Loss\n"
                f"extractor: {type(self._module).__name__} trunk\n"
                f"feature scaling: {self.feature_scale}\n"
                f"loss weight: {self.loss_weight}\n")
