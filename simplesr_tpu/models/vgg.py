"""VGG16/VGG19 feature extractor with pre- and post-activation taps.

The reference rebuilds Keras VGG conv-by-conv with separate ReLU layers so
ESRGAN's "before activation" perceptual features become addressable
(model_builder._custom_vgg, /root/reference/simple_sr/utils/models/
model_builder.py:255-272). Here every conv's pre- and post-activation output
is a named tap from the start; the forward stops at the deepest requested
layer.

Weights: the reference downloads ImageNet weights via Keras. This environment
has no network egress and no cached weights, so weights come from
``load_vgg_weights_npz`` (a .npz of `block{i}_conv{j}/kernel|bias` arrays in
HWIO layout — convertible from Keras h5 or torchvision with the bundled
helper) — or a deterministic seeded random init. A randomly-initialized VGG
is still a usable perceptual prior (random-feature perceptual losses are a
known technique), but for paper-parity numbers supply real weights.
"""

import functools
from typing import Any, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

VGG_CONFIGS = {
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}
_FILTERS = (64, 128, 256, 512, 512)


def vgg_layer_names(variant: str = "vgg19"):
    names = []
    for b, nconvs in enumerate(VGG_CONFIGS[variant], 1):
        for c in range(1, nconvs + 1):
            names.append(f"block{b}_conv{c}")
    return names


class VGGFeatures(nn.Module):
    """Runs the VGG conv stack and returns {tap_name: features}.

    ``output_layers`` entries are conv layer names ("block5_conv4"); each
    requested layer yields its tap according to ``before_activation``
    (reference vgg_loss.py builds one model per flag; here it's per-call
    static config)."""

    variant: str = "vgg19"
    output_layers: Sequence[str] = ("block5_conv4",)
    before_activation: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = VGG_CONFIGS[self.variant]
        wanted = set(self.output_layers)
        unknown = wanted - set(vgg_layer_names(self.variant))
        if unknown:
            raise ValueError(f"unknown VGG layers {sorted(unknown)} for {self.variant}")
        remaining = set(wanted)
        taps = {}
        x = jnp.asarray(x, self.dtype)
        for b, nconvs in enumerate(cfg, 1):
            for c in range(1, nconvs + 1):
                name = f"block{b}_conv{c}"
                # precision="highest": perceptual-loss features must be true
                # f32 — JAX's DEFAULT precision downcasts conv inputs.
                pre = nn.Conv(_FILTERS[b - 1], (3, 3), padding="SAME",
                              name=name, dtype=self.dtype,
                              precision="highest")(x)
                x = nn.relu(pre)
                if name in remaining:
                    taps[name] = pre if self.before_activation else x
                    remaining.discard(name)
                    if not remaining:
                        return taps
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def load_vgg_weights_npz(path, variant: str = "vgg19"):
    """Load a params pytree for VGGFeatures from an .npz file with
    `block{i}_conv{j}/kernel` (HWIO) and `.../bias` arrays."""
    data = np.load(path)
    params = {}
    for name in vgg_layer_names(variant):
        kernel = data[f"{name}/kernel"]
        bias = data[f"{name}/bias"]
        params[name] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}
    return {"params": params}


def export_keras_vgg_to_npz(out_path, variant: str = "vgg19", weights="imagenet"):
    """Convert Keras VGG weights to the .npz layout (host-side utility;
    requires TF and, for 'imagenet', network access or a cached download)."""
    import tensorflow as tf  # local import — TF is not a runtime dependency

    app = tf.keras.applications.vgg19.VGG19 if variant == "vgg19" else \
        tf.keras.applications.vgg16.VGG16
    model = app(include_top=False, weights=weights)
    arrays = {}
    for layer in model.layers:
        if "conv" in layer.name:
            kernel, bias = layer.get_weights()
            arrays[f"{layer.name}/kernel"] = kernel
            arrays[f"{layer.name}/bias"] = bias
    np.savez(out_path, **arrays)


def export_torch_vgg_to_npz(out_path, variant: str = "vgg19"):
    """Convert torchvision VGG weights (OIHW) to the .npz layout (HWIO)."""
    import torchvision  # optional dependency

    model = getattr(torchvision.models, variant)(weights="IMAGENET1K_V1")
    convs = [m for m in model.features if m.__class__.__name__ == "Conv2d"]
    arrays = {}
    for name, conv in zip(vgg_layer_names(variant), convs):
        w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW→HWIO
        arrays[f"{name}/kernel"] = w
        arrays[f"{name}/bias"] = conv.bias.detach().numpy()
    np.savez(out_path, **arrays)


def default_vgg_weights_path(variant: str = "vgg19"):
    """Discover an ImageNet weights .npz without configuration: the
    SIMPLESR_VGG_WEIGHTS env var (a file path), else `<variant>.npz` next to
    this module. Returns None when nothing is found — the moment a weights
    file appears (converted via export_keras_vgg_to_npz /
    export_torch_vgg_to_npz on any machine with egress), VGGLoss and the
    weights-gated parity tests pick it up with no code change."""
    import os

    env = os.environ.get("SIMPLESR_VGG_WEIGHTS")
    if env and os.path.isfile(env):
        return env
    bundled = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"{variant}.npz")
    if os.path.isfile(bundled):
        return bundled
    return None


@functools.lru_cache(maxsize=4)
def default_vgg_params_seed():
    return 171


def init_vgg_params(variant: str = "vgg19", seed: int = None, sample_hw=(32, 32)):
    """Deterministic random-init VGG params (fallback when no weights file)."""
    import jax

    module = VGGFeatures(variant=variant, output_layers=(vgg_layer_names(variant)[-1],))
    rng = jax.random.key(default_vgg_params_seed() if seed is None else seed)
    return module.init(rng, jnp.zeros((1, *sample_hw, 3)))
