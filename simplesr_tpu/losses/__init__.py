"""Pluggable loss library + registry for YAML reflection.

Reference: simple_sr/utils/models/loss_functions/ (7 functors) hydrated by
name through yaml_helper.init_loss_functions_from_yaml
(/root/reference/simple_sr/utils/config/yaml_helper.py:43)."""

from simplesr_tpu.losses.base import Loss, adapt_generator_loss, bce_from_probs, bce_from_logits
from simplesr_tpu.losses.pixel import MeanSquaredError, MeanAbsoluteError
from simplesr_tpu.losses.adversarial import (
    AdversarialLoss,
    RaAdversarialLoss,
    DiscriminatorLoss,
    RaDiscriminatorLoss,
)
from simplesr_tpu.losses.vgg_loss import VGGLoss, vgg_preprocess, total_variation
from simplesr_tpu.losses.learned_perceptual import LearnedPerceptualLoss

LOSS_REGISTRY = {
    "MeanSquaredError": MeanSquaredError,
    "MeanAbsoluteError": MeanAbsoluteError,
    "VGGLoss": VGGLoss,
    "LearnedPerceptualLoss": LearnedPerceptualLoss,
    "AdversarialLoss": AdversarialLoss,
    "RaAdversarialLoss": RaAdversarialLoss,
    "DiscriminatorLoss": DiscriminatorLoss,
    "RaDiscriminatorLoss": RaDiscriminatorLoss,
}

__all__ = [
    "Loss", "adapt_generator_loss", "bce_from_probs", "bce_from_logits",
    "MeanSquaredError", "MeanAbsoluteError", "VGGLoss", "LearnedPerceptualLoss",
    "AdversarialLoss",
    "RaAdversarialLoss", "DiscriminatorLoss", "RaDiscriminatorLoss",
    "LOSS_REGISTRY", "vgg_preprocess", "total_variation",
]
