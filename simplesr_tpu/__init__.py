"""simplesr_tpu — a TPU-native JAX/XLA/Pallas framework for single-image
super-resolution.

Re-designed from scratch with the capabilities of the reference library
bw0248/SimpleSR (TF2, single GPU): SRResNet/SRGAN and RRDB/ESRGAN model
families, a pluggable loss system (pixel, VGG perceptual, standard and
relativistic-average adversarial), an on-device input pipeline (random
multi-patch cropping, augmentation fan-out, bicubic LR pairing, JPEG-noise
degradation), training/evaluation/inference/experiment operations driven by a
single YAML config, checkpointing + early stopping + TensorBoard metrics, and
memory-efficient overlap-tiled inference for large images.

Unlike the reference (no parallelism of any kind; SURVEY.md §2), the compute
core is built on `jax.jit` over `jax.sharding.Mesh` — data-parallel training
and spatially-sharded inference scale over TPU slices via XLA collectives.

Public API parity map (reference → here):
  simple_sr.data_pipeline.DataPipeline      → simplesr_tpu.data.DataPipeline
  simple_sr.models.generator.Generator      → simplesr_tpu.train.Generator
  simple_sr.models.discriminator.Discriminator → simplesr_tpu.train.Discriminator
  simple_sr.models.sr_model.SRModel         → simplesr_tpu.train.SRModel
  simple_sr.operations.training             → simplesr_tpu.train.training
  simple_sr.operations.evaluation           → simplesr_tpu.eval.evaluation
  simple_sr.operations.experiment           → simplesr_tpu.config.experiment
  simple_sr.utils.config.ConfigUtil         → simplesr_tpu.config.ConfigUtil
  simple_sr.utils.image.*                   → simplesr_tpu.ops.*
  simple_sr.utils.models.model_builder      → simplesr_tpu.models.*
  simple_sr.utils.models.loss_functions.*   → simplesr_tpu.losses.*
"""

__version__ = "0.1.0"

__all__ = [
    "core",
    "ops",
    "models",
    "losses",
    "data",
    "train",
    "eval",
    "config",
    "parallel",
    "utils",
]


def __getattr__(name):
    """Lazy subpackage access: `import simplesr_tpu; simplesr_tpu.train...`
    without paying every layer's import cost up front."""
    if name in __all__:
        import importlib
        return importlib.import_module(f"simplesr_tpu.{name}")
    raise AttributeError(f"module 'simplesr_tpu' has no attribute {name!r}")
