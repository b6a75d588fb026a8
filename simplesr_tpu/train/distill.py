"""Knowledge distillation: a frozen teacher inside the fused train step.

No reference counterpart (SURVEY.md §2 — the reference trains each
architecture against ground truth only). This is the classic SR distillation
recipe: a small, fast student (e.g. SRResNet — 163 MPix/s on one chip) is
trained to match a large teacher (e.g. RRDB) *in addition to* the ground
truth, closing part of the quality gap at none of the serving cost.

TPU-native shape: the teacher forward runs inside SRModel's single jitted
G(+D) step, in eval mode, under `stop_gradient` — XLA fuses it with the
student step, so there is no second device program and no extra host↔device
traffic. Teacher variables ride the jit closure as constants (replicated
over the mesh when one is set), so the training-state pytree, checkpoints
and `donate_argnums` are untouched: a distilled run's checkpoint is a
standard student checkpoint.

Config surface: ``distill:`` accepts either a mapping

    distill:
      model: path/to/teacher.msgpack   # or an in-memory (module, variables)
      weight: 0.5                      # scales the distill term (default 1.0)
      loss: mae                        # "mae" (default) or "mse"

or just the path string (defaults apply). YAML: `general.distill`, CLI
campaigns: `--distill teacher.msgpack`.
"""

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Distiller", "build_distiller"]


class Distiller(NamedTuple):
    """A resolved teacher: pure apply closure + loss settings."""
    apply_fn: Callable[[Any], Any]  # lr batch -> teacher SR batch (f32)
    weight: float
    loss: str  # "mae" | "mse"

    def loss_terms(self, sr, lr):
        """The distill penalty for a student output `sr` on LR batch `lr`.

        Returns (weighted_term, metrics). Pure — called inside the jitted
        train/validation step; the teacher forward is stop-gradiented so
        student gradients see it as a constant target.
        """
        teacher_sr = jax.lax.stop_gradient(
            jnp.asarray(self.apply_fn(lr), jnp.float32))
        if self.loss == "mse":
            value = jnp.mean(jnp.square(sr - teacher_sr))
        else:
            value = jnp.mean(jnp.abs(sr - teacher_sr))
        metrics = {"distillation_loss": value}
        if self.weight != 1.0:
            metrics["weighted_distillation_loss"] = self.weight * value
        return self.weight * value, metrics


def build_distiller(spec, *, student_upsample_factor=None, mesh=None):
    """Normalize a ``distill:`` spec into a :class:`Distiller`.

    ``spec`` is a path string, a ``(module, variables)`` pair, or a mapping
    with keys ``model`` (path or pair — required), ``weight``, ``loss``.
    When the teacher comes from a model file its recorded upsample factor is
    validated against the student's (a mismatched teacher would produce a
    shape error deep inside jit; fail loudly here instead). Under a mesh the
    teacher variables are placed replicated so the closure constants carry
    an explicit sharding.
    """
    if isinstance(spec, Distiller):
        return spec
    if isinstance(spec, (str,)) or hasattr(spec, "__fspath__"):
        spec = {"model": spec}
    elif isinstance(spec, tuple):
        spec = {"model": spec}
    elif not isinstance(spec, dict):
        raise ValueError(f"unsupported distill spec: {spec!r}")
    if "model" not in spec:
        raise ValueError("distill spec needs a 'model' (path or "
                         "(module, variables) pair)")
    unknown = set(spec) - {"model", "weight", "loss"}
    if unknown:
        raise ValueError(f"unknown distill keys: {sorted(unknown)}")

    loss = str(spec.get("loss", "mae")).lower()
    if loss not in ("mae", "mse"):
        raise ValueError(f"distill loss must be 'mae' or 'mse', got {loss!r}")
    weight = float(spec.get("weight", 1.0))
    if not weight > 0.0:
        raise ValueError(f"distill weight must be > 0, got {weight}")

    model = spec["model"]
    if isinstance(model, tuple):
        module, variables = model
    else:
        from simplesr_tpu.train import serialization
        from simplesr_tpu.models import build_generator_model
        config, variables = serialization.load_payload(str(model))
        teacher_scale = config.get("upsample_factor")
        if (student_upsample_factor is not None and teacher_scale is not None
                and int(teacher_scale) != int(student_upsample_factor)):
            raise ValueError(
                f"distillation teacher upscales x{teacher_scale} but the "
                f"student upscales x{student_upsample_factor}")
        module = build_generator_model(**config)

    if mesh is not None:
        from simplesr_tpu.parallel.mesh import replicated
        variables = jax.device_put(variables, replicated(mesh))

    def apply_fn(lr):
        return module.apply(variables, lr, train=False)

    return Distiller(apply_fn=apply_fn, weight=weight, loss=loss)
