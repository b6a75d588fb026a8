"""Optimizer construction: Keras-style names/configs → optax transforms.

The reference hydrates optimizers by reflecting strings like "Adam" into
tf.keras.optimizers classes and calling .from_config (yaml_helper.py:52,
sr_model.py:120-135). Here the same YAML surface maps onto optax, including
Keras hyperparameter spellings (beta_1/beta_2/epsilon) and the
PiecewiseConstantDecay learning-rate schedule used by the SRGAN/ESRGAN paper
recipes (examples/training/example_without_yaml.py:120-127).
"""

from typing import Optional, Sequence, Union

import jax.numpy as jnp
import optax

__all__ = ["piecewise_constant_decay", "build_optimizer", "build_schedule"]


def piecewise_constant_decay(boundaries: Sequence[int], values: Sequence[float]):
    """Keras PiecewiseConstantDecay semantics: lr = values[0] while
    step <= boundaries[0], values[i] for boundaries[i-1] < step <=
    boundaries[i], values[-1] afterwards."""
    if len(values) != len(boundaries) + 1:
        raise ValueError("need len(values) == len(boundaries) + 1")
    b = jnp.asarray(list(boundaries))
    v = jnp.asarray(list(values), jnp.float32)

    def schedule(step):
        idx = jnp.sum(jnp.asarray(step) > b)
        return v[idx]

    return schedule


def build_schedule(learning_rate) -> Union[float, optax.Schedule]:
    """Accept a float, an optax schedule callable, or a dict spec:
    {"piecewise_constant_decay": {"boundaries": [...], "values": [...]}} /
    {"exponential_decay": {...}} / {"cosine_decay": {...}}."""
    if learning_rate is None:
        return 1e-3
    if callable(learning_rate) or isinstance(learning_rate, (int, float)):
        return learning_rate
    if isinstance(learning_rate, dict):
        if len(learning_rate) != 1:
            raise ValueError(f"ambiguous schedule spec: {learning_rate}")
        kind, cfg = next(iter(learning_rate.items()))
        kind = kind.lower()
        if kind in ("piecewiseconstantdecay", "piecewise_constant_decay"):
            return piecewise_constant_decay(cfg["boundaries"], cfg["values"])
        if kind in ("exponentialdecay", "exponential_decay"):
            return optax.exponential_decay(
                init_value=cfg["initial_learning_rate"],
                transition_steps=cfg["decay_steps"],
                decay_rate=cfg["decay_rate"],
                staircase=cfg.get("staircase", False))
        if kind in ("cosinedecay", "cosine_decay"):
            return optax.cosine_decay_schedule(
                init_value=cfg["initial_learning_rate"],
                decay_steps=cfg["decay_steps"],
                alpha=cfg.get("alpha", 0.0))
        if kind in ("warmupcosinedecay", "warmup_cosine_decay"):
            # linear warmup → cosine decay; the standard large-batch recipe
            # (pairs with general.grad_accum_steps / data_parallel scaling)
            return optax.warmup_cosine_decay_schedule(
                init_value=cfg.get("initial_learning_rate", 0.0),
                peak_value=cfg["peak_learning_rate"],
                warmup_steps=cfg["warmup_steps"],
                decay_steps=cfg["decay_steps"],
                end_value=cfg.get("end_learning_rate", 0.0))
        raise ValueError(f"unknown schedule kind {kind!r}")
    raise TypeError(f"bad learning_rate spec: {learning_rate!r}")


_OPTIMIZERS = {
    "adam": lambda lr, c: optax.adam(
        lr, b1=c.get("beta_1", 0.9), b2=c.get("beta_2", 0.999),
        eps=c.get("epsilon", 1e-7)),
    "adamw": lambda lr, c: optax.adamw(
        lr, b1=c.get("beta_1", 0.9), b2=c.get("beta_2", 0.999),
        eps=c.get("epsilon", 1e-7),
        weight_decay=c.get("weight_decay", 1e-4)),
    "sgd": lambda lr, c: optax.sgd(
        lr, momentum=c.get("momentum") or None,
        nesterov=c.get("nesterov", False)),
    "rmsprop": lambda lr, c: optax.rmsprop(
        lr, decay=c.get("rho", 0.9), eps=c.get("epsilon", 1e-7),
        momentum=c.get("momentum", 0.0)),
}


def build_optimizer(optimizer="Adam", config: Optional[dict] = None):
    """Build an optax GradientTransformation from a Keras-style name +
    config dict (or pass an optax transform / factory straight through)."""
    if isinstance(optimizer, optax.GradientTransformation):
        return optimizer
    config = dict(config or {})
    lr = build_schedule(config.pop("learning_rate", None))
    if callable(optimizer) and not isinstance(optimizer, str):
        # a factory like optax.adam, or a zero-arg callable like the
        # reference's `generator_optimizer()` path (sr_model.py:133)
        try:
            return optimizer(lr)
        except TypeError:
            out = optimizer()
            if not isinstance(out, optax.GradientTransformation):
                raise
            return out
    name = str(optimizer).lower()
    if name not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer {optimizer!r}; options {sorted(_OPTIMIZERS)}")
    tx = _OPTIMIZERS[name](lr, config)
    if config.get("clipnorm"):
        tx = optax.chain(optax.clip_by_global_norm(config["clipnorm"]), tx)
    return tx
