"""Loss-functor protocol.

The reference defines an *implicit* functor interface shared by all generator
losses — ``loss(hr_batch, sr_batch, hr_critic, sr_critic, batch_metrics,
epoch_metrics)`` with stateful tf.metrics side effects (e.g.
/root/reference/simple_sr/utils/models/loss_functions/mean_squared_error.py:40).

JAX is functional: here the same interface is pure — every functor returns
``(weighted_loss, metrics)`` where metrics is a {name: scalar} dict the
training wrapper folds into its on-device accumulators. Any callable with
this signature composes (reference tests assert lambda/duck-typed losses
work, tests/models/test_generator.py:10-51); plain callables returning just a
scalar are auto-adapted.

Weighting semantics match the reference exactly: ``loss_weight`` is honored
only when ``weighted=True`` (mean_squared_error.py:26-34), and metrics track
the unweighted loss plus, when weighted, a ``weighted_<name>`` entry.
"""

import jax.numpy as jnp

# tf.keras.losses.BinaryCrossentropy clips probabilities by this epsilon.
_BCE_EPS = 1e-7


def bce_from_probs(labels, probs):
    """Mean binary cross-entropy on probabilities (tf.keras BCE semantics:
    probs clipped to [eps, 1-eps])."""
    p = jnp.clip(probs, _BCE_EPS, 1.0 - _BCE_EPS)
    return -jnp.mean(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))


def bce_from_logits(labels, logits):
    """Mean sigmoid cross-entropy on logits (numerically stable)."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class Loss:
    """Base class handling the reference's weighted/metrics conventions."""

    name = "loss"

    def __init__(self, weighted=False, loss_weight=1.0, track_metrics=True):
        self.weighted = weighted
        self.loss_weight = loss_weight if weighted else 1.0
        self.track_metrics = track_metrics

    def _package(self, loss):
        weighted_loss = loss * self.loss_weight
        metrics = {}
        if self.track_metrics:
            metrics[self.name] = loss
            if self.weighted:
                metrics[f"weighted_{self.name}"] = weighted_loss
        return weighted_loss, metrics

    def __str__(self):
        return (f"## {type(self).__name__}\n"
                f"weighted: {self.weighted}\n"
                f"loss weight: {self.loss_weight}\n")


def adapt_generator_loss(fn):
    """Wrap a bare callable ``f(hr, sr, hr_critic, sr_critic) -> scalar`` (or
    a Loss-style functor) into the uniform (loss, metrics) protocol."""
    if hasattr(fn, "name") and hasattr(fn, "loss_weight"):
        return fn

    class _Adapted:
        name = getattr(fn, "__name__", "custom_loss")
        weighted = False
        loss_weight = 1.0

        def __call__(self, hr, sr, hr_critic, sr_critic):
            out = fn(hr, sr, hr_critic, sr_critic)
            if isinstance(out, tuple):
                return out
            return out, {self.name: out}

    return _Adapted()
