"""Discriminator wrapper: flax critic + loss functor + label smoothing.

API parity with reference models/discriminator.py:14-384 — constructor
surface, initialize_standard / initialize_relativistic / from_yaml factories,
label-smoothing semantics (_get_labels, :240-254: smoothed HR labels in
[1-offset, 1-offset+0.5], SR labels in [0, offset]), and the accuracy metric
set (discriminator_accuracy / SR_accuracy / HR_accuracy).

Deviation (documented): for the relativistic critic the reference feeds
(labels, critic) into tf.keras.metrics.Mean — which silently treats the
critic as a sample_weight, yielding a meaningless number. Here relativistic
accuracy is computed properly as sign agreement of the logits.
"""

from typing import Any

import jax
import jax.numpy as jnp

from simplesr_tpu.losses import DiscriminatorLoss, RaDiscriminatorLoss
from simplesr_tpu.models.discriminator import Discriminator as DiscriminatorNet
from simplesr_tpu.train.metrics import MetricBundle


class Discriminator:
    def __init__(self,
                 loss_function,
                 relativistic,
                 label_smoothing=False,
                 smoothing_offset=0.3,
                 num_filters=64,
                 alpha=0.2,
                 kernel_size=3,
                 momentum=0.8,
                 initializer=None,
                 input_dims=(96, 96),
                 dtype: Any = None,
                 seed: int = 1):
        del initializer  # scaled-he is pinned in the architecture
        from simplesr_tpu.core.dtypes import default_policy

        self._module = DiscriminatorNet(
            num_filters=num_filters, alpha=alpha, kernel_size=kernel_size,
            momentum=momentum, relativistic=relativistic,
            dtype=dtype or default_policy().compute_dtype)
        self._relativistic = relativistic
        self._label_smoothing = label_smoothing
        self._smoothing_offset = smoothing_offset if label_smoothing else 0.0
        # one functor or a list (summed); the reference's from_yaml accepts a
        # loss_functions list from YAML but its ctor can only hold one
        # (discriminator.py:53,363-384) — here multi-loss actually works
        self._loss_functions = list(loss_function) \
            if isinstance(loss_function, (list, tuple)) else [loss_function]
        self._input_dims = tuple(d or 96 for d in input_dims)

        self._variables = self._module.init(
            jax.random.key(seed), jnp.zeros((1, *self._input_dims, 3)), train=False)

        names = []
        for fn in self._loss_functions:
            names.append(fn.name)
            if fn.weighted:
                names.append(f"weighted_{fn.name}")
        names += ["discriminator_accuracy", "SR_accuracy", "HR_accuracy"]
        self._batch_metrics = MetricBundle(names)
        self._epoch_metrics_train = MetricBundle(names)
        self._epoch_metrics_valid = MetricBundle(names)

    # ------------------------------------------------------------ access

    def model(self):
        return self._module

    @property
    def variables(self):
        return self._variables

    def set_variables(self, variables):
        self._variables = variables

    @property
    def relativistic(self):
        return self._relativistic

    def loss_function(self):
        if len(self._loss_functions) == 1:
            return self._loss_functions[0]
        return self._loss_functions

    def batch_metrics(self):
        return self._batch_metrics

    def epoch_metrics(self, train=True):
        return self._epoch_metrics_train if train else self._epoch_metrics_valid

    def reset_epoch_metrics(self):
        self._epoch_metrics_train.reset()
        self._epoch_metrics_valid.reset()

    def reset_batch_metrics(self):
        self._batch_metrics.reset()

    def accumulate_metrics(self, metrics: dict, train=True, batch=True):
        if batch:
            self._batch_metrics.update(metrics)
        self.epoch_metrics(train).update(metrics)

    # ------------------------------------------------------------ compute

    def accuracy_metrics(self, sr_critic, hr_critic):
        """Pure accuracy computation for the jitted step."""
        if self._relativistic:
            sr_acc = jnp.mean((sr_critic < 0.0).astype(jnp.float32))
            hr_acc = jnp.mean((hr_critic > 0.0).astype(jnp.float32))
        else:
            sr_acc = jnp.mean((sr_critic < 0.5).astype(jnp.float32))
            hr_acc = jnp.mean((hr_critic >= 0.5).astype(jnp.float32))
        return {
            "discriminator_accuracy": (sr_acc + hr_acc) / 2.0,
            "SR_accuracy": sr_acc,
            "HR_accuracy": hr_acc,
        }

    def get_labels(self, key, sr_critic, hr_critic):
        """Target labels, optionally smoothed — reference _get_labels
        (:240-254): sr ∈ [0, offset], hr ∈ [1-offset, 1-offset+0.5]."""
        if not self._label_smoothing:
            return jnp.zeros_like(sr_critic), jnp.ones_like(hr_critic)
        k1, k2 = jax.random.split(key)
        noise_hr = jax.random.uniform(k1, hr_critic.shape, minval=0.0, maxval=0.5)
        noise_sr = jax.random.uniform(k2, sr_critic.shape, minval=0.0, maxval=1.0) \
            * self._smoothing_offset
        sr_labels = jnp.zeros_like(sr_critic) + noise_sr
        hr_labels = jnp.ones_like(hr_critic) - self._smoothing_offset + noise_hr
        return sr_labels, hr_labels

    def calculate_loss(self, key, sr_critic, hr_critic):
        """Pure: labels → loss functor(s, summed) → (loss, metrics incl.
        accuracies)."""
        sr_labels, hr_labels = self.get_labels(key, sr_critic, hr_critic)
        total = 0.0
        metrics = {}
        for fn in self._loss_functions:
            loss, m = fn(sr_critic, hr_critic, sr_labels, hr_labels)
            total = total + loss
            metrics.update(m)
        metrics.update(self.accuracy_metrics(sr_critic, hr_critic))
        return total, metrics

    def formatted_epoch_metrics(self, train=True):
        m = self.epoch_metrics(train).results()
        loss_names = [fn.name for fn in self._loss_functions]
        out = "".join(f"\t{n}: {m.get(n, float('nan')):.5f}\n" for n in loss_names)
        for k, v in m.items():
            if k not in loss_names:
                out += f"\t{k}: {v:.5f}\n"
        return out

    def __str__(self):
        losses = "\n ".join(str(fn) for fn in self._loss_functions)
        return ("Discriminator\n"
                f"relativistic: {self._relativistic}\n"
                f"label smoothing: {self._label_smoothing}\n"
                f"smoothing offset: {self._smoothing_offset}\n"
                f"loss function:\n {losses}\n")

    # ------------------------------------------------------------ factories

    @staticmethod
    def initialize_relativistic(weighted_loss=False, loss_weight=1.0,
                                num_filters=64, alpha=0.2, kernel_size=3,
                                momentum=0.8, initializer=None,
                                input_dims=(96, 96), **kw):
        """Relativistic critic + RaDiscriminatorLoss (reference :263-304)."""
        return Discriminator(
            loss_function=RaDiscriminatorLoss(weighted=weighted_loss, loss_weight=loss_weight),
            relativistic=True, num_filters=num_filters, alpha=alpha,
            kernel_size=kernel_size, momentum=momentum,
            initializer=initializer, input_dims=input_dims, **kw)

    @staticmethod
    def initialize_standard(weighted_loss=False, loss_weight=1.0,
                            label_smoothing=False, smoothing_offset=0.0,
                            num_filters=64, alpha=0.2, kernel_size=3,
                            momentum=0.8, initializer=None,
                            input_dims=(96, 96), **kw):
        """Standard critic + DiscriminatorLoss (reference :305-362)."""
        return Discriminator(
            loss_function=DiscriminatorLoss(weighted=weighted_loss, loss_weight=loss_weight),
            relativistic=False, label_smoothing=label_smoothing,
            smoothing_offset=smoothing_offset, num_filters=num_filters,
            alpha=alpha, kernel_size=kernel_size, momentum=momentum,
            initializer=initializer, input_dims=input_dims, **kw)

    @staticmethod
    def from_yaml(config_yaml):
        """Hydrate from YAML path/dict (reference :363-384)."""
        from simplesr_tpu.config import yaml_helper

        conf = yaml_helper.load_yaml(config_yaml) if not isinstance(config_yaml, dict) \
            else config_yaml
        disc_conf = dict(conf["model"]["discriminator"])
        losses = yaml_helper.init_loss_functions_from_yaml(disc_conf)
        disc_conf["loss_function"] = losses  # list OK: functors are summed
        disc_conf.pop("loss_functions", None)
        return Discriminator(**disc_conf)
