"""Generator wrapper: flax module + loss functors + metric bookkeeping.

API parity with reference models/generator.py:17-473 — same constructor
surface, factories (srresnet / rrdb / srgan_generator / esrgan_generator /
from_yaml) with the paper-recipe loss stacks, same metric-dict naming
("generator_loss" + one Mean per loss functor + weighted_ variants).

Functional split for XLA: the loss math (`calculate_train_loss`) is pure and
runs inside SRModel's jitted step; the wrapper's MetricBundles accumulate the
returned scalars outside jit.
"""

from typing import Any

import jax
import jax.numpy as jnp

from simplesr_tpu.losses import (
    MeanSquaredError, MeanAbsoluteError, AdversarialLoss, RaAdversarialLoss,
    VGGLoss, adapt_generator_loss,
)
from simplesr_tpu.models import build_generator_model
from simplesr_tpu.train.metrics import MetricBundle
from simplesr_tpu.train import serialization


class Generator:
    def __init__(self,
                 upsample_factor,
                 architecture,
                 loss_functions,
                 num_blocks=16,
                 num_dense_blocks=3,
                 num_filters=64,
                 num_convs=4,
                 kernel_size=3,
                 residual_scaling=0.2,
                 kernel_initializer=None,
                 batch_norm=False,
                 input_dims=(None, None),
                 pretrained_model_path=None,
                 pretrained_model=None,
                 dtype: Any = None,
                 growth_channels=None,
                 remat: bool = False,
                 seed: int = 0):
        del kernel_initializer  # architectures pin their paper initializers
        self._architecture = architecture
        self._upsample_factor = upsample_factor

        if loss_functions is None or (isinstance(loss_functions, list) and not loss_functions):
            raise ValueError("no loss function for generator supplied")
        if not isinstance(loss_functions, list):
            loss_functions = [loss_functions]
        self._loss_functions = [adapt_generator_loss(f) for f in loss_functions]

        names = ["generator_loss"]
        for idx, f in enumerate(self._loss_functions):
            name = getattr(f, "name", f"loss_function_{idx}")
            names.append(name)
            if getattr(f, "weighted", False):
                names.append(f"weighted_{name}")
        self._batch_metrics = MetricBundle(names)
        self._epoch_metrics_train = MetricBundle(names)
        self._epoch_metrics_valid = MetricBundle(names)

        from simplesr_tpu.core.dtypes import default_policy
        self._dtype = dtype or default_policy().compute_dtype
        self._num_blocks = num_blocks
        self._num_dense_blocks = num_dense_blocks
        self._num_filters = num_filters
        self._num_convs = num_convs
        self._kernel_size = kernel_size
        self._residual_scaling = residual_scaling
        self._growth_channels = growth_channels
        self._remat = remat
        self._batch_norm = batch_norm
        self._input_dims = input_dims

        if pretrained_model is not None:
            # (module, variables) pair or another Generator (reference
            # two-stage pipeline: pixel-pretrained model reused for the GAN,
            # examples/training/example_without_yaml.py:315-326)
            if isinstance(pretrained_model, Generator):
                self._module = pretrained_model.model()
                self._variables = pretrained_model.variables
            else:
                self._module, self._variables = pretrained_model
        elif pretrained_model_path is not None:
            self._module, self._variables = serialization.load_model(pretrained_model_path)
        else:
            self._module = build_generator_model(
                upsample_factor=upsample_factor, architecture=architecture,
                num_blocks=num_blocks, num_filters=num_filters,
                kernel_size=kernel_size, residual_scaling=residual_scaling,
                batch_norm=batch_norm, num_convs=num_convs,
                num_dense_blocks=num_dense_blocks, dtype=dtype,
                growth_channels=growth_channels, remat=remat)
            sample_hw = tuple(d or 32 for d in input_dims)
            self._variables = self._module.init(
                jax.random.key(seed), jnp.zeros((1, *sample_hw, 3)), train=False)
        self._apply_eval = jax.jit(
            lambda v, x: self._module.apply(v, x, train=False))

    # ------------------------------------------------------------ access

    def model(self):
        """The flax module (reference returns the Keras model, generator.py:139)."""
        return self._module

    @property
    def variables(self):
        return self._variables

    def set_variables(self, variables):
        self._variables = variables

    def set_model(self, module, variables=None):
        self._module = module
        if variables is not None:
            self._variables = variables

    def module_config(self):
        return dict(
            upsample_factor=self._upsample_factor, architecture=self._architecture,
            num_blocks=self._num_blocks, num_dense_blocks=self._num_dense_blocks,
            num_filters=self._num_filters, num_convs=self._num_convs,
            kernel_size=self._kernel_size, residual_scaling=self._residual_scaling,
            batch_norm=self._batch_norm,
            growth_channels=self._growth_channels,
            remat=self._remat,
            dtype=str(jnp.dtype(self._dtype)))

    def loss_functions(self):
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

    # ------------------------------------------------------------ compute

    def generate(self, lr_batch, training=False, variables=None):
        """Host-facing SR generation with the current (or given) variables.
        ``training=True`` uses batch statistics for BatchNorm (running-stat
        updates are discarded — inside the jitted train step the stats flow
        through SRModel's state instead)."""
        v = variables if variables is not None else self._variables
        if training and "batch_stats" in v:
            out, _ = self._module.apply(v, jnp.asarray(lr_batch), train=True,
                                        mutable=["batch_stats"])
            return out
        return self._apply_eval(v, jnp.asarray(lr_batch))

    def calculate_loss(self, sr_batch, hr_batch, sr_critic, hr_critic):
        """Pure: Σ over loss functors → (total, metrics). Called inside the
        jitted train/validation step (reference calculate_train_loss,
        generator.py:202-228)."""
        total = 0.0
        metrics = {}
        for f in self._loss_functions:
            loss, m = f(hr_batch, sr_batch, hr_critic, sr_critic)
            total = total + loss
            metrics.update(m)
        metrics["generator_loss"] = total
        return total, metrics

    def accumulate_metrics(self, metrics: dict, train=True, batch=True):
        if batch:
            self._batch_metrics.update(metrics)
        self.epoch_metrics(train).update(metrics)

    def formatted_epoch_metrics(self, train=True):
        m = self.epoch_metrics(train).results()
        out = f"\ttotal loss: {m.get('generator_loss', float('nan')):.5f}\n"
        for name, val in m.items():
            if name != "generator_loss":
                out += f"\t{name}: {val:.5f}\n"
        return out

    def __str__(self):
        loss_info = "".join(str(f) for f in self._loss_functions)
        return ("# Generator\n"
                f"architecture: {self._architecture}\n"
                f"upsample factor: {self._upsample_factor}\n"
                f"loss functions:\n {loss_info}\n"
                f"number of residual blocks: {self._num_blocks}\n"
                f"number of filters: {self._num_filters}\n")

    # ------------------------------------------------------------ factories

    @staticmethod
    def srresnet(upsample_factor, loss_function=None, num_blocks=16,
                 num_filters=64, kernel_size=3, batch_norm=True,
                 input_dims=(None, None), pretrained_model_path=None,
                 pretrained_model=None, **kw):
        """SRResNet, pixel MSE by default (reference generator.py:279-313)."""
        if loss_function is None:
            loss_function = [MeanSquaredError(weighted=False, loss_weight=1.0)]
        return Generator(
            upsample_factor=upsample_factor, architecture="srresnet",
            loss_functions=loss_function, num_blocks=num_blocks,
            num_filters=num_filters, kernel_size=kernel_size,
            batch_norm=batch_norm, input_dims=input_dims,
            pretrained_model_path=pretrained_model_path,
            pretrained_model=pretrained_model, **kw)

    @staticmethod
    def rrdb(upsample_factor, loss_functions=MeanAbsoluteError, loss_weight=1.0,
             num_blocks=16, num_dense_blocks=3, num_filters=64, num_convs=4,
             kernel_size=3, residual_scaling=0.2, kernel_initializer=None,
             batch_norm=False, input_dims=(None, None),
             pretrained_model_path=None, pretrained_model=None, **kw):
        """RRDB PSNR-oriented, pixel MAE by default (reference :314-356)."""
        weighted = loss_weight != 1.0
        return Generator(
            upsample_factor=upsample_factor, architecture="rrdb",
            loss_functions=[loss_functions(weighted=weighted, loss_weight=loss_weight)],
            num_blocks=num_blocks, num_dense_blocks=num_dense_blocks,
            num_filters=num_filters, num_convs=num_convs,
            kernel_size=kernel_size, residual_scaling=residual_scaling,
            kernel_initializer=kernel_initializer, batch_norm=batch_norm,
            input_dims=input_dims, pretrained_model_path=pretrained_model_path,
            pretrained_model=pretrained_model, **kw)

    @staticmethod
    def srgan_generator(upsample_factor, vgg_loss=True, vgg_layer="block5_conv4",
                        vgg_feature_scaling=1 / 12.75, vgg_loss_weight=1.0,
                        adversarial_loss_weight=1e-3, num_blocks=16,
                        num_filters=64, kernel_size=3, batch_norm=True,
                        input_dims=(None, None), pretrained_model_path=None,
                        pretrained_model=None, vgg_weights_path=None, **kw):
        """SRGAN paper recipe: post-activation VGG54 perceptual + 1e-3
        adversarial (reference :357-403)."""
        if vgg_loss:
            losses = [VGGLoss(vgg_layer, feature_scale=vgg_feature_scaling,
                              loss_weight=vgg_loss_weight, after_activation=True,
                              custom_weights_path=vgg_weights_path)]
        else:
            losses = [MeanSquaredError(weighted=False, loss_weight=1.0)]
        losses.append(AdversarialLoss(weighted=(adversarial_loss_weight != 1.0),
                                      loss_weight=adversarial_loss_weight))
        return Generator(
            upsample_factor=upsample_factor, architecture="srresnet",
            loss_functions=losses, num_blocks=num_blocks,
            num_filters=num_filters, kernel_size=kernel_size,
            batch_norm=batch_norm, input_dims=input_dims,
            pretrained_model_path=pretrained_model_path,
            pretrained_model=pretrained_model, **kw)

    @staticmethod
    def esrgan_generator(upsample_factor, vgg_layer="block5_conv4",
                         vgg_feature_scaling=1.0, vgg_loss_weight=1.0,
                         adversarial_loss_weight=5e-3, l1_loss_weight=1e-2,
                         num_blocks=16, num_dense_blocks=3, num_filters=64,
                         num_convs=4, kernel_size=3, input_dims=(None, None),
                         pretrained_model_path=None, pretrained_model=None,
                         vgg_weights_path=None, **kw):
        """ESRGAN paper recipe: 1e-2 L1 + 5e-3 relativistic adversarial +
        pre-activation VGG54 (reference :405-450)."""
        return Generator(
            upsample_factor=upsample_factor, architecture="rrdb",
            loss_functions=[
                MeanAbsoluteError(weighted=True, loss_weight=l1_loss_weight),
                RaAdversarialLoss(weighted=True, loss_weight=adversarial_loss_weight),
                VGGLoss(output_layers=vgg_layer, feature_scale=vgg_feature_scaling,
                        loss_weight=vgg_loss_weight, after_activation=False,
                        custom_weights_path=vgg_weights_path),
            ],
            num_blocks=num_blocks, num_dense_blocks=num_dense_blocks,
            num_filters=num_filters, num_convs=num_convs,
            kernel_size=kernel_size, residual_scaling=0.2, batch_norm=False,
            input_dims=input_dims, pretrained_model_path=pretrained_model_path,
            pretrained_model=pretrained_model, **kw)

    @staticmethod
    def from_yaml(config_yaml):
        """Hydrate from a YAML path or already-loaded dict (reference :452)."""
        from simplesr_tpu.config import yaml_helper

        conf = yaml_helper.load_yaml(config_yaml) if not isinstance(config_yaml, dict) \
            else config_yaml
        gen_conf = dict(conf["model"]["generator"])
        gen_conf["loss_functions"] = yaml_helper.init_loss_functions_from_yaml(gen_conf)
        gen_conf.pop("loss_functions_yaml", None)
        return Generator(**gen_conf)
