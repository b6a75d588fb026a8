"""Pixel losses: MSE (SRResNet) and MAE (ESRGAN content loss).

Parity: reference loss_functions/mean_squared_error.py and
mean_absolute_error.py — same names, same weighted semantics, same metric
keys."""

import jax.numpy as jnp

from simplesr_tpu.losses.base import Loss


class MeanSquaredError(Loss):
    name = "mean_squared_error"

    def __call__(self, hr_batch, sr_batch, hr_critic=None, sr_critic=None):
        loss = jnp.mean((jnp.asarray(hr_batch, jnp.float32) -
                         jnp.asarray(sr_batch, jnp.float32)) ** 2)
        return self._package(loss)


class MeanAbsoluteError(Loss):
    name = "mean_absolute_error"

    def __call__(self, hr_batch, sr_batch, hr_critic=None, sr_critic=None):
        loss = jnp.mean(jnp.abs(jnp.asarray(hr_batch, jnp.float32) -
                                jnp.asarray(sr_batch, jnp.float32)))
        return self._package(loss)
