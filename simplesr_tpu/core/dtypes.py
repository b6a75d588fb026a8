"""Mixed-precision policy for TPU.

The MXU natively consumes bfloat16; parameters and optimizer state stay in
float32 for numerical stability. This is the TPU-native replacement for the
reference's implicit all-float32 TF policy (it never configures mixed
precision; see /root/reference/simple_sr/models/sr_model.py).
"""

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through models and the train step.

    Attributes:
      param_dtype: dtype in which parameters are stored (f32).
      compute_dtype: dtype in which convolutions/matmuls execute (bf16 on TPU).
      output_dtype: dtype of model outputs / losses (f32 — losses and metrics
        must accumulate in f32 to keep PSNR comparisons meaningful).
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


def default_policy(mixed: bool = True) -> Policy:
    """bf16-compute policy by default; pure-f32 when ``mixed=False``
    (used in tests for bit-level parity against references)."""
    if mixed:
        return Policy()
    return Policy(compute_dtype=jnp.float32)
