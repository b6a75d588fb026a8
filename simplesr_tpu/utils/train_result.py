"""Training-result serialization: the four metric histories → JSON files.

Parity with reference utils/train_result.py (save_as_json:21-38)."""

import json
import os

import numpy as np


class TrainResult:
    def __init__(self, model_name, train_batch_history, train_epoch_history,
                 valid_batch_history, valid_epoch_history, config=None):
        self.model_name = model_name
        self.train_batch_history = train_batch_history
        self.train_epoch_history = train_epoch_history
        self.valid_batch_history = valid_batch_history
        self.valid_epoch_history = valid_epoch_history
        self.config = config

    def save_as_json(self, save_dir):
        os.makedirs(save_dir, exist_ok=True)
        histories = {
            "train_batch_history": self.train_batch_history,
            "train_epoch_history": self.train_epoch_history,
            "valid_batch_history": self.valid_batch_history,
            "valid_epoch_history": self.valid_epoch_history,
        }
        for name, history in histories.items():
            path = os.path.join(save_dir, f"{self.model_name}_{name}.json")
            with open(path, "w") as f:
                json.dump({k: self._to_floats(vals) for k, vals in history.items()},
                          f, indent=2)
        return list(histories)

    @staticmethod
    def _to_floats(vals):
        """Materialize a history list with one batched device fetch (per-value
        fetches pay a host round trip each through the TPU tunnel)."""
        if vals and any(hasattr(v, "devices") for v in vals):
            import jax.numpy as jnp
            stacked = jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])
            return [float(x) for x in np.asarray(stacked)]
        return [float(v) for v in vals]
