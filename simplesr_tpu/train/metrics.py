"""Host-side metric accumulators.

The reference leans on tf.keras.metrics.Mean / BinaryAccuracy objects updated
inside the graph (e.g. /root/reference/simple_sr/models/generator.py:88-110).
In JAX the jitted step returns a {name: scalar} dict instead; these
accumulators fold those scalars lazily — device values are kept as-is and
only materialized when .result() is called, so metric bookkeeping never
forces a device sync in the hot loop.
"""

import numpy as np


class MeanMetric:
    """Streaming mean of scalars (tf.keras.metrics.Mean equivalent)."""

    def __init__(self):
        self._values = []

    def __call__(self, value):
        self._values.append(value)

    update = __call__

    def result(self):
        if not self._values:
            return float("nan")
        # Stack device scalars on-device and fetch ONCE — per-scalar fetches
        # would pay a full host round trip each through the TPU tunnel.
        try:
            import jax.numpy as jnp
            if any(hasattr(v, "devices") for v in self._values):
                stacked = jnp.stack([jnp.asarray(v, jnp.float32)
                                     for v in self._values])
                return float(jnp.mean(stacked))
        except Exception:
            pass
        return float(np.mean([np.asarray(v, dtype=np.float64) for v in self._values]))

    def reset_states(self):
        self._values = []

    @property
    def count(self):
        return len(self._values)


class MetricBundle:
    """A named dict of MeanMetrics with bulk update/reset/format helpers."""

    def __init__(self, names=()):
        self.metrics = {n: MeanMetric() for n in names}

    def ensure(self, name):
        if name not in self.metrics:
            self.metrics[name] = MeanMetric()
        return self.metrics[name]

    def update(self, values: dict):
        for name, v in values.items():
            self.ensure(name)(v)

    def results(self):
        return {n: m.result() for n, m in self.metrics.items() if m.count}

    def last_values(self):
        """Raw (possibly still on-device) last value per metric — no sync."""
        return {n: m._values[-1] for n, m in self.metrics.items() if m.count}

    def reset(self):
        for m in self.metrics.values():
            m.reset_states()

    def __getitem__(self, name):
        return self.metrics[name]

    def __contains__(self, name):
        return name in self.metrics

    def keys(self):
        return self.metrics.keys()
