"""Whole-model serialization — the `.h5` equivalent.

The reference saves the full Keras model every epoch plus a "best" copy
(sr_model.py:233-244,571,608) and reloads it for evaluation and as
`pretrained_model_path`. Here a model file is a single msgpack blob holding
the architecture config (enough to rebuild the flax module) and the variables
pytree. Extension: `.msgpack`.
"""

import json
import os

import jax
from flax import serialization as flax_ser

from simplesr_tpu.models import build_generator_model

MODEL_EXT = ".msgpack"


def save_model(module_config: dict, variables, path):
    """Write {config, variables} to `path` (directories created)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    variables = jax.device_get(variables)
    payload = {
        "config": json.dumps(module_config),
        "variables": flax_ser.to_bytes(variables),
    }
    with open(path, "wb") as f:
        f.write(flax_ser.msgpack_serialize(payload))


def resolve_model_spec(path):
    """`zoo:<name>` → the committed zoo model's file path (simplesr_tpu.zoo);
    anything else passes through. Every loader funnels through load_payload,
    so zoo names work wherever a model path is accepted (warm start,
    evaluation model_paths, serving --model, distillation teacher,
    interpolation, Keras export)."""
    path = str(path)
    if path.startswith("zoo:"):
        from simplesr_tpu import zoo
        return zoo._resolve(path[len("zoo:"):]).path
    return path


def load_payload(path):
    """Read a model file → (module_config_dict, variables) without building
    the module — the raw payload layout in one place, so tools that blend or
    inspect saved models (tools/interpolate.py) track format changes here.
    Accepts `zoo:<name>` specs (resolve_model_spec)."""
    with open(resolve_model_spec(path), "rb") as f:
        payload = flax_ser.msgpack_restore(f.read())
    config = json.loads(payload["config"])
    variables = flax_ser.msgpack_restore(payload["variables"])
    return config, variables


def load_model(path):
    """Read a model file → (module, variables)."""
    config, variables = load_payload(path)
    module = build_generator_model(**config)
    return module, variables
