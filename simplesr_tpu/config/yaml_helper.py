"""YAML reflection helpers.

Parity with reference utils/config/yaml_helper.py: loss-functor hydration by
class name, augmentation-name resolution, resize-filter normalization, and a
generic string→object importer. YAML files written for the reference (with
`!!python/tuple` tags, see examples/training/minimal_example.yaml) load
unchanged."""

import importlib

import yaml as _yaml

from simplesr_tpu.losses import LOSS_REGISTRY
from simplesr_tpu.ops import augment as augment_ops

YAML_GENERAL_KEY = "general"
YAML_AUGMENTATION_KEY = "augmentations"
YAML_RESIZE_FILTER_KEY = "resize_filter"
YAML_MODEL_KEY = "model"
YAML_GENERATOR_KEY = "generator"
YAML_GENERATOR_OPTIMIZER_KEY = "generator_optimizer"


class _Loader(_yaml.SafeLoader):
    pass


_Loader.add_constructor(
    "tag:yaml.org,2002:python/tuple",
    lambda loader, node: tuple(loader.construct_sequence(node)))


def load_yaml(config_yaml_path):
    """Load a YAML path (or pass through an already-loaded dict)."""
    if isinstance(config_yaml_path, dict):
        return config_yaml_path
    with open(config_yaml_path) as f:
        return _yaml.load(f, Loader=_Loader)


def init_loss_functions_from_yaml(config_yaml):
    """[{loss_function: ClassName, **kwargs}, ...] → functor instances
    (reference :43-49)."""
    out = []
    for spec in config_yaml["loss_functions"]:
        name = spec["loss_function"]
        if name not in LOSS_REGISTRY:
            raise ValueError(f"unknown loss function {name!r}; "
                             f"options: {sorted(LOSS_REGISTRY)}")
        params = {k: v for k, v in spec.items() if k != "loss_function"}
        out.append(LOSS_REGISTRY[name](**params))
    return out


def init_augmentations(config_yaml):
    """Validate augmentation names in general.augmentations (reference
    :59-73 swaps strings for functions; our DataPipeline accepts names)."""
    general = config_yaml.get(YAML_GENERAL_KEY, {})
    augs = general.get(YAML_AUGMENTATION_KEY)
    if not augs:
        return config_yaml
    for name in augs:
        if name not in augment_ops.AUGMENTATIONS:
            raise ValueError(
                f"unknown augmentation {name!r}; "
                f"options: {augment_ops.get_all_available_augmentations()}")
    return config_yaml


def prepare_for_training_config(config_yaml):
    return init_augmentations(config_yaml)


def prepare_for_evaluation_config(config_yaml):
    """Normalize resize-filter names (the reference maps to
    tf.image.ResizeMethod enums, :32-40; ours are lowercase strings)."""
    general = config_yaml.get(YAML_GENERAL_KEY, {})
    rf = general.get(YAML_RESIZE_FILTER_KEY)
    if rf is not None:
        general[YAML_RESIZE_FILTER_KEY] = str(rf).lower()
    return config_yaml


def string_to_lib_object(lib, modules):
    """Generic reflection: ("optax", ["adam"]) → optax.adam (reference :52)."""
    obj = importlib.import_module(lib)
    for module in modules:
        obj = getattr(obj, module)
    return obj
