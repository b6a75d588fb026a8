"""Config layer: YAML hydration, save-dir/TB management, experiment sweeps."""

from simplesr_tpu.config.config_util import ConfigUtil, AVAILABLE_OPERATIONS
from simplesr_tpu.config.experiment import Experiment
from simplesr_tpu.config import yaml_helper

__all__ = ["ConfigUtil", "AVAILABLE_OPERATIONS", "Experiment", "yaml_helper"]
