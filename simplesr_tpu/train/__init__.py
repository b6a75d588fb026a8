"""Training layer: wrappers, state machine, epoch driver."""

from simplesr_tpu.train.generator import Generator
from simplesr_tpu.train.discriminator import Discriminator
from simplesr_tpu.train.sr_model import SRModel, SRTrainState
from simplesr_tpu.train.training import run_training
from simplesr_tpu.train.early_stopping import EarlyStopping
from simplesr_tpu.train.metrics import MeanMetric, MetricBundle
from simplesr_tpu.train.optimizers import build_optimizer, piecewise_constant_decay
from simplesr_tpu.train.serialization import save_model, load_model
from simplesr_tpu.train.distill import Distiller, build_distiller

__all__ = [
    "Generator", "Discriminator", "SRModel", "SRTrainState", "run_training",
    "EarlyStopping", "MeanMetric", "MetricBundle", "build_optimizer",
    "piecewise_constant_decay", "save_model", "load_model",
    "Distiller", "build_distiller",
]
