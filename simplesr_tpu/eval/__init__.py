"""Evaluation layer: paired/unpaired evaluation + PIL rendering."""

from simplesr_tpu.eval.evaluation import (
    evaluate_on_validationdata,
    evaluate_on_testdata,
)
from simplesr_tpu.eval import rendering

__all__ = ["evaluate_on_validationdata", "evaluate_on_testdata", "rendering"]
