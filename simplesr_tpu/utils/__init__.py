from simplesr_tpu.utils.logger import setup_logger, LIB_LOGGER, RESULTS_LOGGER
from simplesr_tpu.utils.train_result import TrainResult

__all__ = ["setup_logger", "LIB_LOGGER", "RESULTS_LOGGER", "TrainResult"]
