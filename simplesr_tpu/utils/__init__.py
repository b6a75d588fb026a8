from simplesr_tpu.utils.compile_cache import (enable_compile_cache,
                                              enable_compile_cache_from_env)
from simplesr_tpu.utils.logger import setup_logger, LIB_LOGGER, RESULTS_LOGGER
from simplesr_tpu.utils.train_result import TrainResult

__all__ = ["setup_logger", "LIB_LOGGER", "RESULTS_LOGGER", "TrainResult",
           "enable_compile_cache", "enable_compile_cache_from_env"]
