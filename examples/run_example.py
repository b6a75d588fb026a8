"""CLI entry point: dispatch on `general.operation` in a YAML file.

Parity with reference examples/run_example.py:10-62:
    python -m examples.run_example <config.yaml>
"""

import sys
import time

from simplesr_tpu.config import ConfigUtil, yaml_helper
from simplesr_tpu.train import run_training
from simplesr_tpu.eval import evaluate_on_validationdata, evaluate_on_testdata


def run_training_example(config_yaml):
    conf, pipeline, sr_model = ConfigUtil.from_yaml(config_yaml)
    run_training(conf, pipeline, sr_model)


def run_evaluation_example(config_yaml):
    conf, pipeline = ConfigUtil.from_yaml(config_yaml)
    evaluate_on_validationdata(
        config=conf, pipeline=pipeline, calc_stats=True,
        save_grid=conf.grid, save_single=conf.save_single,
        combine_halfs=conf.combine_halfs)


def run_inference_example(config_yaml):
    conf, pipeline = ConfigUtil.from_yaml(config_yaml)
    start = time.perf_counter()
    evaluate_on_testdata(
        config=conf, pipeline=pipeline, save_single=conf.save_single,
        combine_halfs=conf.combine_halfs, interpolate=conf.interpolate,
        grid=conf.grid, with_original=conf.with_original)
    print(f"inference took {time.perf_counter() - start:.2f} sec")


def main(argv):
    if len(argv) != 2:
        print("usage: python -m examples.run_example <config.yaml>")
        return 1
    # SIMPLESR_COMPILE_CACHE=<dir> persists XLA executables across runs
    # (minutes -> milliseconds for repeat train-step compiles)
    from simplesr_tpu.utils import enable_compile_cache_from_env
    enable_compile_cache_from_env()
    conf_yaml = yaml_helper.load_yaml(argv[1])
    operation = conf_yaml["general"]["operation"]
    if operation == "training":
        run_training_example(conf_yaml)
    elif operation == "evaluation":
        run_evaluation_example(conf_yaml)
    elif operation == "inference":
        run_inference_example(conf_yaml)
    else:
        print(f"operation {operation!r} not recognized "
              "(choose training/evaluation/inference)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
