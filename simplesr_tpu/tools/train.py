"""Package-level training CLI.

    python -m simplesr_tpu.tools.train <config.yaml> [--resume] [--profile-dir D]

Mirrors the training dispatch of `examples/run_example.py` (reference
examples/run_example.py:10-62) with supervision-friendly semantics:

  * ``--resume`` continues the YAML's latest run (injects
    ``general.resume: latest`` unless the YAML already names a run) —
    params, optimizer, epoch counter, early-stop state all restore
    (docs/training.md "Preemption tolerance and resume");
  * a preempted run (SIGTERM → durable resume point) exits with code 75
    (EX_TEMPFAIL), so wrappers can tell "stopped, resumable" apart from
    success (0) and crash (nonzero) — tools/supervise.py builds on this.
"""

import argparse
import sys

EXIT_PREEMPTED = 75  # EX_TEMPFAIL: stopped on SIGTERM, resumable


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Train from a YAML config (operation: training)")
    p.add_argument("config", help="YAML config path")
    p.add_argument("--resume", action="store_true",
                   help="continue the latest run under this config's "
                        "results tree")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace here")
    args = p.parse_args(argv)

    from simplesr_tpu.utils import enable_compile_cache_from_env
    enable_compile_cache_from_env()

    from simplesr_tpu.config import ConfigUtil, yaml_helper
    from simplesr_tpu.train import run_training

    conf_yaml = yaml_helper.load_yaml(args.config)
    operation = conf_yaml.get("general", {}).get("operation")
    if operation != "training":
        p.error(f"config's general.operation is {operation!r}, expected "
                "'training' (use examples/run_example.py for "
                "evaluation/inference)")
    if args.resume and not conf_yaml["general"].get("resume"):
        conf_yaml["general"]["resume"] = "latest"

    conf, pipeline, sr_model = ConfigUtil.from_yaml(conf_yaml)
    result = run_training(conf, pipeline, sr_model,
                          profile_dir=args.profile_dir)
    return EXIT_PREEMPTED if result is None else 0


if __name__ == "__main__":
    sys.exit(main())
