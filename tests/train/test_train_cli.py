"""Package training CLI (tools/train.py) + crash supervisor
(tools/supervise.py): train → crash → supervised restart with --resume
completes the run. Exit code 75 = preempted/resumable (EX_TEMPFAIL)."""

import sys

import yaml
import pytest

from simplesr_tpu.tools import supervise as supervise_mod

NOISE_DIR = "/root/reference/tests/data/patterns/random_noise"


def _write_yaml(tmp_path, num_epochs=2):
    conf = {
        "general": {
            "operation": "training",
            "train_data_paths": NOISE_DIR,
            "results_save_path": str(tmp_path / "results"),
            "num_epochs": num_epochs,
            "batch_size": 4,
            "scale": 2,
            "train_val_split": 0.25,
            "crop_imgs": True,
            "crop_size": [16, 16, 3],
            "num_crops": 2,
            "random_seed": 3,
        },
        "model": {
            "generator": {
                "upsample_factor": 2,
                "architecture": "srresnet",
                "num_blocks": 1,
                "num_filters": 8,
                "input_dims": [16, 16],
                "dtype": "float32",
                "loss_functions": [{"loss_function": "MeanSquaredError"}],
            },
            "generator_optimizer": "Adam",
            "generator_optimizer_config": {"learning_rate": 1.0e-3},
        },
    }
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(conf))
    return str(path)


def test_train_cli_and_resume(tmp_path):
    from simplesr_tpu.tools.train import main

    cfg = _write_yaml(tmp_path, num_epochs=1)
    assert main([cfg]) == 0
    runs = list((tmp_path / "results" / "training").iterdir())
    run = [r for r in runs if not r.is_symlink()][0]
    assert list((run / "models").glob("resnet_gen_best.msgpack"))

    # --resume reuses the SAME run dir and continues it
    cfg2 = _write_yaml(tmp_path, num_epochs=2)
    assert main([cfg2, "--resume"]) == 0
    runs_after = [r for r in (tmp_path / "results" / "training").iterdir()
                  if not r.is_symlink()]
    assert len(runs_after) == 1  # no second run dir created


def test_train_cli_rejects_non_training(tmp_path):
    path = tmp_path / "eval.yaml"
    path.write_text(yaml.safe_dump(
        {"general": {"operation": "evaluation"}}))
    from simplesr_tpu.tools.train import main
    with pytest.raises(SystemExit):
        main([str(path)])


def test_supervisor_restarts_crash_with_resume(tmp_path):
    # child crashes until the marker exists, then succeeds — and must see
    # --resume on every restart
    marker = tmp_path / "crashed_once"
    child = tmp_path / "child.py"
    child.write_text(f"""
import os, sys
marker = {str(marker)!r}
if not os.path.exists(marker):
    open(marker, "w").close()
    sys.exit(1)          # first run: crash
sys.exit(0 if "--resume" in sys.argv else 2)
""")
    rc = supervise_mod.supervise(
        [sys.executable, str(child)], max_restarts=3, backoff=0.0,
        log=lambda *_: None)
    assert rc == 0
    assert marker.exists()


def test_supervisor_stops_on_preemption_code(tmp_path):
    child = tmp_path / "child.py"
    child.write_text("import sys; sys.exit(75)")
    calls = []
    rc = supervise_mod.supervise(
        [sys.executable, str(child)], max_restarts=3, backoff=0.0,
        log=calls.append)
    assert rc == 75  # resumable stop: do NOT restart in-place
    assert any("not restarting" in m for m in calls)


def test_supervisor_exhausts_restart_budget(tmp_path):
    child = tmp_path / "child.py"
    child.write_text("import sys; sys.exit(3)")
    rc = supervise_mod.supervise(
        [sys.executable, str(child)], max_restarts=2, backoff=0.0,
        log=lambda *_: None)
    assert rc == 3


def test_supervisor_cli_cmd_hook(tmp_path):
    child = tmp_path / "ok.py"
    child.write_text("import sys; sys.exit(0)")
    rc = supervise_mod.main(
        ["--max-restarts", "1", "--cmd", sys.executable, str(child)])
    assert rc == 0


def test_end_to_end_crash_resume_via_subprocess(tmp_path):
    """Real integration: training killed mid-run (hard SIGKILL, no SIGTERM
    grace), supervisor restarts with --resume, run completes from the
    per-epoch resume point."""
    cfg = _write_yaml(tmp_path, num_epochs=3)
    # wrapper that SIGKILLs itself after the first epoch ONCE
    wrapper = tmp_path / "flaky_train.py"
    marker = tmp_path / "killed_once"
    import simplesr_tpu
    repo_root = str(tmp_path.__class__(simplesr_tpu.__file__).parent.parent)
    wrapper.write_text(f"""
import sys
sys.path.insert(0, {repo_root!r})
import jax
jax.config.update("jax_platforms", "cpu")  # no TPU in the test subprocess
import os, signal, threading, time
sys.argv = ["train", {cfg!r}] + sys.argv[1:]
marker = {str(marker)!r}
if not os.path.exists(marker):
    results = {str(tmp_path / 'results' / 'training')!r}
    def killer():
        # wait until the first epoch's resume meta exists, then die hard
        import glob, json
        while True:
            for p in glob.glob(results + "/*/checkpoints/resnet_resume_meta.json"):
                try:
                    if json.load(open(p))["completed_epochs"] >= 1:
                        open(marker, "w").close()
                        os.kill(os.getpid(), signal.SIGKILL)
                except Exception:
                    pass
            time.sleep(0.2)
    threading.Thread(target=killer, daemon=True).start()
from simplesr_tpu.tools.train import main
sys.exit(main(sys.argv[1:]))
""")
    rc = supervise_mod.supervise(
        [sys.executable, str(wrapper)], max_restarts=2, backoff=0.0,
        log=lambda *_: None)
    assert rc == 0
    assert marker.exists()  # the kill really happened
    run = [r for r in (tmp_path / "results" / "training").iterdir()
           if not r.is_symlink()][0]
    import json
    meta = json.load(open(run / "checkpoints" / "resnet_resume_meta.json"))
    assert meta["completed_epochs"] == 3
