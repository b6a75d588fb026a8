"""The stall-watchdog wrapper: healthy commands pass through, silent-but-
alive commands are killed and retried, failures propagate exit codes."""

import importlib.util
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "watched_run",
    os.path.join(os.path.dirname(__file__), "..", "..", "scripts",
                 "watched_run.py"))
watched_run = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(watched_run)


def _log(tmp_path):
    return str(tmp_path / "out.log")


def test_healthy_command_passes_through(tmp_path):
    rc = watched_run.main(["--stall-seconds", "30", "--log", _log(tmp_path),
                           "--", sys.executable, "-c", "print('hi')"])
    assert rc == 0
    assert b"hi" in open(_log(tmp_path), "rb").read()


def test_exit_code_propagates(tmp_path):
    rc = watched_run.main(["--stall-seconds", "30", "--log", _log(tmp_path),
                           "--", sys.executable, "-c", "raise SystemExit(7)"])
    assert rc == 7


def test_stalled_command_is_killed(tmp_path):
    # prints once then sleeps forever: the wedge signature
    rc = watched_run.main(
        ["--stall-seconds", "2", "--poll", "0.3", "--retries", "0",
         "--log", _log(tmp_path), "--", sys.executable, "-u", "-c",
         "import time; print('start'); time.sleep(600)"])
    assert rc == 124


def test_slow_but_alive_survives(tmp_path):
    # prints every 0.5 s for 2.5 s: slower than poll, faster than stall.
    # stall-seconds is generous (15) because interpreter startup counts as
    # silence — under a loaded box 3 s flaked (round-3 full-suite run).
    rc = watched_run.main(
        ["--stall-seconds", "15", "--poll", "0.2", "--log", _log(tmp_path),
         "--", sys.executable, "-u", "-c",
         "import time\n"
         "for i in range(5): print(i, flush=True); time.sleep(0.5)"])
    assert rc == 0


def test_block_buffered_child_survives(tmp_path):
    # no -u and no flush: a child writing to a file block-buffers stdout.
    # The wrapper must inject PYTHONUNBUFFERED so short progress lines
    # still advance the log (the liveness signal) instead of sitting in an
    # 8KB stdio buffer past the stall threshold.
    # Stall threshold sized for CI-load robustness: the stall clock starts
    # at spawn, so interpreter startup under a loaded box counts as silence.
    # The child stays discriminating — it runs ~10.8s, well past the 8s
    # threshold, so block-buffered (silent) output WOULD trigger the kill.
    rc = watched_run.main(
        ["--stall-seconds", "8", "--poll", "0.2", "--retries", "0",
         "--log", _log(tmp_path), "--", sys.executable, "-c",
         "import time\n"
         "for i in range(12): print(i); time.sleep(0.9)"])
    assert rc == 0


def test_no_command_errors(tmp_path):
    import pytest
    with pytest.raises(SystemExit):
        watched_run.main(["--log", _log(tmp_path), "--"])
