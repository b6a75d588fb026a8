"""bench.py is the driver's round-end artifact — smoke it on CPU.

A broken import, a renamed model kwarg, or a bad CLI branch in bench.py
only surfaces when the driver runs it on the chip at round end, where a
failure records nothing. These tests execute the measurement functions at
toy sizes (numbers are meaningless on CPU; shape/flow correctness is the
point) and pin the CLI validation paths.
"""

import json
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def test_inference_paths_run():
    # paired runs need batch % ways == 0
    for kw in ({}, {"polyphase": False}, {"paired_ways": 2},
               {"num_filters": 16}):
        v = bench.measure_inference_mpix_s(batch=2, lr_hw=8, chain=1, **kw)
        assert v > 0


def test_rrdb_paths_run():
    for kw in ({"mode": "up"}, {"mode": "none"}, {"paired_ways": 2}):
        v = bench.measure_rrdb_inference_mpix_s(
            batch=2, lr_hw=8, chain=1, num_rrdb_blocks=1, **kw)
        assert v > 0


def test_train_step_runs():
    ms = bench.measure_train_ms_per_step(steps=1, crop=16)
    assert ms > 0


def test_train_e2e_runs():
    e2e, device, host = bench.measure_train_e2e_mpix_s(epochs=1, crop=16)
    assert e2e > 0 and device > 0 and host > 0


def test_cli_emits_one_json_line(capsys, monkeypatch):
    # full-size measurement is a chip job; the CLI contract is the point here
    monkeypatch.setattr(bench, "measure_inference_mpix_s", lambda **kw: 42.0)
    bench.main(["--inference-only", "--no-guard"])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["metric"] == "srresnet_x4_inference_output_mpix_per_s"
    assert rec["value"] > 0 and rec["unit"] == "MPix/s/chip"
    assert rec["vs_baseline"] > 0


def test_cli_flag_validation():
    with pytest.raises(SystemExit):
        bench.main(["--paired", "1", "--no-guard"])
    with pytest.raises(SystemExit):
        bench.main(["--rrdb-paired", "0", "--no-guard"])
    with pytest.raises(SystemExit):
        bench.main(["--rrdb", "bogus", "--no-guard"])


def test_flag_int_parsing():
    assert bench._flag_int(["--paired", "4"], "--paired", 2) == 4
    assert bench._flag_int(["--paired"], "--paired", 2) == 2
    assert bench._flag_int(["--paired", "--batch"], "--paired", 2) == 2
    assert bench._flag_int([], "--paired", 2) == 2
