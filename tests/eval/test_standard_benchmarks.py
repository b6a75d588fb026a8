"""Standard-benchmark harness (scripts/standard_benchmarks.py): the
dataset-gated Set5/Set14/BSDS100 evaluator vs the BASELINE.md anchors.

The real sets cannot exist here (zero egress), so these tests pin the full
code path on synthetic set directories + a committed zoo model, the BT.601
protocol math, and the gate behavior — the moment real images appear the
same path produces literature-comparable numbers.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent / "scripts"))

import standard_benchmarks as sb  # noqa: E402


def _write_png(path, rng, h, w):
    from PIL import Image
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture()
def fake_sets(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "benchmarks"
    d = root / "Set5"
    d.mkdir(parents=True)
    for i, (h, w) in enumerate([(32, 36), (40, 44)]):
        _write_png(d / f"img{i}.png", rng, h, w)
    return root


def test_gate_exits_2_without_datasets(tmp_path, capsys):
    assert sb.run(scale=4, data_root=tmp_path / "nope") == 2
    assert "Mount the HR images" in capsys.readouterr().err


def test_discovery_is_case_insensitive_and_skips_lr(tmp_path):
    rng = np.random.default_rng(1)
    d = tmp_path / "set14"
    d.mkdir()
    _write_png(d / "a.png", rng, 12, 12)
    _write_png(d / "a_LR.png", rng, 6, 6)  # paired LR files must not score
    found = sb.discover_datasets(tmp_path)
    assert list(found) == ["Set14"]
    assert [p.name for p in found["Set14"]] == ["a.png"]


def test_bt601_protocol_math():
    import jax.numpy as jnp
    # white → Y = 16 + 65.481 + 128.553 + 24.966 = 235 (BT.601 headroom)
    white = jnp.ones((4, 4, 3))
    assert float(sb.bt601_y(white)[0, 0, 0]) == pytest.approx(235.0, abs=1e-3)
    assert float(sb.bt601_y(jnp.zeros((4, 4, 3)))[0, 0, 0]) == pytest.approx(16.0)
    # identical pair → SSIM 1, PSNR inf
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    row = sb.score_pair(img, img, scale=2)
    assert row["ssim_y"] == pytest.approx(1.0, abs=1e-5)
    assert np.isinf(row["psnr_y"])


def test_full_run_with_zoo_model_and_reports(fake_sets, tmp_path):
    from simplesr_tpu import zoo
    out = tmp_path / "out"
    rc = sb.run(scale=2, model_specs=[zoo.describe("srresnet_x2").path],
                data_root=fake_sets, out_dir=out)
    assert rc == 0
    results = json.loads((out / "STANDARD.json").read_text())
    table = results["sets"]["Set5"]
    assert set(table) == {"bicubic"} | {zoo.describe("srresnet_x2").path}
    for row in table.values():
        assert row["images"] == 2
        assert np.isfinite(row["psnr_y"]) and 0 < row["ssim_y"] <= 1
    md = (out / "STANDARD.md").read_text()
    assert "| Set5 | bicubic |" in md


def test_tiled_branch_executes(tmp_path):
    """Regression: the >tile_threshold branch once passed patch_size as an
    int, crashing with TypeError the first time a large real image appeared
    (ADVICE r3). Lower the threshold so the tiled path runs on a synthetic
    image and produces finite metrics."""
    from simplesr_tpu import zoo

    rng = np.random.default_rng(3)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    # LR side = 144 > threshold 140 and ≥ 128, so the tiled branch fires
    _write_png(img_dir / "big.png", rng, 288, 296)
    fn = zoo.load("srresnet_x2")
    table = sb.evaluate_set(sorted(img_dir.iterdir()),
                            {"bicubic": None, "model": fn},
                            scale=2, tile_threshold=140)
    for row in table.values():
        assert np.isfinite(row["psnr_y"]) and 0 < row["ssim_y"] <= 1


def test_anchor_lookup():
    assert sb._anchor_for("srresnet_x4", "Set5", 4) == (32.05, 0.9019)
    assert sb._anchor_for("bicubic", "Set14", 4) == (26.00, 0.7027)
    assert sb._anchor_for("srresnet_x4", "Set5", 2) is None
    assert sb._anchor_for("unknown", "Set5", 4) is None
