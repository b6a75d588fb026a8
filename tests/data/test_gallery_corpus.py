"""Gallery-corpus integrity (scripts/extract_gallery_corpus.py + data/corpus).

The expanded training corpus is recovered from the reference's rendered
comparison grids; these tests pin the two safety properties the extraction
must never lose:

  1. NO held-out contamination: no committed tile may resemble the quality
     campaign's held-out probes (baboon, comic) — similarity is recomputed
     here from the committed pixels, independent of the extractor run.
  2. Annotation-free: the bottom-strip crop must have removed every
     `_annotate_img` box (label/psnr/ssim text on solid black fills).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent.parent
CORPUS = REPO / "data" / "corpus"

sys.path.insert(0, str(REPO / "scripts"))

pytestmark = pytest.mark.skipif(
    not (CORPUS / "MANIFEST.json").is_file(),
    reason="gallery corpus not extracted",
)


def _tiles():
    manifest = json.loads((CORPUS / "MANIFEST.json").read_text())
    return manifest, [REPO / e["file"] for e in manifest["kept"]]


def test_manifest_files_exist_and_sizes_match():
    manifest, paths = _tiles()
    assert paths, "manifest lists no kept tiles"
    for entry, path in zip(manifest["kept"], paths):
        assert path.is_file(), path
        w, h = Image.open(path).size
        assert (w, h) == (entry["w"], entry["h"])


def test_no_heldout_probe_contamination():
    from extract_gallery_corpus import HELDOUT_PROBES, _corr, _multi_scale_thumbs, _thumb

    probe_files = {n: Path(p) for n, p in HELDOUT_PROBES.items()}
    if not all(p.is_file() for p in probe_files.values()):
        pytest.skip("held-out probe images unavailable")
    probe_thumbs = {n: _multi_scale_thumbs(p) for n, p in probe_files.items()}
    _, paths = _tiles()
    for path in paths:
        t = _thumb(np.asarray(Image.open(path).convert("RGB")))
        for name, thumbs in probe_thumbs.items():
            sim = max(_corr(t, pt) for pt in thumbs)
            assert sim < 0.6, f"{path.name} resembles held-out probe {name} ({sim:.3f})"


def test_tiles_are_annotation_free():
    from extract_gallery_corpus import annotation_pixels

    _, paths = _tiles()
    for path in paths:
        arr = np.asarray(Image.open(path).convert("RGB"))
        assert annotation_pixels(arr) == 0, f"annotation remnants in {path.name}"


def test_corpus_grew_meaningfully():
    manifest, _ = _tiles()
    assert manifest["summary"]["tiles_kept"] >= 10
    assert manifest["summary"]["total_mpix"] >= 2.0
