"""Recover pristine HR training content from the reference's gallery grids.

The reference ships ~23 MPix of rendered comparison grids
(/root/reference/docs/_static/gallery/thesis/*.png, + vgg_comp/) produced by
`prepare_image_grid` (/root/reference/simple_sr/utils/image/image_utils.py:292-428)
in its single-row layout: tiles pasted side by side, each `tile_h == grid_h`,
in kwargs order

    [ ground truth | low resolution (centered on black padding) | model SR ... ]

The ground-truth tile is untouched HR content except for the annotation
boxes `_annotate_img` draws in the BOTTOM strip of each tile (label
bottom-left, psnr bottom-right, ssim above psnr; image_utils.py:466-477 —
font size ≤ 16 ⇒ every box lies within the bottom 64 rows). This script
recovers ONLY the ground-truth tiles (never model outputs), crops the
annotation strip, validates the result is annotation-free, and de-dupes:

  * against the HELD-OUT probes (baboon, comic) — anything similar is
    DROPPED so the quality campaign's held-out evaluation stays clean;
  * against existing train members (lena, div2k 0004/0006) and against
    already-kept tiles — duplicates add no unique pixels.

Layout detection is structural, not guesswork: a tile count n is accepted
only if grid_w % n == 0 AND tile[1] is mostly black (the `_pad_image`
fingerprint of the LR tile, image_utils.py:431-452). Grids that don't match
(the 2-row zooms/, original-prepended grids) are skipped and reported.

Output: data/corpus/gallery/<name>.png + data/corpus/MANIFEST.json with
per-tile provenance and the similarity audit.

Run: python scripts/extract_gallery_corpus.py [--out data/corpus]
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
GALLERY = Path("/root/reference/docs/_static/gallery/thesis")

TRAIN_MEMBERS = {
    "lena": "/root/reference/tests/data/lena.png",
    "div2k_0004": "/root/reference/data/datasets/div2k/4/0004.png",
    "div2k_0006": "/root/reference/data/datasets/div2k/8/0006.png",
}
HELDOUT_PROBES = {
    "baboon": "/root/reference/tests/data/baboon.png",
    "comic": "/root/reference/tests/data/comic.png",
}

ANNOTATION_STRIP = 64  # rows; upper bound on 2*(5+line_h)+slack for font ≤ 16px
THUMB = 64


def _thumb(arr):
    """64×64 grayscale thumbnail, zero-mean/unit-norm, for correlation."""
    img = Image.fromarray(arr).convert("L").resize((THUMB, THUMB), Image.BILINEAR)
    v = np.asarray(img, np.float32)
    v -= v.mean()
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _corr(a, b):
    return float(np.sum(a * b))


def _multi_scale_thumbs(path):
    """Thumbnails of the full image and center crops at several scales, so a
    gallery tile that is a CROP of a probe still registers as similar."""
    arr = np.asarray(Image.open(path).convert("RGB"))
    out = [_thumb(arr)]
    h, w = arr.shape[:2]
    for s in (0.8, 0.6, 0.5):
        ch, cw = int(h * s), int(w * s)
        y, x = (h - ch) // 2, (w - cw) // 2
        out.append(_thumb(arr[y:y + ch, x:x + cw]))
    return out


def detect_tiles(arr):
    """(n_tiles, tile_w) for a single-row grid, or None if the layout
    fingerprint (mostly-black LR tile at index 1) doesn't match."""
    h, w = arr.shape[:2]
    best = None
    for n in range(3, 11):
        if w % n:
            continue
        tw = w // n
        if tw < 64:
            continue
        lr_tile = arr[:, tw:2 * tw]
        # LR padding is zeros in tensor space but can land at small uint8
        # values (13, 18, …) after the grid's denormalize round-trip
        blackness = float((lr_tile.max(axis=-1) <= 24).mean())
        if blackness < 0.40:
            continue
        # seam score: tile boundaries should be discontinuities
        cols = arr.astype(np.float32)
        seam = np.mean([np.abs(cols[:, k * tw] - cols[:, k * tw - 1]).mean()
                        for k in range(1, n)])
        typical = np.abs(np.diff(cols[:, ::7], axis=1)).mean() + 1e-6
        score = blackness + min(seam / typical, 3.0)
        if best is None or score > best[0]:
            best = (score, n, tw)
    return (best[1], best[2]) if best else None


def annotation_pixels(arr):
    """Count of annotation-text pixels: saturated green/red/magenta text that
    sits in the same row as a run of ≥10 exactly-black pixels (the
    `draw.rectangle(fill="black")` background every annotation gets)."""
    r = arr[..., 0].astype(np.int32)
    g = arr[..., 1].astype(np.int32)
    b = arr[..., 2].astype(np.int32)
    text = (((g >= 180) & (r <= 100) & (b <= 100)) |
            ((r >= 180) & (g <= 90) & (b <= 90)) |
            ((r >= 180) & (b >= 180) & (g <= 100)))
    black = (arr.max(axis=-1) == 0)
    # rows with a solid black run of ≥ 10 px
    runs = np.apply_along_axis(
        lambda row: int(np.max(np.diff(np.flatnonzero(np.diff(
            np.concatenate(([0], row.view(np.uint8), [0])))).reshape(-1, 2),
            axis=1), initial=0)) if row.any() else 0,
        1, black)
    return int(text[runs >= 10].sum())


def extract(out_dir):
    out_dir = Path(out_dir)
    tile_dir = out_dir / "gallery"
    tile_dir.mkdir(parents=True, exist_ok=True)

    probe_thumbs = {n: _multi_scale_thumbs(p) for n, p in HELDOUT_PROBES.items()}
    member_thumbs = {n: _multi_scale_thumbs(p) for n, p in TRAIN_MEMBERS.items()}

    grids = sorted(GALLERY.glob("*.png")) + sorted((GALLERY / "vgg_comp").glob("*.png"))
    kept, manifest = [], {"kept": [], "dropped": [], "skipped": []}
    kept_thumbs = []
    for grid_path in grids:
        rel = str(grid_path.relative_to(GALLERY.parent))
        arr = np.asarray(Image.open(grid_path).convert("RGB"))
        layout = detect_tiles(arr)
        if layout is None:
            manifest["skipped"].append({"grid": rel, "reason": "layout fingerprint not matched"})
            continue
        n, tw = layout
        gt = arr[:, :tw]
        gt = gt[:gt.shape[0] - ANNOTATION_STRIP]  # drop the annotation strip
        n_ann = annotation_pixels(gt)
        if n_ann:
            manifest["dropped"].append({"grid": rel, "reason": f"{n_ann} annotation pixels after strip crop"})
            continue
        t = _thumb(gt)
        sim_probe = {name: max(_corr(t, pt) for pt in thumbs)
                     for name, thumbs in probe_thumbs.items()}
        worst_probe = max(sim_probe.values())
        if worst_probe >= 0.60:  # baboon's own GT tile measures 0.745; next-closest non-probe tile 0.385
            manifest["dropped"].append({"grid": rel, "reason": "matches held-out probe",
                                        "similarity": sim_probe})
            continue
        sim_member = {name: max(_corr(t, mt) for mt in thumbs)
                      for name, thumbs in member_thumbs.items()}
        sim_kept = max((_corr(t, k) for k in kept_thumbs), default=0.0)
        if max(sim_member.values(), default=0.0) >= 0.90 or sim_kept >= 0.90:
            manifest["dropped"].append({"grid": rel, "reason": "duplicate content",
                                        "member_similarity": sim_member,
                                        "kept_similarity": round(sim_kept, 3)})
            continue
        name = f"gt_{grid_path.parent.name}_{grid_path.stem}" \
            if grid_path.parent.name != "thesis" else f"gt_{grid_path.stem}"
        out_path = tile_dir / f"{name}.png"
        Image.fromarray(gt).save(out_path)
        kept.append(out_path)
        kept_thumbs.append(t)
        manifest["kept"].append({
            "grid": rel, "tile": 0, "n_tiles": n,
            "file": str(out_path.relative_to(REPO)),
            "h": gt.shape[0], "w": gt.shape[1],
            "mpix": round(gt.shape[0] * gt.shape[1] / 1e6, 3),
            "probe_similarity": {k: round(v, 3) for k, v in sim_probe.items()},
            "member_similarity": {k: round(v, 3) for k, v in sim_member.items()},
        })

    total = sum(e["mpix"] for e in manifest["kept"])
    manifest["summary"] = {
        "grids_scanned": len(grids),
        "tiles_kept": len(kept),
        "total_mpix": round(total, 3),
        "existing_train_members": list(TRAIN_MEMBERS),
        "excluded_heldout_probes": list(HELDOUT_PROBES),
        "annotation_strip_rows": ANNOTATION_STRIP,
    }
    with open(out_dir / "MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"kept {len(kept)} GT tiles, {total:.2f} MPix "
          f"(dropped {len(manifest['dropped'])}, skipped {len(manifest['skipped'])})")
    for e in manifest["kept"]:
        print(f"  {e['file']}: {e['w']}x{e['h']} probe_sim={e['probe_similarity']}")
    return manifest


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", default=str(REPO / "data" / "corpus"))
    args = p.parse_args(argv)
    extract(args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
