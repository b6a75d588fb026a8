"""Host-side PIL rendering: single images, SR|interpolated half-splits, and
annotated comparison grids.

API parity with reference image_utils.py:187-531 (save_single, combine_halfs,
prepare_image_grid): rows per model, columns per sample, green model labels
bottom-left, red PSNR bottom-right / SSIM above it (∞ rendered for inf, N/A
for -1), LR images padded+centered via ``low_res_key``, optional original
image pasted alongside, rotated column labels when no original is given.
Per-image min/max auto-scaling matches Keras array_to_img (tensor_to_img,
image_utils.py:28) so [-1,1], [0,1] and [0,255] tensors all render. Font:
bundled DejaVuSansMono-Bold (the reference bundles NotoSansMono-Bold the
same way, image_utils.py:527), system DejaVu / PIL default as fallbacks.
"""

import os

import numpy as np
from PIL import Image, ImageDraw, ImageFont

__all__ = ["tensor_to_img", "save_single", "combine_halfs", "prepare_image_grid"]

# bundled first — annotation output must not depend on the host's font set
_FONT_CANDIDATES = (
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "resources", "DejaVuSansMono-Bold.ttf"),
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
)

# annotation geometry: tags sit this many px inside the image border, on an
# opaque black box so they stay readable over any image content
_TAG_INSET = 5


def _load_font(font_size=10):
    for path in _FONT_CANDIDATES:
        try:
            return ImageFont.truetype(path, size=font_size)
        except OSError:
            continue
    return ImageFont.load_default()


def _tag_font(canvas_width):
    """Annotation text scales with the tile it lands on: ~16 px at 1024-wide
    and above, shrinking on small tiles with a 6 px legibility floor."""
    return _load_font(max(6, 16 - 1024 // max(canvas_width, 1)))


def _as_numpy(tensor):
    return np.asarray(tensor, dtype=np.float32)


def tensor_to_img(tensor):
    """HWC (or 1HWC) array → PIL.Image with per-image min/max scaling
    (Keras array_to_img semantics used by the reference)."""
    x = _as_numpy(tensor)
    if x.ndim == 4 and x.shape[0] == 1:
        x = x[0]
    if x.ndim != 3:
        raise ValueError("tensor must be rank 3 (or rank-4 singleton)")
    x = x - x.min()
    mx = x.max()
    if mx > 0:
        x = x / mx
    return Image.fromarray((x * 255.0).round().astype(np.uint8))


def _text_size(font, text):
    try:
        left, top, right, bottom = font.getbbox(text)
        return right - left, bottom - top
    except AttributeError:  # very old PIL
        return font.getsize(text)


def _stamp(img, text, color, *, right=False, stack=0):
    """Stamp a boxed text tag onto ``img``.

    Tags anchor to the bottom edge, ``_TAG_INSET`` px in: labels at the
    bottom-left (``right=False``), metric values at the bottom-right.
    ``stack`` lifts a tag by that many tag-heights so several right-side
    metrics stack upward (ssim above psnr) without overlapping — the same
    placement convention the reference's grids use, rebuilt from the layout
    rule rather than its code.
    """
    font = _tag_font(img.width)
    tw, th = _text_size(font, text)
    x = _TAG_INSET if not right else img.width - tw - _TAG_INSET
    y = img.height - (th + _TAG_INSET) * (stack + 1)
    pen = ImageDraw.Draw(img)
    pen.rectangle((x, y, x + tw, y + th), fill="black")
    pen.text((x, y), text, font=font, fill=color)


def save_single(tensor, save_dir, fname, label=None):
    """Save rank-3/4 tensors as PNG(s) (reference :187-204)."""
    x = _as_numpy(tensor)
    if x.ndim < 3 or x.ndim > 4:
        raise ValueError("Tensor must be of rank 3 or rank 4")
    os.makedirs(save_dir, exist_ok=True)
    items = [x] if x.ndim == 3 else list(x)
    for idx, t in enumerate(items):
        img = tensor_to_img(t)
        if label is not None:
            _stamp(img, label, (0, 255, 0))
        suffix = "" if x.ndim == 3 else f"_{idx}"
        img.save(os.path.join(save_dir, f"{fname}{suffix}.png"))


def combine_halfs(left_tensor, right_tensor, left_label, save_dir, fname,
                  right_label="interpolated", grid=False):
    """Left half of one image | right half of another, with a divider line
    (reference :215-289). Typical use: SR vs bicubic comparison."""
    left = _as_numpy(left_tensor)
    right = _as_numpy(right_tensor)
    if left.ndim == 3:
        left, right = left[None], right[None]
    if left.shape[0] != right.shape[0]:
        raise ValueError("number of sr and lr images does not match")
    if grid and (left.shape[0] % 2 != 0 or left.shape[0] < 4):
        raise ValueError("can only prepare image grid for an even number of at least 4 images")

    os.makedirs(save_dir, exist_ok=True)
    imgs = []
    for idx, (l, r) in enumerate(zip(left, right)):
        l_img = tensor_to_img(l)
        _stamp(l_img, left_label, (0, 255, 0))
        r_img = tensor_to_img(r).resize(l_img.size)
        _stamp(r_img, right_label, (255, 0, 0), right=True)

        main = Image.new("RGB", l_img.size, (255, 255, 255))
        half, end, bottom = l_img.width // 2, l_img.width, l_img.height
        main.paste(l_img.crop((0, 0, half, bottom)), (0, 0))
        main.paste(r_img.crop((half, 0, end, bottom)), (half, 0))
        ImageDraw.Draw(main).line((half, 0, half, bottom), fill=128)
        imgs.append(main)
        main.save(os.path.join(save_dir, f"{fname}_{idx}.png"))

    if grid:
        cols = 4
        rows = (len(imgs) + cols - 1) // cols
        w, h = imgs[0].width, imgs[0].height
        grid_img = Image.new("RGB", (cols * w, rows * h), (255, 255, 255))
        for idx, img in enumerate(imgs):
            grid_img.paste(img, ((idx % cols) * w, (idx // cols) * h))
        grid_img.save(os.path.join(save_dir, f"{fname}_grid.png"))


def _pad_image_batch(x, height, width):
    """Center-pad each HWC image to (height, width), then exact-resize."""
    from simplesr_tpu.ops.resize import resize as _resize

    out = []
    for t in x:
        hp = max(0, (height - t.shape[0]) // 2)
        wp = max(0, (width - t.shape[1]) // 2)
        padded = np.pad(t, [[hp, hp], [wp, wp], [0, 0]])
        if padded.shape[:2] != (height, width):
            padded = np.asarray(_resize(padded, (height, width)))
        out.append(padded)
    return np.stack(out)


def _metric_string(values, idx):
    v = np.asarray(values[idx]).reshape(-1)[0]
    if np.isinf(v):
        return "∞"
    if v == -1:
        return "N/A"
    return f"{float(v):.2f}"


def prepare_image_grid(save_dir, fname, low_res_key=None, original=None,
                       psnr=None, ssim=None, **kwargs):
    """Annotated comparison grid (reference :292-428). ``kwargs`` maps row
    labels → rank-4 (or rank-3) image tensors; all rows must hold the same
    number of images. "ground truth"/"hr" rows are excluded from grid sizing
    and bicubic-resized to match."""
    from simplesr_tpu.ops.resize import resize as _resize

    tensors = {}
    num_imgs = -1
    for label, t in kwargs.items():
        x = _as_numpy(t)
        if x.ndim == 3:
            x = x[None]
        if num_imgs == -1:
            num_imgs = x.shape[0]
        elif x.shape[0] != num_imgs:
            raise ValueError("received differing amount of images per supplied model - can't produce grid")
        tensors[label] = x

    for metric in (psnr, ssim):
        if metric is not None and len(metric) != len(tensors):
            raise ValueError("did not receive metric values for every supplied model result")

    max_h = max_w = num_cols = 0
    for label, x in tensors.items():
        if label not in ("hr", "ground truth"):
            num_cols = max(num_cols, x.shape[0])
            max_h = max(max_h, x.shape[1])
            max_w = max(max_w, x.shape[2])
    if "ground truth" in tensors:
        tensors["ground truth"] = np.asarray(
            _resize(tensors["ground truth"], (max_h, max_w), method="bicubic"))

    num_rows = len(tensors)

    def _tile(label, x, idx, inline_label):
        """One annotated grid tile: inline label bottom-left, psnr
        bottom-right, ssim stacked above it."""
        img = tensor_to_img(x[idx])
        if inline_label:
            _stamp(img, label, (0, 255, 0))
        if psnr and psnr.get(label) is not None:
            _stamp(img, f"psnr: {_metric_string(psnr[label], idx)}",
                   (255, 0, 0), right=True)
        if ssim and ssim.get(label) is not None:
            _stamp(img, f"ssim: {_metric_string(ssim[label], idx)}",
                   (255, 0, 0), right=True, stack=1)
        return img

    if num_cols == 1:
        # single-sample grids lay the models out SIDE BY SIDE in one row
        # with inline labels — no rotated-label gutter (reference
        # image_utils.py:341-366 has this dedicated num_cols==1 layout)
        grid_w, grid_h = num_rows * max_w, max_h
        grid_img = Image.new("RGB", (grid_w, grid_h), (255, 255, 255))
        for col, (label, x) in enumerate(tensors.items()):
            if label == low_res_key:
                x = _pad_image_batch(x, max_h, max_w)
            grid_img.paste(_tile(label, x, 0, inline_label=True),
                           (col * max_w, 0))
    else:
        # multi-sample grids: one row per model, samples as columns; row
        # labels go in a rotated gutter on the left unless an original
        # image will be pasted there instead
        column_label_width = 0 if original is not None else int(num_cols * max_w * 0.05)
        grid_w = num_cols * max_w + column_label_width
        grid_h = num_rows * max_h
        grid_img = Image.new("RGB", (grid_w, grid_h), (255, 255, 255))
        for row, (label, x) in enumerate(tensors.items()):
            if label == low_res_key:
                x = _pad_image_batch(x, max_h, max_w)
            gutter = original is None and column_label_width > 0
            if gutter:
                grid_img.paste(
                    _row_label_strip(label, column_label_width, max_h,
                                     (0, 255, 0), grid_w),
                    (0, row * max_h))
            for idx in range(x.shape[0]):
                grid_img.paste(_tile(label, x, idx, inline_label=not gutter),
                               (column_label_width + max_w * idx, row * max_h))

    if original is not None:
        origin = Image.open(original) if isinstance(original, (str, os.PathLike)) else original
        if not isinstance(origin, Image.Image):
            origin = tensor_to_img(origin)
        aspect = origin.width / origin.height
        oh = grid_img.height
        ow = max(1, int(aspect * oh))
        origin = origin.resize((ow, oh))
        _stamp(origin, "original", (255, 0, 255))
        combined = Image.new("RGB", (grid_w + ow, grid_h), (255, 255, 255))
        combined.paste(origin, (0, 0))
        combined.paste(grid_img, (ow, 0))
        grid_img = combined

    os.makedirs(save_dir, exist_ok=True)
    out_path = os.path.join(save_dir, f"{fname}.png")
    grid_img.save(out_path)
    return out_path


def _row_label_strip(text, strip_w, strip_h, color, grid_width):
    """A vertical (strip_w × strip_h) black band carrying the row label,
    reading bottom-to-top. Built by typesetting horizontally onto a sideways
    canvas and transposing it upright — PIL has no vertical text layout."""
    sideways = Image.new("RGB", (strip_h, strip_w))
    font = _tag_font(grid_width)
    text_h = _text_size(font, text)[1]
    ImageDraw.Draw(sideways).text(
        (_TAG_INSET, strip_w - text_h - _TAG_INSET), text, font=font, fill=color)
    return sideways.transpose(Image.Transpose.ROTATE_90)
