"""Host-side PIL rendering: single images, SR|interpolated half-splits, and
annotated comparison grids.

API parity with reference image_utils.py:187-531 (save_single, combine_halfs,
prepare_image_grid): rows per model, columns per sample, green model labels
bottom-left, red PSNR bottom-right / SSIM above it (∞ rendered for inf, N/A
for -1), LR images padded+centered via ``low_res_key``, optional original
image pasted alongside, rotated column labels when no original is given.
Per-image min/max auto-scaling matches Keras array_to_img (tensor_to_img,
image_utils.py:28) so [-1,1], [0,1] and [0,255] tensors all render. Font:
DejaVuSansMono-Bold (system) with PIL default fallback.
"""

import os

import numpy as np
from PIL import Image, ImageDraw, ImageFont

__all__ = ["tensor_to_img", "save_single", "combine_halfs", "prepare_image_grid"]

_FONT_CANDIDATES = (
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
)


def _load_font(font_size=10):
    for path in _FONT_CANDIDATES:
        try:
            return ImageFont.truetype(path, size=font_size)
        except OSError:
            continue
    return ImageFont.load_default()


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


def _annotate_img(img, text, color, loc=None):
    draw = ImageDraw.Draw(img)
    font = _load_font(font_size=int(max(6, 16 - (1024 // max(img.width, 1)))))
    width, height = _text_size(font, text)
    if loc is None:
        loc = (5, img.size[1] - (5 + height))
    elif loc == "right":
        loc = (img.width - (width + 5), img.height - (5 + height))
    elif loc == "ssim":
        loc = (img.width - (width + 5), img.height - 2 * (5 + height))
    draw.rectangle((*loc, loc[0] + width, loc[1] + height), fill="black")
    draw.text(loc, text, font=font, fill=color)


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
            _annotate_img(img, label, (0, 255, 0))
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
        _annotate_img(l_img, left_label, (0, 255, 0))
        r_img = tensor_to_img(r).resize(l_img.size)
        _annotate_img(r_img, right_label, (255, 0, 0), loc="right")

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
    column_label_width = 0 if original is not None else int(num_cols * max_w * 0.05)
    grid_w = num_cols * max_w + column_label_width
    grid_h = num_rows * max_h
    grid_img = Image.new("RGB", (grid_w, grid_h), (255, 255, 255))

    y = 0
    for label, x in tensors.items():
        if label == low_res_key:
            x = _pad_image_batch(x, max_h, max_w)
        row_psnr = psnr.get(label) if psnr else None
        row_ssim = ssim.get(label) if ssim else None
        if original is None and column_label_width > 0:
            _annotate_column(grid_img, label, (0, 255, 0), column_label_width,
                             max_h, ypos=y)
            inline_label = None
        else:
            inline_label = label
        for idx in range(x.shape[0]):
            img = tensor_to_img(x[idx])
            if inline_label is not None:
                _annotate_img(img, inline_label, (0, 255, 0))
            if row_psnr is not None:
                _annotate_img(img, f"psnr: {_metric_string(row_psnr, idx)}",
                              (255, 0, 0), loc="right")
            if row_ssim is not None:
                _annotate_img(img, f"ssim: {_metric_string(row_ssim, idx)}",
                              (255, 0, 0), loc="ssim")
            grid_img.paste(img, (column_label_width + max_w * idx, y))
        y += max_h

    if original is not None:
        origin = Image.open(original) if isinstance(original, (str, os.PathLike)) else original
        if not isinstance(origin, Image.Image):
            origin = tensor_to_img(origin)
        aspect = origin.width / origin.height
        oh = grid_img.height
        ow = max(1, int(aspect * oh))
        origin = origin.resize((ow, oh))
        _annotate_img(origin, "original", (255, 0, 255))
        combined = Image.new("RGB", (grid_w + ow, grid_h), (255, 255, 255))
        combined.paste(origin, (0, 0))
        combined.paste(grid_img, (ow, 0))
        grid_img = combined

    os.makedirs(save_dir, exist_ok=True)
    out_path = os.path.join(save_dir, f"{fname}.png")
    grid_img.save(out_path)
    return out_path


def _annotate_column(img, text, color, width, height, ypos, xpos=0):
    tmp = Image.new("RGB", (height, width), (0, 0, 0))
    draw = ImageDraw.Draw(tmp)
    font = _load_font(font_size=int(max(6, 16 - (1024 // max(img.width, 1)))))
    _, font_h = _text_size(font, text)
    draw.text((5, width - (5 + font_h)), text, font=font, fill=color)
    img.paste(tmp.rotate(90, expand=1), (xpos, ypos))
