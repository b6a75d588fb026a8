"""Input pipeline: host decode/crop assembly + fused on-device batch prep.

API parity with reference DataPipeline
(/root/reference/simple_sr/data_pipeline/data_pipeline.py:12-432): same
constructor surface, same factories (from_config / eval_pipeline /
inference_pipeline), same generator methods, same dataset semantics —
  * files listed from dirs, train/val split via sklearn with random_state
    (:147-179),
  * per-image crop fan-out: num_crops random (or diversity-checked) patches
    (:306-316),
  * augmentation fan-out: identity + each augmentation per crop (:192),
  * global shuffle, batch, then LR/HR pairing: HR→[-1,1], LR = antialiased
    bicubic downscale of HR/255 → [0,1], optional JPEG degrade of LR
    (:318-330).

TPU-native redesign (SURVEY.md §7 step 3): the reference runs decode, crop,
augment, resize and JPEG per element on CPU threads via tf.data. Here the
host only decodes PNGs once into a RAM cache and slices crop windows (pure
numpy views); everything per-pixel — augmentation, normalization, the
polyphase bicubic downscale (two MXU matmuls) and the DCT JPEG degrade — runs
as ONE jitted device function per batch with static shapes. Batches are
dispatched ahead (async) so the device never waits on the host. Host batches
travel to the device as UINT8 (1 byte/channel; normalization happens inside
the jitted prep), so PCIe/tunnel transfer carries 4× less than the
reference's float32 tf.data output. Host assembly fans out over
``num_workers`` threads with per-file deterministic crop RNG streams — the
produced batches are identical for any worker count. Differences
from the reference, on purpose:
  * the shuffle is a true global epoch shuffle of (image, crop, augmentation)
    work items, not a 4096-element window (strictly better mixing;
    shuffle_buffer_size is accepted for config compat),
  * JPEG noise no longer forces per-element pairing (the reference's
    tf workaround for rank-3-only adjust_jpeg_quality, :199-208) — the DCT
    kernel is batched,
  * multi-host pods: pass ``shard_by_process=True`` to give each host its
    1/jax.process_count() file shard (no reference counterpart — it has no
    distribution at all, SURVEY.md §2).
"""

import os
import numpy as np
import jax
import jax.numpy as jnp

from simplesr_tpu.core.ranges import normalize_01, normalize_11
from simplesr_tpu.core.prng import KeySequence
from simplesr_tpu.ops import augment as augment_ops
from simplesr_tpu.ops.resize import resize as _resize
from simplesr_tpu.ops.jpeg import jpeg_degrade

_IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp")


def read_img(fpath, normalize_func=None, yield_path=False):
    """Decode an image file to float32 [0,255] HWC (reference
    image_utils.read_img, image_utils.py:6-25)."""
    from PIL import Image

    img = np.asarray(Image.open(fpath).convert("RGB"), dtype=np.float32)
    if normalize_func is not None:
        img = np.asarray(normalize_func(img))
    if yield_path:
        return img, fpath
    return img


def _read_img_u8(fpath):
    """Decode an image file to uint8 HWC (PIL fallback for the pipeline's
    internal cache; `read_img` keeps the reference's float32 contract)."""
    from PIL import Image

    return np.asarray(Image.open(fpath).convert("RGB"), dtype=np.uint8)


def _list_images(path):
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f))
    )


def _resolve_augmentations(augmentations):
    """Accept augmentation names or (key, img)→img callables."""
    if not augmentations:
        return []
    out = []
    for aug in augmentations:
        if isinstance(aug, str):
            out.append((aug, augment_ops.AUGMENTATIONS[aug]))
        else:
            out.append((getattr(aug, "__name__", "custom"), aug))
    return out


class DataPipeline:
    """See module docstring. Constructor args mirror the reference's."""

    def __init__(self,
                 hr_img_path,
                 scale,
                 resize_filter=None,
                 antialias=True,
                 train_val_split=0.1,
                 validationset_path=None,
                 batch_size=8,
                 augmentations=None,
                 test_img_paths=None,
                 crop=True,
                 crop_size=(80, 80, 3),
                 num_crops=8,
                 crop_naive=True,
                 minimum_variation_patch=0.8,
                 minimum_variation_batch=0.05,
                 random_seed=None,
                 shuffle_buffer_size=4096,
                 jpg_noise=False,
                 jpg_noise_level=50,
                 shard_by_process=False,
                 drop_remainder=False,
                 use_native=True,
                 num_workers=None,
                 device_prefetch=4,
                 device_resident="auto",
                 device_pool_budget=1 << 30):
        self.scale = int(scale)
        self.data_path = None if hr_img_path is None else (
            hr_img_path if isinstance(hr_img_path, list) else [hr_img_path])
        self.validationset_path = None if validationset_path is None else (
            validationset_path if isinstance(validationset_path, list) else [validationset_path])
        self.test_img_paths = test_img_paths
        self.crop = crop
        self.shuffle_buffer_size = shuffle_buffer_size
        self.resize_filter = resize_filter or "bicubic"
        self.antialias = antialias
        self.batch_size = int(batch_size)
        self.crop_size = tuple(crop_size)
        self.num_crops = int(num_crops)
        self.crop_naive = crop_naive
        self.minimum_variation_patch = minimum_variation_patch
        self.minimum_variation_batch = minimum_variation_batch
        self.random_seed = random_seed
        self.augmentations = _resolve_augmentations(augmentations)
        self.jpg_noise = jpg_noise
        # scalar level L → fixed quality 100-L (reference semantics,
        # /root/reference/simple_sr/data_pipeline/data_pipeline.py:318-330);
        # a (lo, hi) pair → per-crop quality drawn uniform from
        # [100-hi, 100-lo] each batch — the standard randomized-degradation
        # recipe (trains a single model across the compression range
        # instead of overfitting one quantization table)
        if isinstance(jpg_noise_level, (tuple, list)):
            lo, hi = (int(jpg_noise_level[0]), int(jpg_noise_level[1]))
            if not (0 <= lo <= hi <= 99):
                raise ValueError(
                    f"jpg_noise_level range {jpg_noise_level} must satisfy "
                    "0 <= lo <= hi <= 99")
            self.jpg_noise_level = (lo, hi)
        else:
            self.jpg_noise_level = int(jpg_noise_level)
        if jpg_noise and any(n == "adjust_jpg_quality" for n, _ in self.augmentations):
            import logging
            logging.getLogger("simple_sr").warning(
                "augmenting hr images with jpg noise and additionally "
                "degrading lr images with jpg noise")
        self.shard_by_process = shard_by_process
        # Drop uneven final batches (tf.data drop_remainder). Required for
        # static per-device batch shapes under a data mesh; SRModel also
        # trims defensively when this is off.
        self.drop_remainder = drop_remainder
        self.train_val_split = train_val_split
        self.validationset_size = train_val_split

        # host assembly fan-out (decode+crop+stack); per-file RNG streams
        # keep the produced batches identical for ANY worker count
        self.num_workers = int(num_workers) if num_workers else \
            max(1, min(4, os.cpu_count() or 1))
        # device batches dispatched async ahead of the consumer (up to
        # device_prefetch + 1 in flight, upload + prep); 4 measured +17%
        # e2e over 2 when the transfer path is slow relative to the step
        # (dev tunnel; on PCIe the depth is irrelevant), 8 no better
        self.device_prefetch = max(1, int(device_prefetch))
        # Device-resident crop pool: decoded images upload ONCE (ever), the
        # epoch's crops are gathered on device, and each batch is one jitted
        # call fed only a tiny index array — host work and per-batch uploads
        # drop to ~zero, which matters when the host is CPU-poor or the
        # transfer path is slow (dev tunnel). "auto" enables it when the
        # epoch's crop pool + images fit device_pool_budget bytes. Batches
        # are bit-identical to the host path (same per-file RNG streams).
        self.device_resident = device_resident
        self.device_pool_budget = int(device_pool_budget)
        self._rng = np.random.default_rng(random_seed)
        # device-side randomness (augmentation choices, jpeg dither) draws
        # from one deterministic key stream rooted at random_seed
        self._keys = KeySequence(
            random_seed if random_seed is not None
            else int(np.random.default_rng().integers(2**31 - 1)))
        self._decode_cache = {}
        self._prep_cache = {}
        self._device_img_cache = {}   # path -> uint8 image resident in HBM
        self._gather_cache = {}       # (h, w, n) -> jitted crop gather
        self._pool_prep_cache = {}    # (pool, b, h, w) -> jitted pooled prep
        # Native C++ decode/crop server (threaded libpng/libjpeg + LRU cache;
        # crop-batch assembly is ~17× faster than numpy slicing). Falls back
        # to PIL when the toolchain is unavailable.
        self._native = None
        if use_native:
            from simplesr_tpu.data.native_loader import get_native_loader
            self._native = get_native_loader()

        self.train_imgs, self.val_imgs = self._split_train_val()
        if self.shard_by_process and jax.process_count() > 1:
            self.train_imgs = self.train_imgs[jax.process_index()::jax.process_count()]

        self.test_imgs = None
        if self.test_img_paths is not None and len(self.test_img_paths) > 0:
            self.test_imgs = self._collect_test_files()

    # ------------------------------------------------------------- listing

    def _split_train_val(self):
        img_files = []
        if self.data_path is not None:
            for p in self.data_path:
                img_files += _list_images(p)
        val_list = []
        if self.validationset_path is not None:
            self.validationset_size = 0
            train_list = img_files
            for vp in self.validationset_path:
                if os.path.isfile(vp):
                    val_list.append(vp)
                else:
                    val_list += _list_images(vp)
        elif self.data_path is not None and self.validationset_size > 0.0:
            import sklearn.model_selection
            train_list, val_list = sklearn.model_selection.train_test_split(
                img_files, test_size=self.validationset_size,
                random_state=self.random_seed)
        else:
            train_list = img_files
        return train_list, val_list

    def _collect_test_files(self):
        paths = self.test_img_paths
        if not isinstance(paths, list):
            paths = [paths]
        files = []
        for p in paths:
            if os.path.isfile(p):
                files.append(p)
            elif os.path.isdir(p):
                files += _list_images(p)
            else:
                raise ValueError(f"could not locate path: {p}")
        return files

    # ------------------------------------------------------------- decode

    def _decoded(self, path):
        """Decode (once) to the uint8 RAM cache — 4× less host memory and
        host→device traffic than a float32 cache; values are identical
        (PNG/JPEG decode natively to 8-bit)."""
        img = self._decode_cache.get(path)
        if img is None:
            if self._native is not None:
                try:
                    img = self._native.load_image_u8(path)
                except IOError:  # format libpng/libjpeg can't handle
                    img = _read_img_u8(path)
            else:
                img = _read_img_u8(path)
            self._decode_cache[path] = img
        return img

    def _image_hw(self, path):
        if path in self._decode_cache:
            img = self._decode_cache[path]
            return img.shape[0], img.shape[1]
        if self._native is not None:
            try:
                return self._native.image_size(path)
            except IOError:
                pass
        img = self._decoded(path)
        return img.shape[0], img.shape[1]

    def _next_key(self):
        return self._keys.next()

    # ------------------------------------------------- host crop assembly

    def _host_crops(self, path, rng):
        """num_crops HWC patches from one image — C++ crop server when
        available, else numpy window slicing (the reference's crop_naive /
        crop_divers, image_transforms.py:50-148)."""
        ph, pw = self.crop_size[0], self.crop_size[1]
        n = self.num_crops
        if self.crop_naive and self._native is not None and \
                path not in self._decode_cache:
            try:
                h, w = self._native.image_size(path)
                if h < ph or w < pw:
                    raise ValueError(
                        f"patch {ph}x{pw} larger than image {h}x{w} ({path})")
                tops = rng.integers(0, h - ph + 1, size=n).astype(np.int32)
                lefts = rng.integers(0, w - pw + 1, size=n).astype(np.int32)
                return list(self._native.load_crops([path] * n, tops, lefts,
                                                    ph, pw, dtype=np.uint8))
            except IOError:
                pass  # fall through to the PIL/numpy path
        img = self._decoded(path)
        h, w = img.shape[0], img.shape[1]
        if h < ph or w < pw:
            raise ValueError(f"patch {ph}x{pw} larger than image {h}x{w} ({path})")
        if self.crop_naive:
            tops = rng.integers(0, h - ph + 1, size=n)
            lefts = rng.integers(0, w - pw + 1, size=n)
            return [img[t:t + ph, l:l + pw] for t, l in zip(tops, lefts)]
        # diversity sampling: bounded oversample → threshold → top-up by std
        k = n * 8
        tops = rng.integers(0, h - ph + 1, size=k)
        lefts = rng.integers(0, w - pw + 1, size=k)
        cands = np.stack([img[t:t + ph, l:l + pw] for t, l in zip(tops, lefts)])
        stds = cands.reshape(k, -1).astype(np.float32).std(axis=1)
        passing = np.flatnonzero(stds > self.minimum_variation_patch)
        order = list(passing) + list(np.argsort(-stds)[~np.isin(np.argsort(-stds), passing)])
        pick = order[:n]
        means = cands.reshape(k, -1).astype(np.float32).mean(axis=1)
        if np.std(means[pick]) < self.minimum_variation_batch:
            # both-tails re-rank (see ops/crop.py diverse_crops): lowest and
            # highest passing means maximize the selection's mean spread
            rank_key = np.where(stds > self.minimum_variation_patch,
                                means, np.median(means))
            by_mean = np.argsort(rank_key)
            n_lo = n - n // 2
            pick = list(by_mean[:n_lo]) + list(by_mean[k - n // 2:])
        return [cands[i] for i in pick]

    # ------------------------------------------------- device batch prep

    def _prepare_batch_fn(self, batch_size, hr_h, hr_w):
        """Build (and cache) the jitted fused batch-prep for a static shape."""
        cache_key = (batch_size, hr_h, hr_w)
        fn = self._prep_cache.get(cache_key)
        if fn is not None:
            return fn

        aug_fns = [f for _, f in self.augmentations]
        scale = self.scale
        method = self.resize_filter
        antialias = self.antialias
        jpg_noise = self.jpg_noise
        level = self.jpg_noise_level
        quality_range = None  # (q_lo, q_hi) when randomized
        if isinstance(level, tuple):
            quality_range = (100 - level[1], 100 - level[0])
        else:
            quality = 100 - level
        lr_h, lr_w = hr_h // scale, hr_w // scale

        def _augment_one(aug_id, key, img):
            branches = [lambda k, x: x] + [
                (lambda f: (lambda k, x: f(k, x)))(f) for f in aug_fns
            ]
            return jax.lax.switch(aug_id, branches, key, img)

        def prep(hr_crops, aug_ids, key):
            # hr_crops: (B, H, W, 3) in [0, 255] — uint8 from the pipeline's
            # host cache (the cheap transfer carrier) or float32 from
            # external callers; normalized on device either way
            hr_crops = jnp.asarray(hr_crops, jnp.float32)
            keys = jax.random.split(key, hr_crops.shape[0])
            if aug_fns:
                hr = jax.vmap(_augment_one)(aug_ids, keys, hr_crops)
            else:
                hr = hr_crops
            lr = _resize(normalize_01(hr), (lr_h, lr_w), method=method,
                         antialias=antialias)
            if jpg_noise:
                if quality_range is not None:
                    # per-crop quality; folded key keeps the augmentation
                    # stream (and thus any fixed-level run) bit-identical
                    q = jax.random.uniform(
                        jax.random.fold_in(key, 0x1397),
                        (hr_crops.shape[0],),
                        minval=float(quality_range[0]),
                        maxval=float(quality_range[1]))
                    lr = jax.vmap(jpeg_degrade)(lr, q)
                else:
                    lr = jpeg_degrade(lr, quality)
            hr = normalize_11(hr)
            return jnp.asarray(lr, jnp.float32), jnp.asarray(hr, jnp.float32)

        fn = jax.jit(prep)
        self._prep_cache[cache_key] = fn
        return fn

    # --------------------------------------- device-resident crop pool

    def _pooled_mode(self, files):
        """True when this epoch should use the device-resident crop pool.
        Requires naive cropping (diversity sampling ranks on host) and the
        pool + images fitting the budget; ``device_resident=True`` forces
        it (still gated on crop mode), False disables it."""
        if not (self.crop and self.crop_naive) or not files:
            return False
        if self.device_resident is False:
            return False
        if self.device_resident is True:
            return True
        ph, pw = self.crop_size[0], self.crop_size[1]
        pool_bytes = len(files) * self.num_crops * ph * pw * 3
        img_bytes = 0
        for f in files:
            h, w = self._image_hw(f)
            img_bytes += h * w * 3
        return pool_bytes + img_bytes <= self.device_pool_budget

    def _device_image(self, path):
        """The decoded uint8 image, resident on device (uploaded once)."""
        img = self._device_img_cache.get(path)
        if img is None:
            img = jnp.asarray(self._decoded(path))
            self._device_img_cache[path] = img
        return img

    def _crop_gather_fn(self, h, w):
        """Jitted (img, tops, lefts) -> (n, ph, pw, 3) uint8 crop stack."""
        ph, pw = self.crop_size[0], self.crop_size[1]
        key = (h, w, self.num_crops)
        fn = self._gather_cache.get(key)
        if fn is None:
            def gather(img, tops, lefts):
                def one(t, l):
                    return jax.lax.dynamic_slice(img, (t, l, 0), (ph, pw, 3))
                return jax.vmap(one)(tops, lefts)
            fn = jax.jit(gather)
            self._gather_cache[key] = fn
        return fn

    def _pool_batch_fn(self, pool_len, batch_size, hr_h, hr_w):
        """Jitted (pool, idx, aug_ids, key) -> (lr, hr): on-device gather
        from the epoch's crop pool + the standard fused prep."""
        key = (pool_len, batch_size, hr_h, hr_w)
        fn = self._pool_prep_cache.get(key)
        if fn is None:
            base = self._prepare_batch_fn(batch_size, hr_h, hr_w)

            def prep(pool, idx, aug_ids, rng_key):
                return base(jnp.take(pool, idx, axis=0), aug_ids, rng_key)

            fn = jax.jit(prep)
            self._pool_prep_cache[key] = fn
        return fn

    def _iter_batches_pooled(self, chunks, file_seeds):
        """Device-resident epoch: images already in HBM, crops gathered on
        device with the SAME per-file RNG streams as the host path (so the
        produced batches are bit-identical), each batch one jitted call."""
        ph, pw = self.crop_size[0], self.crop_size[1]
        n = self.num_crops
        files_sorted = sorted(file_seeds)
        pool_parts, index_of = [], {}
        for f in files_sorted:
            h, w = self._image_hw(f)
            if h < ph or w < pw:
                raise ValueError(
                    f"patch {ph}x{pw} larger than image {h}x{w} ({f})")
            rng_f = np.random.default_rng(file_seeds[f])
            tops = rng_f.integers(0, h - ph + 1, size=n)
            lefts = rng_f.integers(0, w - pw + 1, size=n)
            part = self._crop_gather_fn(h, w)(
                self._device_image(f),
                jnp.asarray(tops, jnp.int32), jnp.asarray(lefts, jnp.int32))
            base = len(pool_parts) * n
            for c in range(n):
                index_of[(f, c)] = base + c
            pool_parts.append(part)
        pool = pool_parts[0] if len(pool_parts) == 1 \
            else jnp.concatenate(pool_parts)

        pending = []
        for chunk in chunks:
            idx = np.asarray([index_of[(f, c)] for f, c, _ in chunk],
                             np.int32)
            aug_ids = np.asarray([a for _, _, a in chunk], np.int32)
            fn = self._pool_batch_fn(int(pool.shape[0]), len(chunk), ph, pw)
            pending.append(fn(pool, jnp.asarray(idx), jnp.asarray(aug_ids),
                              self._next_key()))
            if len(pending) > self.device_prefetch:
                yield pending.pop(0)
        yield from pending

    # ------------------------------------------------------- generators

    def _work_items(self, files, rng, with_augs):
        n_augs = 1 + len(self.augmentations) if with_augs else 1
        n_crops = self.num_crops if self.crop else 1
        items = [(f, c, a) for f in files for c in range(n_crops) for a in range(n_augs)]
        return items

    def _iter_batches(self, files, shuffle, with_augs, drop_remainder=False):
        import threading

        rng = np.random.default_rng(self._rng.integers(0, 2**31 - 1))
        items = self._work_items(files, rng, with_augs)
        if shuffle:
            rng.shuffle(items)
        ph, pw = self.crop_size[0], self.crop_size[1]
        bs = self.batch_size

        # Per-file crop RNG streams, seeded in a scheduling-independent order
        # (sorted file list) so any worker count produces identical batches.
        file_seeds = {f: int(rng.integers(0, 2**31 - 1))
                      for f in sorted({f for f, _, _ in items})}

        # Pre-slice crops per (file, crop index) so the fan-out reuses them;
        # per-file locks keep concurrent workers from duplicating the slice.
        crop_bank = {}
        bank_guard = threading.Lock()
        bank_locks = {}

        def _crop_for(f, c):
            if not self.crop:
                return self._decoded(f)
            bank = crop_bank.get(f)
            if bank is None:
                with bank_guard:
                    lock = bank_locks.setdefault(f, threading.Lock())
                with lock:
                    bank = crop_bank.get(f)
                    if bank is None:
                        bank = self._host_crops(
                            f, np.random.default_rng(file_seeds[f]))
                        crop_bank[f] = bank
            return bank[c]

        def _assemble(chunk):
            """Host side of one batch: decode/crop/stack (runs on a prefetch
            worker; deterministic regardless of worker scheduling thanks to
            the per-file RNG streams)."""
            crops = [_crop_for(f, c) for f, c, _ in chunk]
            shapes = {x.shape for x in crops}
            if len(shapes) > 1:
                return ("hetero", chunk, crops)
            hr = np.stack(crops)
            aug_ids = np.asarray([a for _, _, a in chunk], np.int32)
            return ("homo", hr, aug_ids)

        chunks = [items[start:start + bs] for start in range(0, len(items), bs)]
        if drop_remainder and chunks and len(chunks[-1]) < bs:
            chunks.pop()

        if self._pooled_mode(files):
            yield from self._iter_batches_pooled(chunks, file_seeds)
            return

        # Two-level pipelining: num_workers threads assemble host batches
        # ahead (decode + crop + stack — the CPU-bound part; results are
        # consumed strictly in order), while the main thread keeps up to
        # device_prefetch + 1 prepared batches in flight on device.
        from concurrent.futures import ThreadPoolExecutor
        depth = max(2, 2 * self.num_workers)
        pending = []  # async-dispatched device batches
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = [pool.submit(_assemble, chunks[i])
                       for i in range(min(depth, len(chunks)))]
            for i, chunk in enumerate(chunks):
                kind, a, b = futures[i].result()
                futures[i] = None  # release the assembled host batch
                if i + depth < len(chunks):
                    futures.append(pool.submit(_assemble, chunks[i + depth]))
                if kind == "hetero":
                    # whole-image mode with heterogeneous sizes → per-image
                    for (f, c, aug), x in zip(a, b):
                        fn = self._prepare_batch_fn(1, x.shape[0], x.shape[1])
                        pending.append(fn(jnp.asarray(x[None]),
                                          jnp.asarray([aug], jnp.int32),
                                          self._next_key()))
                        if len(pending) > self.device_prefetch:
                            yield pending.pop(0)
                    continue
                hr, aug_ids = a, b
                fn = self._prepare_batch_fn(hr.shape[0], hr.shape[1], hr.shape[2])
                pending.append(fn(jnp.asarray(hr), jnp.asarray(aug_ids),
                                  self._next_key()))
                if len(pending) > self.device_prefetch:
                    yield pending.pop(0)
        yield from pending

    def train_batch_generator(self):
        """Yields (lr, hr) device batches for training."""
        if not self.train_imgs:
            return iter([])
        return self._iter_batches(self.train_imgs, shuffle=True, with_augs=True,
                                  drop_remainder=self.drop_remainder)

    def validation_batch_generator(self):
        """Yields (lr, hr) device batches for validation (no augmentation,
        no shuffle — reference _prepare_val_set, :211-230)."""
        if not self.val_imgs:
            return iter([])
        return self._iter_batches(self.val_imgs, shuffle=False, with_augs=False)

    def test_batch_generator(self, batch_size=8):
        """Yields (images [0,1], paths) batches; heterogeneous sizes fall back
        to per-image batches (reference test_batch_generator, :269-283)."""
        if self.test_imgs is None:
            return iter([])

        def _gen():
            batch, paths = [], []
            for f in self.test_imgs:
                img = self._decoded(f).astype(np.float32) / 255.0
                if batch and img.shape != batch[0].shape:
                    yield jnp.asarray(np.stack(batch)), list(paths)
                    batch, paths = [], []
                batch.append(img)
                paths.append(f)
                if len(batch) == batch_size:
                    yield jnp.asarray(np.stack(batch)), list(paths)
                    batch, paths = [], []
            if batch:
                yield jnp.asarray(np.stack(batch)), list(paths)

        return _gen()

    # ------------------------------------------------------------ debugging

    def _dump_train_dataset(self, save_dir, n_epochs=1):
        """Render every training batch as an LR/HR grid (reference
        data_pipeline.py:285-291) — pipeline debugging aid."""
        from simplesr_tpu.eval import rendering
        for epoch in range(n_epochs):
            for idx, (lr_batch, hr_batch) in enumerate(self.train_batch_generator()):
                rendering.prepare_image_grid(
                    save_dir, f"epoch{epoch}_{idx}_train", low_res_key="LR",
                    LR=lr_batch, HR=hr_batch)

    def _dump_validation_dataset(self, save_dir, n_epochs=1):
        from simplesr_tpu.eval import rendering
        for epoch in range(n_epochs):
            for idx, (lr_batch, hr_batch) in enumerate(self.validation_batch_generator()):
                rendering.prepare_image_grid(
                    save_dir, f"epoch{epoch}_{idx}_val", low_res_key="LR",
                    LR=lr_batch, HR=hr_batch)

    # ------------------------------------------------------------ factories

    def __str__(self):
        augs = [name for name, _ in self.augmentations] or None
        return (f"DataPipeline:\n"
                f"data path: {self.data_path}\n"
                f"validation data path: {self.validationset_path}\n"
                f"test images: {self.test_img_paths}\n"
                f"resize filter: {self.resize_filter}\n"
                f"antialias: {self.antialias}\n"
                f"validation set size: {self.validationset_size}\n"
                f"batch size: {self.batch_size}\n"
                f"augmentations: {augs}\n"
                f"jpg noise: {self.jpg_noise} (level {self.jpg_noise_level})\n"
                f"crop: {self.crop} size {self.crop_size} x{self.num_crops} "
                f"naive={self.crop_naive}\n")

    @staticmethod
    def from_config(config):
        """Training pipeline from a ConfigUtil (reference :364-388)."""
        return DataPipeline(
            hr_img_path=config.train_data_paths,
            scale=config.scale, resize_filter=config.resize_filter,
            antialias=config.antialias,
            train_val_split=config.train_val_split,
            validationset_path=config.validation_data_path,
            batch_size=config.batch_size,
            augmentations=config.augmentations, jpg_noise=config.jpg_noise,
            jpg_noise_level=config.jpg_noise_level,
            test_img_paths=config.test_data_paths,
            crop=config.crop_imgs, crop_size=config.crop_size,
            random_seed=config.random_seed,
            num_crops=config.num_crops, crop_naive=config.crop_naive,
            shuffle_buffer_size=config.shuffle_buffer_size,
            minimum_variation_patch=config.minimum_variation_patch,
            minimum_variation_batch=config.minimum_variation_batch,
            # data-parallel runs need mesh-divisible batches
            drop_remainder=getattr(config, "data_parallel", False),
            num_workers=getattr(config, "num_workers", None),
            device_resident=getattr(config, "device_resident", "auto"),
        )

    @staticmethod
    def eval_pipeline(config):
        """Evaluation pipeline: (downscaled, ground-truth) pairs through the
        validation generator (reference :390-413)."""
        return DataPipeline(
            hr_img_path=None, scale=config.scale,
            validationset_path=config.test_data_paths,
            batch_size=config.batch_size, resize_filter=config.resize_filter,
            antialias=config.antialias,
            crop=config.crop_imgs, crop_size=config.crop_size,
            random_seed=config.random_seed,
            num_crops=config.num_crops, crop_naive=config.crop_naive,
            minimum_variation_patch=config.minimum_variation_patch,
            minimum_variation_batch=config.minimum_variation_batch,
        )

    @staticmethod
    def inference_pipeline(config):
        """Inference pipeline: (image, path) through the test generator
        (reference :415-432)."""
        return DataPipeline(
            hr_img_path=None, test_img_paths=config.test_data_paths,
            antialias=config.antialias, scale=config.scale,
        )
