"""Training data pipeline: load_image_gt + static-shape batch assembly +
threaded device prefetch.

Re-design of the reference generator (reference: mrcnn/model.py:1273-1904):

* :func:`load_image_gt` — load + resize + augment + (mini)mask + meta
  (reference: mrcnn/model.py:1277-1377);
* :class:`TrainingPipeline` — infinite shuffled iterator with RPN target
  building, GT subsampling to MAX_GT_INSTANCES, skip-on-error budget of 5
  (reference: mrcnn/model.py:1896-1904), a worker thread pool replacing
  ``fit_generator``'s multiprocessing, and a double-buffered
  ``jax.device_put`` prefetch queue.

All outputs are statically shaped (GT padded to MAX_GT_INSTANCES, RPN
targets anchor-aligned), matching the device-side pad+mask convention.
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from .. import logger
from ..config import Config
from ..models.meta import compose_image_meta
from ..models.targets import build_rpn_targets
from ..utils import boxes as B
from ..utils import image as I
from ..utils.anchors import generate_pyramid_anchors
from .augment import augment_image_and_mask
from .dataset import Dataset


def load_resized(
    dataset: Dataset, config: Config, image_id: int
) -> Tuple[np.ndarray, tuple, tuple, float, np.ndarray, np.ndarray]:
    """Deterministic load + resize stage of :func:`load_image_gt`.

    Split out so :class:`TrainingPipeline` can cache its output across
    epochs (FITS decode + zscale + resize dominate per-sample host cost).
    NOT deterministic under ``image_resize_mode == 'crop'`` (random crop) —
    callers must not cache in that mode.

    Returns (image, original_shape, window, scale, mask, class_ids).
    """
    image = dataset.load_image(image_id)
    mask, class_ids = dataset.load_mask(image_id)
    original_shape = image.shape
    image, window, scale, padding, crop = I.resize_image(
        image,
        min_dim=config.image_min_dim,
        min_scale=config.image_min_scale,
        max_dim=config.image_max_dim,
        mode=config.image_resize_mode,
    )
    mask = I.resize_mask(mask, scale, padding, crop)
    return image, original_shape, window, scale, mask, class_ids


def load_image_gt(
    dataset: Dataset,
    config: Config,
    image_id: int,
    augmentation: bool = False,
    use_mini_mask: bool = False,
    rng: Optional[np.random.RandomState] = None,
    _loaded=None,
):
    """Load one image + GT (reference: mrcnn/model.py:1277-1377).

    Returns (image, image_meta, class_ids, bbox, mask) — all unpadded.
    ``_loaded`` optionally supplies a precomputed :func:`load_resized`
    result (the pipeline's cross-epoch cache).
    """
    rng = rng or np.random.RandomState()
    image, original_shape, window, scale, mask, class_ids = (
        _loaded if _loaded is not None else load_resized(dataset, config, image_id)
    )

    if augmentation:
        image, mask = augment_image_and_mask(image, mask, rng)

    # Drop instances whose mask vanished (reference: mrcnn/model.py:1352-1356).
    # Chained any() reduces the outermost axis each time (vectorized OR of
    # contiguous rows); the axis-tuple form keeping the innermost N axis is
    # a strided accumulation ~20x slower (measured 2.4 ms vs 0.1 at
    # 256^2 x 12 bool).
    idx = mask.any(axis=0).any(axis=0)
    mask = mask[:, :, idx]
    class_ids = class_ids[idx]
    bbox = B.extract_bboxes(mask)

    active_class_ids = np.zeros([dataset.num_classes], dtype=np.int32)
    source_class_ids = dataset.source_class_ids[dataset.image_info[image_id]["source"]]
    active_class_ids[source_class_ids] = 1

    if use_mini_mask and len(class_ids):
        mask = I.minimize_mask(bbox, mask, config.mini_mask_shape)

    image_meta = compose_image_meta(
        image_id, original_shape, image.shape, window, scale, active_class_ids
    )
    return image, image_meta, class_ids, bbox, mask


class TrainingPipeline:
    """Infinite batched sample stream with static shapes."""

    def __init__(
        self,
        dataset: Dataset,
        config: Config,
        shuffle: bool = True,
        augmentation: bool = False,
        seed: Optional[int] = None,
        num_workers: int = 0,
        max_queue: int = 16,
        cache_bytes: int = 0,
    ):
        self.dataset = dataset
        self.config = config
        self.shuffle = shuffle
        self.augmentation = augmentation
        self.rng = np.random.RandomState(seed)
        self.num_workers = num_workers
        self.max_queue = max_queue
        # Cross-epoch cache of the deterministic load+resize stage (FITS
        # decode + zscale + resize dominate host cost on 1-CPU dev hosts;
        # every epoch re-reads ~12 FITS files per image otherwise). Stores
        # one uint8 plane for replicated-channel images and bit-packed bool
        # masks (~150 KB/image at 256^2); LRU-evicted to ``cache_bytes``.
        # Disabled under the random-crop resize mode (non-deterministic).
        self._cache_budget = (
            int(cache_bytes) if config.image_resize_mode != "crop" else 0
        )
        self._cache: "OrderedDict[int, Tuple[tuple, int]]" = OrderedDict()
        self._cache_used = 0
        self._cache_lock = threading.Lock()
        shapes = config.backbone_shapes
        self.anchors = generate_pyramid_anchors(
            config.rpn_anchor_scales,
            config.rpn_anchor_ratios,
            shapes,
            config.backbone_strides,
            config.rpn_anchor_stride,
        )
        self.mask_hw = (
            tuple(config.mini_mask_shape)
            if config.use_mini_mask
            else tuple(config.image_shape[:2])
        )
        # Mono image wire: ship one channel when every image's channels are
        # replicas BY CONSTRUCTION — gray->RGB conversion with equal
        # per-channel zscale contrasts and no bias-contrast stretch
        # produces three identical channels (utils/fits.py::read_fits), the
        # standard radio chain (reference: mrcnn/utils.py:1190-1208).
        # Decided once per pipeline from the dataset's preprocessing flags
        # so wire shapes are static; mold_batch broadcasts back on device.
        # (datasets that don't declare the flags — e.g. custom loaders with
        # genuine RGB content — keep the full-channel wire)
        contrasts = list(getattr(dataset, "zscale_contrasts", [0.25]))
        self._mono_wire = bool(
            config.train_wire == "compact"
            and config.image_shape[2] > 1
            and getattr(dataset, "convert_to_rgb", False)
            and not getattr(dataset, "apply_biascontrast", False)
            and len(set(contrasts)) <= 1
        )

    def anchors_normalized(self) -> np.ndarray:
        """Pyramid anchors in normalized coordinates for the device graph."""
        h, w = self.config.image_shape[:2]
        return B.norm_boxes(self.anchors, (h, w))

    # -------------------------------------------------------------- cache
    @staticmethod
    def _cache_pack(loaded) -> Optional[Tuple[tuple, int]]:
        """Compact a load_resized result; None if not compactly cacheable."""
        image, original_shape, window, scale, mask, class_ids = loaded
        if mask.dtype != bool:
            return None  # only bit-packable binary masks are cached
        mono = (
            image.ndim == 3
            and image.shape[2] > 1
            and np.array_equal(image[..., 0], image[..., 1])
            and np.array_equal(image[..., 0], image[..., -1])
        )
        img_store = np.ascontiguousarray(image[..., :1]) if mono else image
        mbits = np.packbits(mask, axis=None)
        # Cache hits hand these arrays out by reference (only the mono
        # path re-materializes); freeze them so an accidental in-place
        # consumer fails loudly instead of corrupting the cross-epoch cache.
        for arr in (img_store, mbits, class_ids):
            arr.flags.writeable = False
        entry = (
            img_store, image.shape, original_shape, window, scale,
            mbits, mask.shape, class_ids,
        )
        nbytes = img_store.nbytes + mbits.nbytes + class_ids.nbytes + 256
        return entry, nbytes

    @staticmethod
    def _cache_unpack(entry: tuple):
        img_store, img_shape, original_shape, window, scale, mbits, mshape, cls = entry
        image = img_store
        if img_store.shape != img_shape:  # replicated-channel image
            image = np.repeat(img_store, img_shape[2], axis=2)
        count = int(np.prod(mshape))
        mask = np.unpackbits(mbits, count=count).reshape(mshape).view(bool)
        return image, original_shape, window, scale, mask, cls

    def _load_resized(self, image_id: int):
        """load_resized through the cross-epoch LRU cache (thread-safe)."""
        if self._cache_budget <= 0:
            return load_resized(self.dataset, self.config, image_id)
        with self._cache_lock:
            hit = self._cache.get(image_id)
            if hit is not None:
                self._cache.move_to_end(image_id)
        if hit is not None:
            return self._cache_unpack(hit[0])
        loaded = load_resized(self.dataset, self.config, image_id)
        packed = self._cache_pack(loaded)
        if packed is not None:
            with self._cache_lock:
                if image_id not in self._cache:
                    self._cache[image_id] = packed
                    self._cache_used += packed[1]
                    while self._cache_used > self._cache_budget and len(self._cache) > 1:
                        _, (_, old_bytes) = self._cache.popitem(last=False)
                        self._cache_used -= old_bytes
        return loaded

    # ------------------------------------------------------------- sample
    def make_sample(
        self, image_id: int, rng: Optional[np.random.RandomState] = None
    ) -> Dict[str, np.ndarray]:
        cfg = self.config
        rng = rng if rng is not None else self.rng
        image, meta, class_ids, bbox, mask = load_image_gt(
            self.dataset,
            cfg,
            image_id,
            augmentation=self.augmentation,
            use_mini_mask=cfg.use_mini_mask,
            rng=rng,
            _loaded=self._load_resized(image_id),
        )
        rpn_match, rpn_deltas = build_rpn_targets(
            self.anchors, class_ids, bbox, cfg, rng
        )

        # Subsample GT to the budget (reference: mrcnn/model.py:1831-1837)
        g = cfg.max_gt_instances
        if class_ids.shape[0] > g:
            ids = rng.choice(np.arange(class_ids.shape[0]), g, replace=False)
            class_ids = class_ids[ids]
            bbox = bbox[ids]
            mask = mask[:, :, ids]

        # Pad to static shapes; boxes normalized for the device graph
        h, w = cfg.image_shape[:2]
        gt_ids = np.zeros((g,), np.int32)
        gt_boxes = np.zeros((g, 4), np.float32)
        mh, mw = self.mask_hw
        gt_masks = np.zeros((mh, mw, g), np.uint8)
        n = class_ids.shape[0]
        if n:
            gt_ids[:n] = class_ids
            gt_boxes[:n] = B.norm_boxes(bbox.astype(np.float32), (h, w))
            gt_masks[:, :, :n] = mask.astype(np.uint8)

        # Thin wire format: images keep their source dtype (uint8 for the
        # standard zscale+uint8 chain), masks are uint8, rpn_match int8 —
        # ~3x fewer host->device bytes per batch. The train/eval steps mold
        # (cast + mean subtraction) on device (trainer.mold_batch).
        if cfg.train_wire == "compact":
            # Compact wire (see config.train_wire): the dense [A] match and
            # [A, 4] f32 deltas are ~99% zeros by construction (<=
            # rpn_train_anchors_per_image non-neutral anchors); ship index
            # lists + per-positive deltas and scatter on device. Masks ride
            # bit-packed; replicated-channel images ride one channel.
            a = rpn_match.shape[0]
            budget = cfg.rpn_train_anchors_per_image
            pos = np.flatnonzero(rpn_match == 1)
            neg = np.flatnonzero(rpn_match == -1)
            pos_idx = np.full((budget // 2,), a, np.int32)  # pad=A, dropped
            pos_idx[: len(pos)] = pos
            neg_idx = np.full((budget,), a, np.int32)
            neg_idx[: len(neg)] = neg
            pos_deltas = np.zeros((budget // 2, 4), np.float32)
            pos_deltas[: len(pos)] = rpn_deltas[pos]
            img_wire = image
            if self._mono_wire and image.ndim == 3 and image.shape[2] > 1:
                img_wire = np.ascontiguousarray(image[..., :1])
            sample = {
                "images": img_wire,
                "image_meta": meta.astype(np.float32),
                "rpn_pos_idx": pos_idx,
                "rpn_neg_idx": neg_idx,
                "rpn_pos_deltas": pos_deltas,
                "gt_class_ids": gt_ids,
                "gt_boxes": gt_boxes,
                "gt_masks_packed": np.packbits(gt_masks, axis=None),
            }
        else:
            sample = {
                "images": image,
                "image_meta": meta.astype(np.float32),
                "rpn_match": rpn_match.astype(np.int8),
                "rpn_deltas": rpn_deltas.astype(np.float32),
                "gt_class_ids": gt_ids,
                "gt_boxes": gt_boxes,
                "gt_masks": gt_masks,
            }
        if not cfg.use_rpn_rois:
            # Head-only training with externally generated ROIs
            # (reference: mrcnn/model.py:1846-1856 random_rois path fed by
            # USE_RPN_ROIS=False, model.py:2446).
            from ..models.debug_rois import generate_random_rois

            rois_px = generate_random_rois(
                (h, w), cfg.post_nms_rois_training, bbox, rng
            )
            sample["rois"] = B.norm_boxes(rois_px.astype(np.float32), (h, w))
        return sample

    # -------------------------------------------------------------- batches
    def _id_stream(self) -> Iterator[int]:
        ids = np.copy(self.dataset.image_ids)
        while True:
            if self.shuffle:
                self.rng.shuffle(ids)
            yield from ids

    def batches(self, batch_size: Optional[int] = None) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite batch iterator with a skip-on-error budget of 5
        (reference: mrcnn/model.py:1896-1904)."""
        bs = batch_size or self.config.batch_size
        stream = self._id_stream()
        error_count = 0
        while True:
            batch = []
            while len(batch) < bs:
                image_id = next(stream)
                try:
                    batch.append(self.make_sample(image_id))
                    error_count = 0
                except Exception as e:  # noqa: BLE001
                    logger.exception(
                        "Error processing image %s", self.dataset.image_reference(image_id)
                    )
                    error_count += 1
                    if error_count > 5:
                        raise
            yield {k: np.stack([s[k] for s in batch]) for k in batch[0]}

    def prefetch(
        self, batch_size: Optional[int] = None, device_put: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Background prefetch (replaces fit_generator's worker pool,
        reference: mrcnn/model.py:2487-2498) with optional eager
        host->device transfer for compute/transfer overlap.

        With ``num_workers > 1``, that many threads build samples in
        parallel (FITS IO, the native zscale kernel and numpy release the
        GIL) and an assembler thread packs them into batches; sample order
        within the shuffled stream is then nondeterministic.
        """
        import jax

        bs = batch_size or self.config.batch_size
        q: "queue.Queue" = queue.Queue(maxsize=self.max_queue)
        stop = threading.Event()

        def put_batches(batch_iter):
            try:
                for batch in batch_iter:
                    if stop.is_set():
                        return
                    if device_put:
                        batch = jax.device_put(batch)
                    q.put(batch)
            except Exception as e:  # noqa: BLE001
                q.put(e)

        if self.num_workers <= 1:
            threading.Thread(
                target=put_batches, args=(self.batches(bs),), daemon=True
            ).start()
        else:
            id_q: "queue.Queue" = queue.Queue(maxsize=4 * bs)
            sample_q: "queue.Queue" = queue.Queue(maxsize=4 * bs)
            id_lock = threading.Lock()
            stream = self._id_stream()

            def id_feeder():
                while not stop.is_set():
                    with id_lock:
                        image_id = next(stream)
                    id_q.put(image_id)

            def sample_worker(worker_idx: int):
                # per-worker RNG: RandomState is not thread-safe
                rng = np.random.RandomState(
                    (self.rng.randint(2 ** 31) + worker_idx) % (2 ** 31)
                )
                error_count = 0
                while not stop.is_set():
                    image_id = id_q.get()
                    try:
                        sample_q.put(self.make_sample(image_id, rng=rng))
                        error_count = 0
                    except Exception as e:  # noqa: BLE001
                        logger.exception(
                            "Error processing image %s",
                            self.dataset.image_reference(image_id),
                        )
                        error_count += 1
                        if error_count > 5:
                            sample_q.put(e)
                            return

            def assembled():
                while True:
                    samples = []
                    while len(samples) < bs:
                        item = sample_q.get()
                        if isinstance(item, Exception):
                            raise item
                        samples.append(item)
                    yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}

            threading.Thread(target=id_feeder, daemon=True).start()
            for wi in range(self.num_workers):
                threading.Thread(target=sample_worker, args=(wi,), daemon=True).start()
            threading.Thread(target=put_batches, args=(assembled(),), daemon=True).start()

        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
