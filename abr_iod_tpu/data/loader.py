"""Host data loader: fixed-shape batches with background prefetch.

Replaces the reference's torch DataLoader + BatchCollator + samplers
(data/build.py:109-169, data/collate_batch.py, data/samplers/*):
  * iteration-based training — an infinite epoch-shuffled stream
    (IterationBasedBatchSampler equivalent)
  * per-process sharding by jax.process_index (DistributedSampler
    equivalent), applied WITHIN orientation-grouped global batches so
    every process steps the same compiled program each iteration
  * instead of aspect-ratio grouping + ragged padding
    (grouped_batch_sampler.py:9-113), every image lands on one of TWO
    static canvases — the configured one and its transpose — chosen by
    image orientation, so portrait images keep the full shortest-side
    resolution (see transforms.py); jit re-traces per shape, giving one
    cached executable per orientation
  * a background thread keeps one batch ahead (the C++ data plane in
    csrc/ is plugged in here when built)
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..engine.train import Batch
from ..structures.boxes import pad_boxes
from . import transforms as T


def _available_ram_mb() -> Optional[float]:
    """Host MemAvailable in MB (None when /proc/meminfo is unreadable)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return None


def clamp_cache_budget_mb(budget_mb: float, frac: float = 0.5) -> float:
    """Clamp a host-RSS cache budget to ``frac`` of currently-available
    RAM.  TPU.CANVAS_CACHE_MB defaults generously (VOC trainval at full
    canvas is ~17 GB) — on smaller hosts an unclamped LRU would grow the
    process until the OOM killer takes it, where the reference merely
    streams.  The clamp keeps the big budget on big hosts and degrades to
    partial caching (LRU keeps the hottest canvases) elsewhere."""
    avail = _available_ram_mb()
    if avail is None:
        return budget_mb
    cap = avail * frac
    if budget_mb > cap:
        import logging

        logging.getLogger("abr_iod_tpu").info(
            "canvas cache budget clamped %.0f MB -> %.0f MB "
            "(50%% of available host RAM)", budget_mb, cap)
        return cap
    return budget_mb


def prefetch_iter(it, depth: int = 2, on_drop=None):
    """Background-thread prefetch over any iterator.

    Contract shared by every consumer (train loops, eval loop):
      * worker exceptions re-raise in the consumer — a dead producer must
        fail the run, not end it silently as if the stream completed;
      * closing the generator early (break / .close()) signals the worker
        to stop and drains the queue, so no thread is left blocked on
        q.put holding batch buffers alive;
      * ``on_drop(item)`` fires for every produced item that is discarded
        instead of yielded (queue drain on early close, and the item the
        worker was mid-put on) — lets producers with side effects per
        item (the device canvas bank's promise pins) undo them.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    error: list = []

    def worker():
        try:
            for item in it:
                delivered = False
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        delivered = True
                        break
                    except queue.Full:
                        continue
                if not delivered:
                    if on_drop is not None:
                        on_drop(item)  # abandoned mid-put
                    return
                if stop.is_set():
                    return  # delivered — the drain below handles it
        except BaseException as e:  # noqa: BLE001 — propagated below
            error.append(e)
        finally:
            while not stop.is_set():  # deliver sentinel unless consumer left
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # unblock a worker mid-put and drop its buffers
            try:
                item = q.get_nowait()
            except queue.Empty:
                break
            if on_drop is not None and item is not sentinel:
                on_drop(item)


class DetectionLoader:
    def __init__(
        self,
        source,
        cfg,
        batch_size: int,
        is_train: bool,
        max_gt: Optional[int] = None,
        canvas=None,
        seed: int = 0,
        normalize=True,  # True: host f32 normalize | "device": uint8
        #   canvas, caller normalizes on device (make_device_normalize)
        #   | False: raw uint8 0-255 RGB for the on-device ABR fusion
        num_shards: int = 1,
        shard_index: int = 0,
        start_iter: int = 0,
        flip: Optional[bool] = None,
        pixel_bank=None,
    ):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.is_train = is_train
        if is_train and len(source) == 0:
            # _indices() cycles epochs forever for train streams, so an
            # empty source would spin without ever yielding — surface the
            # misconfiguration (wrong class lists / dataset name) loudly
            # instead (the reference's RandomSampler raises the same way).
            raise ValueError(
                "empty training dataset "
                f"({type(source).__name__}, root={getattr(source, 'root', '?')}): "
                "no images match the configured class lists — check "
                "DATASETS.TRAIN and MODEL.ROI_BOX_HEAD.NAME_*_CLASSES"
            )
        self.max_gt = max_gt or int(cfg.TPU.MAX_GT)
        self.canvas = tuple(canvas or (cfg.TPU.CANVAS_TRAIN if is_train else cfg.TPU.CANVAS_TEST))
        self.dual_orientation = bool(cfg.TPU.get("DUAL_ORIENTATION", True))
        # MIN_SIZE_TRAIN is a tuple: multi-scale training picks one entry
        # per image (reference transforms.py:75 random.choice); single-
        # scale recipes draw nothing so their rng streams are unchanged
        ms = cfg.INPUT.MIN_SIZE_TRAIN if is_train else (cfg.INPUT.MIN_SIZE_TEST,)
        if not isinstance(ms, (list, tuple)):
            ms = (ms,)
        self.min_sizes = tuple(int(m) for m in ms)
        self.min_size = self.min_sizes[0]
        self.max_size = int(cfg.INPUT.MAX_SIZE_TRAIN if is_train else cfg.INPUT.MAX_SIZE_TEST)
        self.flip_prob = (
            float(cfg.INPUT.FLIP_PROB_TRAIN) if (flip if flip is not None else is_train) else 0.0
        )
        self.seed = seed
        self.normalize = normalize
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.start_iter = start_iter
        # instance-seg training: emit box-normalized per-GT mask crops
        self.mask_crop_size = (
            int(cfg.TPU.get("MASK_CROP_SIZE", 28)) if bool(cfg.MODEL.MASK_ON) else 0
        )
        # keypoint training: emit padded [MAX_GT, K, 3] canvas-coordinate
        # targets (reference keypoint.py Keypoints ride the BoxList through
        # resize/transpose; here the loader applies the same transforms)
        self.num_keypoints = (
            int(cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES)
            if (bool(cfg.MODEL.KEYPOINT_ON) and is_train) else 0
        )
        # DATALOADER.NUM_WORKERS (the reference's torch-DataLoader worker
        # count, defaults.py:83) maps to a thread pool over per-image prep:
        # PIL decode/resize release the GIL, and item RNGs are keyed by
        # (seed, iter, global position), so worker count never changes the
        # produced batches — only how fast the host keeps the device fed.
        self.num_workers = max(1, int(cfg.DATALOADER.NUM_WORKERS))
        # fail-loud label-range gate: a data source whose contiguous labels
        # exceed the configured head silently poisons training — OOB
        # fill-mode gathers in the box losses yield NaN values with ZERO
        # gradients, so the run "trains" while cls/reg learn nothing
        # (observed with a category-subset COCO json under the alphabetical
        # remap).  One cheap max() per record catches it at the source.
        self.num_classes = int(cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES)
        self._pool = None
        self._portrait_cache: dict = {}
        # resized-canvas LRU: (index, min_size, canvas) → (uint8 canvas,
        # size_hw, scaled boxes).  The resize chain is deterministic and
        # uint8-exact whenever color jitter is off (clip(f32,0,255)→uint8
        # is the identity on byte input and draws nothing from the item
        # rng), so cache hits are bit-identical to recomputation; flip /
        # normalization / fusion all run downstream of the cache.
        jitter_on = is_train and any(
            float(cfg.INPUT.get(k, 0.0)) > 0
            for k in ("BRIGHTNESS", "CONTRAST", "SATURATION", "HUE")
        )
        budget_mb = clamp_cache_budget_mb(
            float(cfg.TPU.get("CANVAS_CACHE_MB", 20480)))
        # the cache only pays on streams that revisit images: train epochs
        # always do; a single eval pass visits each image once, so eval
        # streams skip it UNLESS a device pixel bank is attached (bank keys
        # mirror host-cache keys) — the multi-eval drivers (tools/
        # eval_steps.py, chain workflows) re-run the SAME test canvases
        # once per incremental step and share one bank across calls
        self._cache_budget = (
            0 if (jitter_on or (not is_train and pixel_bank is None))
            else int(budget_mb * 2 ** 20))
        self._cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._cache_bytes = 0
        self._cache_lock = threading.Lock()
        # device-resident canvas bank (data/device_cache.DeviceCanvasBank):
        # when set, _load_one skips producing pixel bytes for banked keys
        # and batches()/raw_batches() yield (item, keys, canvases) triples
        # for device-side assembly.  Requires the host cache path (jitter
        # off, train) since bank keys mirror host-cache keys, and uint8
        # canvases (normalize=True ships host-normalized f32 — unbankable).
        self.pixel_bank = (
            pixel_bank
            if self._cache_budget > 0 and normalize is not True else None)
        # (index, min_size, canvas) → (size_hw, boxes): tiny, unbounded —
        # survives canvas-LRU eviction so bank hits never need the pixels.
        # Shared through the bank when one is attached, so a FRESH loader
        # over the same source (multi-eval drivers) serves bank hits
        # without re-decoding images for their metadata.
        self._meta_cache: dict = (
            self.pixel_bank.meta if self.pixel_bank is not None else {})

    def __len__(self):
        return len(self.source)

    # ---------------------------------------------------------- orientation
    def _is_portrait(self, index: int) -> bool:
        if not self.dual_orientation or self.canvas[0] == self.canvas[1]:
            return False
        p = self._portrait_cache.get(index)
        if p is None:
            rec = self.source.annotation(index)
            p = rec["height"] > rec["width"]
            self._portrait_cache[index] = p
        return p

    def canvas_for(self, index: int) -> Tuple[int, int]:
        """The static canvas this image lands on: the configured canvas, or
        its transpose when the image's orientation is the opposite (keeps a
        500(w)x750(h) portrait image at shortest-side 800 instead of capping
        it to fit the landscape canvas)."""
        ch, cw = self.canvas
        if self._is_portrait(index) != (ch > cw):
            return (cw, ch)
        return (ch, cw)

    # ---------------------------------------------------------- index stream
    def _indices(self) -> Iterator[int]:
        """The GLOBAL epoch-shuffled index stream (identical on every
        process — sharding happens per grouped batch in _index_batches)."""
        n = len(self.source)
        epoch = 0
        while True:
            order = np.arange(n)
            if self.is_train:
                np.random.RandomState(self.seed + epoch).shuffle(order)
            yield from order
            epoch += 1
            if not self.is_train:
                return

    def _index_batches(self) -> Iterator[List[int]]:
        """Yield this shard's slice of orientation-grouped GLOBAL batches.

        Grouping happens on the global stream before sharding so all
        processes agree on each iteration's canvas shape — under SPMD every
        process must execute the same compiled program (the reference's
        DistributedSampler + GroupedBatchSampler compose the other way
        around because DDP ranks run independent programs).

        Resume skips the first start_iter grouped batches (reference
        IterationBasedBatchSampler skips to start_iter).
        """
        gbs = self.batch_size * self.num_shards
        skip = self.start_iter if self.is_train else 0
        buckets: dict = {}
        for idx in self._indices():
            key = self._is_portrait(idx)
            buckets.setdefault(key, []).append(idx)
            if len(buckets[key]) == gbs:
                batch = buckets.pop(key)
                if skip > 0:
                    skip -= 1
                    continue
                yield self._shard_slice(batch)
        # finite (eval) stream: flush remainders, padded to the global batch
        # size by repeating the last index so every shard sees an equal count
        for batch in buckets.values():
            if not batch:
                continue
            self._last_flush_real = len(batch)
            while len(batch) < gbs:
                batch.append(batch[-1])
            yield self._shard_slice(batch)

    def _shard_slice(self, batch: List[int]) -> List[int]:
        """This process's CONTIGUOUS block of the global batch —
        make_array_from_process_local_data concatenates per-process data
        in process order, so block slicing makes the assembled global
        array identical to the single-process batch
        (tests/test_multiprocess.py pins this)."""
        return batch[self.shard_index * self.batch_size:
                     (self.shard_index + 1) * self.batch_size]

    # ---------------------------------------------------------- loading
    def _resized(self, index: int, record: dict, min_size: int, dtype):
        """Deterministic decode→resize→scale-boxes for one image, served
        from the LRU when possible (stored as uint8 — converting to f32 on
        hit is exact since the PIL resize output is byte-valued)."""
        key = (index, min_size, self.canvas_for(index))
        if self._cache_budget > 0:
            with self._cache_lock:
                hit = self._cache.get(key)
                if hit is not None:
                    self._cache.move_to_end(key)
            if hit is not None:
                canvas_u8, size_hw, boxes = hit
                canvas = (canvas_u8 if dtype == np.uint8
                          else canvas_u8.astype(dtype))
                return canvas, size_hw, boxes.copy()
        image = self.source.load_image(index)
        canvas_u8, size_hw, boxes = T.resize_to_canvas(
            image, record["boxes"], min_size, self.max_size,
            self.canvas_for(index), dtype=np.uint8,
        )
        if self._cache_budget > 0:
            nbytes = canvas_u8.nbytes + boxes.nbytes + 128
            with self._cache_lock:
                if key not in self._cache:
                    self._cache[key] = (canvas_u8, size_hw, boxes)
                    self._cache_bytes += nbytes
                    while self._cache_bytes > self._cache_budget and self._cache:
                        _, (c, _, b) = self._cache.popitem(last=False)
                        self._cache_bytes -= c.nbytes + b.nbytes + 128
        canvas = canvas_u8 if dtype == np.uint8 else canvas_u8.astype(dtype)
        return canvas, size_hw, boxes.copy()

    def _load_one(self, index: int, rng: np.random.RandomState):
        record = self.source.annotation(index)
        # the PIL resize output is uint8-exact (transforms.resize_to_canvas),
        # so everything except the host-normalized mode ships byte canvases:
        # 4x less host→device traffic; normalization (or ABR fusion, which
        # normalizes itself) runs on device
        canvas_dtype = np.float32 if self.normalize is True else np.uint8
        if self._cache_budget > 0:
            # jitter is off (cache enabled ⇒ all factors 0 ⇒ color_jitter
            # is the identity and draws nothing) — rng order is unchanged
            min_size = (self.min_sizes[rng.randint(len(self.min_sizes))]
                        if self.is_train and len(self.min_sizes) > 1
                        else self.min_size)
            if self.pixel_bank is not None and canvas_dtype == np.uint8:
                # device-resident canvas bank: the flip draw moves BEFORE
                # canvas production (same randint→uniform sequence, so the
                # rng stream is unchanged); on a bank hit no pixel bytes
                # are produced at all — the resized size comes from the
                # metadata cache populated on the key's first (miss) visit.
                # Keys use the image PATH, not the source-relative index:
                # the bank may be shared across loaders over DIFFERENT
                # sources (eval_steps evaluates several class-filter cfgs),
                # where the same index means different images.  Boxes are
                # never cached — they depend on the class filter — and are
                # recomputed from the record with resize_to_canvas's exact
                # scaling (transforms.py:75-78), which is a pure function
                # of (size_hw, record) — bit-identical to the miss path.
                flipped = self.flip_prob > 0 and rng.uniform() < self.flip_prob
                uid = self.source.image_path(index)
                bkey = (uid, min_size, self.canvas_for(index), flipped)
                meta = self._meta_cache.get(bkey[:3])
                if meta is not None and self.pixel_bank.contains(bkey):
                    canvas = None  # banked — no pixel bytes needed
                    size_hw = meta
                    boxes = record["boxes"].copy().astype(np.float32)
                    if boxes.size:
                        boxes[:, 0::2] *= size_hw[1] / record["width"]
                        boxes[:, 1::2] *= size_hw[0] / record["height"]
                    if flipped:
                        boxes = T.hflip_boxes(size_hw, boxes)
                else:
                    canvas, size_hw, boxes = self._resized(
                        index, record, min_size, canvas_dtype)
                    self._meta_cache.setdefault(bkey[:3], tuple(size_hw))
                    if flipped:
                        canvas, boxes = T.hflip(canvas, size_hw, boxes)
                pb, pl, pm = pad_boxes(
                    boxes, self._checked_labels(record), self.max_gt)
                crops = (self._mask_crops(record, flipped)
                         if self.mask_crop_size else None)
                kps = (self._padded_keypoints(record, size_hw, flipped)
                       if self.num_keypoints else None)
                return (canvas, np.asarray(size_hw, np.int32), pb, pl, pm,
                        record, crops, bkey, kps)
            canvas, size_hw, boxes = self._resized(
                index, record, min_size, canvas_dtype)
        else:
            image = self.source.load_image(index)
            image = T.color_jitter(
                image, rng,
                brightness=float(self.cfg.INPUT.BRIGHTNESS),
                contrast=float(self.cfg.INPUT.CONTRAST),
                saturation=float(self.cfg.INPUT.SATURATION),
                hue=float(self.cfg.INPUT.HUE),
            ) if self.is_train else image.astype(np.float32)
            min_size = (self.min_sizes[rng.randint(len(self.min_sizes))]
                        if self.is_train and len(self.min_sizes) > 1
                        else self.min_size)
            canvas, size_hw, boxes = T.resize_to_canvas(
                image, record["boxes"], min_size, self.max_size,
                self.canvas_for(index), dtype=canvas_dtype,
            )
        flipped = self.flip_prob > 0 and rng.uniform() < self.flip_prob
        if flipped:
            canvas, boxes = T.hflip(canvas, size_hw, boxes)
        if self.normalize is True:
            canvas = T.normalize(
                canvas, self.cfg.INPUT.PIXEL_MEAN, bool(self.cfg.INPUT.TO_BGR255)
            )
        pb, pl, pm = pad_boxes(
            boxes, self._checked_labels(record), self.max_gt)
        crops = self._mask_crops(record, flipped) if self.mask_crop_size else None
        kps = (self._padded_keypoints(record, size_hw, flipped)
               if self.num_keypoints else None)
        return (canvas, np.asarray(size_hw, np.int32), pb, pl, pm, record,
                crops, None, kps)

    def _checked_labels(self, record):
        # train only: training indexes class logits by gt label (OOB =
        # NaN-valued zero-grad losses); eval gt labels feed ONLY the metric,
        # and evaluating a small-head model on a full test set (mode
        # "test_all" keeps old+new+excluded classes) is legitimate.
        labels = record["labels"]
        if (self.is_train and len(labels)
                and int(np.max(labels)) >= self.num_classes):
            raise ValueError(
                f"dataset label {int(np.max(labels))} >= "
                f"MODEL.ROI_BOX_HEAD.NUM_CLASSES ({self.num_classes}) — the "
                "data source's contiguous labels don't fit the configured "
                "head (check the dataset's category remapping / NAME_*_CLASSES)"
            )
        return labels

    def _mask_crops(self, record, flipped: bool) -> np.ndarray:
        """[MAX_GT, R, R] float32: each gt instance's mask cropped to its
        own (original-coordinate) box and resized — box-normalized, so the
        canvas resize needs no mask-side work (the crop is scale
        invariant; reference SegmentationMask.crop+resize,
        mask_head/loss.py:16-44)."""
        from PIL import Image

        r = self.mask_crop_size
        out = np.zeros((self.max_gt, r, r), np.float32)
        masks = record.get("masks")
        if masks is None or len(masks) == 0:
            return out
        boxes = record["boxes"]
        for i in range(min(len(masks), self.max_gt)):
            x1, y1, x2, y2 = boxes[i]
            x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
            x2i = max(int(np.ceil(x2)) + 1, x1i + 1)
            y2i = max(int(np.ceil(y2)) + 1, y1i + 1)
            crop = np.asarray(masks[i][y1i:y2i, x1i:x2i], np.float32)
            if crop.size == 0:
                continue
            resized = np.asarray(
                Image.fromarray((crop * 255).astype(np.uint8)).resize(
                    (r, r), Image.BILINEAR
                ),
                np.float32,
            ) / 255.0
            if flipped:
                resized = resized[:, ::-1]
            out[i] = resized
        return out

    def _padded_keypoints(self, record, size_hw, flipped: bool) -> np.ndarray:
        """[MAX_GT, K, 3] keypoint targets in canvas coordinates: the
        record's original-frame (x, y, vis) rows scaled by the SAME ratios
        the boxes got, mirrored (+ left/right index swap) under hflip —
        the reference applies Keypoints.resize/transpose through the
        BoxList transforms (structures/keypoint.py)."""
        from ..structures.keypoints import hflip_keypoints, resize_keypoints

        k = self.num_keypoints
        out = np.zeros((self.max_gt, k, 3), np.float32)
        kps = record.get("keypoints")
        if kps is None or len(kps) == 0:
            return out
        kps = resize_keypoints(
            np.asarray(kps, np.float32),
            size_hw[1] / record["width"], size_hw[0] / record["height"],
        )
        if flipped:
            kps = hflip_keypoints(kps, float(size_hw[1]))
        n = min(len(kps), self.max_gt)
        kk = min(kps.shape[1], k)
        out[:n, :kk] = kps[:n, :kk]
        return out

    def _load_many(self, idxs: List[int], rngs) -> list:
        """Per-image prep for one batch, fanned over the worker pool.
        executor.map preserves input order, so results are independent of
        worker count/scheduling (each item's rng arrives pre-keyed)."""
        if self.num_workers <= 1 or len(idxs) <= 1:
            return [self._load_one(i, r) for i, r in zip(idxs, rngs)]
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return list(self._pool.map(self._load_one, idxs, rngs))

    def _item_rng(self, it: int, local_pos: int) -> np.random.RandomState:
        """Augmentation RNG as a pure function of (seed, iteration, GLOBAL
        batch position).  A shared sequential RNG would consume differently
        per process topology; keyed streams make the assembled global batch
        identical to a single-process run (test_multiprocess pins this)."""
        gpos = self.shard_index * self.batch_size + local_pos
        mixed = (
            self.seed * 2654435761 + (self.start_iter + it) * 1000003
            + gpos * 97 + 7
        ) % (2 ** 32)
        return np.random.RandomState(mixed)

    def batches(self, max_batches: Optional[int] = None) -> Iterator[Batch]:
        """Yield Batch pytrees (numpy); records side-channel not included.

        With a pixel_bank attached, yields (Batch(pixels=None, ...), keys,
        canvases) instead — the caller assembles the pixel batch on device
        (canvases[i] is None for banked keys)."""
        if max_batches is not None and max_batches <= 0:
            return  # a finished job's rerun asks for zero batches
        count = 0
        for it, idxs in enumerate(self._index_batches()):
            loaded = self._load_many(
                idxs, [self._item_rng(it, p) for p in range(len(idxs))]
            )
            sizes, boxes, labels, masks = map(
                np.stack, zip(*[l[1:5] for l in loaded])
            )
            crops = (
                np.stack([l[6] for l in loaded]) if self.mask_crop_size else None
            )
            kps = (
                np.stack([l[8] for l in loaded]) if self.num_keypoints else None
            )
            if self.pixel_bank is not None:
                b = Batch(None, sizes, boxes, labels, masks,
                          gt_mask_crops=crops, gt_keypoints=kps)
                yield b, [l[7] for l in loaded], [l[0] for l in loaded]
            else:
                pixels = np.stack([l[0] for l in loaded])
                yield Batch(pixels, sizes, boxes, labels, masks,
                            gt_mask_crops=crops, gt_keypoints=kps)
            count += 1
            if max_batches is not None and count >= max_batches:
                return

    def bank_drop(self, item) -> None:
        """on_drop hook for prefetch over banked streams: release the
        promise pins (device_cache.DeviceCanvasBank.release) of a batch
        that was produced but never consumed.  Banked occurrences are the
        ones the loader skipped pixels for (canvas None)."""
        if self.pixel_bank is None:
            return
        keys, canvases = item[-2], item[-1]
        self.pixel_bank.release(
            [k for k, c in zip(keys, canvases) if c is None])

    def prefetched(self, max_batches: Optional[int] = None, depth: int = 2):
        """Background-thread prefetch over batches() (see prefetch_iter)."""
        return prefetch_iter(
            self.batches(max_batches), depth=depth,
            on_drop=self.bank_drop if self.pixel_bank is not None else None)

    def raw_batches(self) -> Iterator[tuple]:
        """ABR path: yields (pixels_raw [B,H,W,3] RGB 0-255, sizes,
        orig_sizes, gt_boxes, gt_labels, gt_mask) with NO normalization —
        on-device fusion blends raw pixels first (see abr_fusion)."""
        assert self.normalize is False, (
            "construct with normalize=False for raw batches")
        for it, idxs in enumerate(self._index_batches()):
            loaded = self._load_many(
                idxs, [self._item_rng(it, p) for p in range(len(idxs))]
            )
            items = []
            for canvas, size_hw, pb, pl, pm, rec, *_rest in loaded:
                orig = np.array([rec["height"], rec["width"]], np.int32)
                items.append((size_hw, orig, pb, pl, pm))
            rest = tuple(map(np.stack, zip(*items)))
            if self.pixel_bank is not None:
                yield ((None,) + rest,
                       [l[7] for l in loaded], [l[0] for l in loaded])
            else:
                pixels = np.stack([l[0] for l in loaded])
                yield (pixels,) + rest

    def eval_batches(self):
        """Eval iteration: yields (Batch, records, n_valid) keeping the
        per-image metadata needed by the evaluator.  Batches are
        orientation-grouped like training; each group's final batch is
        padded by repetition, with n_valid marking the real prefix.

        With a pixel_bank attached, yields
        (Batch(pixels=None, ...), records, n_valid, keys, canvases)
        instead — the caller assembles pixels via bank.batch(keys,
        canvases), exactly like the banked train streams."""
        gbs = self.batch_size * self.num_shards
        self._last_flush_real = gbs
        for it, idxs in enumerate(self._index_batches()):
            # real items are a prefix of the GLOBAL batch (padding repeats
            # the trailing index); with contiguous block sharding this
            # shard's real count is its overlap with that prefix
            real_global = self._last_flush_real
            self._last_flush_real = gbs
            n_valid = int(np.clip(
                real_global - self.shard_index * self.batch_size,
                0, self.batch_size,
            ))
            # test-time _load_one normally never draws (no jitter/flip/
            # multi-scale), but keyed per-item rngs keep even unusual
            # constructions deterministic under the worker pool
            loaded = self._load_many(
                idxs, [self._item_rng(it, p) for p in range(len(idxs))]
            )
            records = [l[5] for l in loaded[:n_valid]]
            if self.pixel_bank is not None:
                sizes, boxes, labels, masks = map(
                    np.stack, zip(*[l[1:5] for l in loaded])
                )
                yield (Batch(None, sizes, boxes, labels, masks), records,
                       n_valid, [l[7] for l in loaded],
                       [l[0] for l in loaded])
            else:
                pixels, sizes, boxes, labels, masks = map(
                    np.stack, zip(*[l[:5] for l in loaded])
                )
                yield (Batch(pixels, sizes, boxes, labels, masks),
                       records, n_valid)
