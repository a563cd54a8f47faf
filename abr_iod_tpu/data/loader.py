"""Host data loader: fixed-shape batches with background prefetch.

Replaces the reference's torch DataLoader + BatchCollator + samplers
(data/build.py:109-169, data/collate_batch.py, data/samplers/*):
  * iteration-based training — an infinite epoch-shuffled stream
    (IterationBasedBatchSampler equivalent)
  * per-process sharding by jax.process_index (DistributedSampler
    equivalent; single host here but the hook is in place)
  * instead of aspect-ratio grouping + ragged padding, every image is
    resized into one static canvas (see transforms.py)
  * a background thread keeps one batch ahead (the C++ data plane in
    csrc/ is plugged in here when built)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ..engine.train import Batch
from ..structures.boxes import pad_boxes
from . import transforms as T


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
        normalize: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
        start_iter: int = 0,
        flip: Optional[bool] = None,
    ):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.is_train = is_train
        self.max_gt = max_gt or int(cfg.TPU.MAX_GT)
        self.canvas = tuple(canvas or (cfg.TPU.CANVAS_TRAIN if is_train else cfg.TPU.CANVAS_TEST))
        self.min_size = int(cfg.INPUT.MIN_SIZE_TRAIN[0] if is_train else cfg.INPUT.MIN_SIZE_TEST)
        self.max_size = int(cfg.INPUT.MAX_SIZE_TRAIN if is_train else cfg.INPUT.MAX_SIZE_TEST)
        self.flip_prob = (
            float(cfg.INPUT.FLIP_PROB_TRAIN) if (flip if flip is not None else is_train) else 0.0
        )
        self.seed = seed
        self.normalize = normalize
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.start_iter = start_iter

    def __len__(self):
        return len(self.source)

    def _indices(self) -> Iterator[int]:
        n = len(self.source)
        epoch = 0
        # resume fast-forward: skip the batches already consumed before the
        # checkpoint so a resumed run continues the stream instead of
        # re-reading the first start_iter batches (reference
        # IterationBasedBatchSampler, data/samplers/iteration_based_batch_sampler.py)
        skip = self.start_iter * self.batch_size if self.is_train else 0
        while True:
            order = np.arange(n)
            if self.is_train:
                np.random.RandomState(self.seed + epoch).shuffle(order)
            order = order[self.shard_index :: self.num_shards]
            if skip >= len(order):
                skip -= len(order)
            else:
                yield from order[skip:]
                skip = 0
            epoch += 1
            if not self.is_train:
                return

    def _load_one(self, index: int, rng: np.random.RandomState):
        record = self.source.annotation(index)
        image = self.source.load_image(index)
        image = T.color_jitter(
            image, rng,
            brightness=float(self.cfg.INPUT.BRIGHTNESS),
            contrast=float(self.cfg.INPUT.CONTRAST),
            saturation=float(self.cfg.INPUT.SATURATION),
            hue=float(self.cfg.INPUT.HUE),
        ) if self.is_train else image.astype(np.float32)
        canvas, size_hw, boxes = T.resize_to_canvas(
            image, record["boxes"], self.min_size, self.max_size, self.canvas
        )
        if self.flip_prob > 0 and rng.uniform() < self.flip_prob:
            canvas, boxes = T.hflip(canvas, size_hw, boxes)
        if self.normalize:
            canvas = T.normalize(
                canvas, self.cfg.INPUT.PIXEL_MEAN, bool(self.cfg.INPUT.TO_BGR255)
            )
        pb, pl, pm = pad_boxes(boxes, record["labels"], self.max_gt)
        return canvas, np.asarray(size_hw, np.int32), pb, pl, pm, record

    def batches(self, max_batches: Optional[int] = None) -> Iterator[Batch]:
        """Yield Batch pytrees (numpy); records side-channel not included."""
        it = self._indices()
        rng = np.random.RandomState(self.seed + 7 + self.start_iter)
        count = 0
        done = False
        while not done:
            items = []
            for _ in range(self.batch_size):
                try:
                    idx = next(it)
                except StopIteration:
                    done = True
                    break
                items.append(self._load_one(idx, rng)[:5])
            if not items:
                return
            while len(items) < self.batch_size:  # pad final eval batch
                items.append(items[-1])
            pixels, sizes, boxes, labels, masks = map(np.stack, zip(*items))
            yield Batch(pixels, sizes, boxes, labels, masks)
            count += 1
            if max_batches is not None and count >= max_batches:
                return

    def prefetched(self, max_batches: Optional[int] = None, depth: int = 2):
        """Background-thread prefetch wrapper."""
        q: "queue.Queue" = queue.Queue(maxsize=depth)
        sentinel = object()

        def worker():
            try:
                for b in self.batches(max_batches):
                    q.put(b)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            yield item

    def raw_batches(self) -> Iterator[tuple]:
        """ABR path: yields (pixels_raw [B,H,W,3] RGB 0-255, sizes,
        orig_sizes, gt_boxes, gt_labels, gt_mask) with NO normalization —
        on-device fusion blends raw pixels first (see abr_fusion)."""
        assert not self.normalize, "construct with normalize=False for raw batches"
        it = self._indices()
        rng = np.random.RandomState(self.seed + 7 + self.start_iter)
        while True:
            items = []
            for _ in range(self.batch_size):
                idx = next(it)
                canvas, size_hw, pb, pl, pm, rec = self._load_one(idx, rng)
                orig = np.array([rec["height"], rec["width"]], np.int32)
                items.append((canvas, size_hw, orig, pb, pl, pm))
            yield tuple(map(np.stack, zip(*items)))

    def eval_batches(self):
        """Eval iteration: yields (Batch, records, n_valid) keeping the
        per-image metadata needed by the evaluator."""
        rng = np.random.RandomState(0)
        n = len(self.source)
        for start in range(0, n, self.batch_size):
            idxs = list(range(start, min(start + self.batch_size, n)))
            loaded = [self._load_one(i, rng) for i in idxs]
            n_valid = len(loaded)
            while len(loaded) < self.batch_size:
                loaded.append(loaded[-1])
            pixels, sizes, boxes, labels, masks = map(
                np.stack, zip(*[l[:5] for l in loaded])
            )
            records = [l[5] for l in loaded[:n_valid]]
            yield Batch(pixels, sizes, boxes, labels, masks), records, n_valid
