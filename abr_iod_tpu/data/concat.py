"""Concatenated data sources (reference: data/datasets/concat_dataset.py
— ConcatDataset with get_img_info passthrough).  Presents multiple
sources as one index space; used when DATASETS.TRAIN lists several
datasets (reference build.py:17-64 builds then concatenates)."""

from __future__ import annotations

import bisect
from typing import Sequence


class ConcatDataSource:
    def __init__(self, sources: Sequence):
        assert sources, "need at least one source"
        self.sources = list(sources)
        self._cum = []
        total = 0
        for s in self.sources:
            total += len(s)
            self._cum.append(total)

    def __len__(self):
        return self._cum[-1]

    def _locate(self, index: int):
        si = bisect.bisect_right(self._cum, index)
        prev = self._cum[si - 1] if si > 0 else 0
        return self.sources[si], index - prev

    def annotation(self, index: int):
        src, i = self._locate(index)
        return src.annotation(i)

    def image_path(self, index: int):
        src, i = self._locate(index)
        return src.image_path(i)

    def load_image(self, index: int):
        src, i = self._locate(index)
        return src.load_image(i)

    @property
    def root(self):
        return self.sources[0].root
