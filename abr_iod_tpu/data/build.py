"""Data loader factories (reference: data/build.py:17-223 —
build_dataset / make_data_loader / make_bbox_loader).

Maps dataset-catalog names to sources and wraps them in the static-
canvas DetectionLoader.  ``make_bbox_loader`` is the PBS sampling-phase
variant (sequential order, TEST batch size — reference build.py:171-223).
"""

from __future__ import annotations

from typing import Optional

import jax

from .loader import DetectionLoader


def build_dataset(cfg, dataset_name: str, mode: str):
    """Catalog name + mode → data source (reference build_dataset)."""
    from ..engine.driver import make_data_source

    return make_data_source(cfg, dataset_name, mode)


def make_data_loader(cfg, is_train: bool = True, is_distributed: bool = False,
                     start_iter: int = 0, normalize: Optional[bool] = None):
    """Training/eval loader over DATASETS.TRAIN / DATASETS.TEST (multiple
    entries are concatenated like the reference's ConcatDataset)."""
    names = tuple(cfg.DATASETS.TRAIN if is_train else cfg.DATASETS.TEST)
    mode = "train_new" if is_train else "test_all"
    sources = [build_dataset(cfg, n, mode) for n in names]
    if len(sources) == 1:
        source = sources[0]
    else:
        from .concat import ConcatDataSource

        source = ConcatDataSource(sources)
    num_shards = jax.process_count() if is_distributed else 1
    shard_index = jax.process_index() if is_distributed else 0
    batch = int(cfg.SOLVER.IMS_PER_BATCH if is_train else cfg.TEST.IMS_PER_BATCH)
    return DetectionLoader(
        source, cfg, batch_size=batch, is_train=is_train, seed=int(cfg.SEED),
        num_shards=num_shards, shard_index=shard_index, start_iter=start_iter,
        normalize=True if normalize is None else normalize,
    )


def make_bbox_loader(cfg):
    """Sampling-phase loader for Prototype Box Selection: sequential over
    new-class images, eval batching (reference build.py:171-223)."""
    source = build_dataset(cfg, cfg.DATASETS.TRAIN[0], "sample_new")
    return DetectionLoader(
        source, cfg, batch_size=int(cfg.TEST.IMS_PER_BATCH), is_train=False,
        canvas=tuple(cfg.TPU.CANVAS_TEST), flip=False,
    )
