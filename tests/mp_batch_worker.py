"""Worker for test_multiprocess: dump global-batch checksums.

Run under tools/launch.py with 2 processes (or standalone with 1): builds
the process-sharded DetectionLoader exactly like the driver
(driver._shard_kwargs), assembles GLOBAL batches with
parallel.mesh.shard_batch (the make_array_from_process_local_data path),
and writes per-image pixel/box checksums of the assembled global arrays
to OUT (rank 0).  The parent test compares 2-process output against the
1-process run — byte-identical global batches prove the sharded loader +
cross-process assembly reproduce the single-process data stream.
"""

import functools
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abr_iod_tpu.utils.platform import (  # noqa: E402
    maybe_init_distributed, respect_jax_platforms_env,
)

respect_jax_platforms_env()
maybe_init_distributed()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from abr_iod_tpu.config import get_default_config, VOC_CLASSES
    from abr_iod_tpu.data.loader import DetectionLoader
    from abr_iod_tpu.engine.driver import (
        _mesh_from_cfg, _shard_kwargs, make_data_source,
    )
    from abr_iod_tpu.parallel.mesh import shard_batch
    from abr_iod_tpu.utils import comm

    cfg = get_default_config()
    cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES = VOC_CLASSES
    cfg.DATASETS.TRAIN = ("voc_rb_synthetic_train",)
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.TPU.CANVAS_TRAIN = (96, 128)
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.TPU.MAX_GT = 8
    cfg.IS_FATHER = True

    source = make_data_source(cfg, cfg.DATASETS.TRAIN[0], "train_new")
    loader = DetectionLoader(
        source, cfg, is_train=True, seed=42,
        **_shard_kwargs(int(cfg.SOLVER.IMS_PER_BATCH)),
    )
    mesh = _mesh_from_cfg(cfg, int(cfg.SOLVER.IMS_PER_BATCH))

    from jax.sharding import NamedSharding, PartitionSpec as P

    # replicated outputs so every process can fetch the full checksum list
    @functools.partial(
        jax.jit, out_shardings=NamedSharding(mesh, P()))
    def checksums(px, boxes, labels):
        return (
            jnp.sum(px, axis=(1, 2, 3)),
            jnp.sum(boxes, axis=(1, 2)),
            jnp.sum(labels, axis=1),
        )

    out = []
    with jax.sharding.set_mesh(mesh):
        for i, batch in enumerate(loader.batches(max_batches=3)):
            g = shard_batch(mesh, batch)
            px, bx, lb = checksums(g.pixels, g.gt_boxes, g.gt_labels)
            out.append({
                "pixels": np.asarray(px).tolist(),
                "boxes": np.asarray(bx).tolist(),
                "labels": np.asarray(lb).tolist(),
            })
    if comm.is_main_process():
        with open(os.environ["ABR_IOD_MP_OUT"], "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
