"""Dual-orientation canvas: portrait images keep full shortest-side
resolution (the reference achieves this via aspect-ratio grouping +
ragged padding, grouped_batch_sampler.py:9-113 + transforms.py:64-93;
here: a transposed second static canvas + orientation-grouped batches).
"""

import numpy as np
import pytest

from abr_iod_tpu.config import get_default_config, VOC_CLASSES
from abr_iod_tpu.data import transforms as T
from abr_iod_tpu.data.loader import DetectionLoader
from abr_iod_tpu.data.synthetic import make_synthetic_voc
from abr_iod_tpu.data.voc import VOCDataSource


@pytest.fixture(scope="module")
def mixed_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vocmix") / "VOC2007")
    make_synthetic_voc(
        root, n_images=12, classes=VOC_CLASSES[:6], image_hw=(120, 160),
        mixed_orientations=True,
    )
    return root


def _loader(root, canvas=(96, 128), batch_size=4, **kw):
    cfg = get_default_config()
    cfg.TPU.CANVAS_TRAIN = canvas
    cfg.TPU.CANVAS_TEST = canvas
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.TPU.MAX_GT = 8
    src = VOCDataSource(root, "trainval", "train_new", (), VOC_CLASSES[:6], ())
    return DetectionLoader(src, cfg, batch_size=batch_size,
                           is_train=kw.pop("is_train", True), **kw), cfg


def test_portrait_image_reaches_full_min_size():
    """The VERDICT round-1 blocker: a 750x500 (h x w) portrait VOC image
    must reach shortest-side 800 on the production canvas, not be capped
    at ~624 by the landscape canvas rows."""
    canvas = (832, 1344)
    h, w = 750, 500
    # transposed canvas for portrait input (what loader.canvas_for picks)
    ratio = T.resize_ratio(h, w, 800, 1333, (canvas[1], canvas[0]))
    assert min(h, w) * ratio == pytest.approx(800, abs=1)
    # sanity: the landscape canvas WOULD have capped it (the round-1 bug)
    capped = T.resize_ratio(h, w, 800, 1333, canvas)
    assert min(h, w) * capped < 700


def test_canvas_for_orientation(mixed_root):
    loader, _ = _loader(mixed_root)
    shapes = {loader.canvas_for(i) for i in range(len(loader.source))}
    assert shapes == {(96, 128), (128, 96)}
    for i in range(len(loader.source)):
        rec = loader.source.annotation(i)
        ch, cw = loader.canvas_for(i)
        assert (rec["height"] > rec["width"]) == (ch > cw)


def test_train_batches_are_orientation_grouped(mixed_root):
    loader, _ = _loader(mixed_root)
    seen = set()
    for b in loader.batches(max_batches=6):
        assert b.pixels.shape[1:3] in {(96, 128), (128, 96)}
        seen.add(b.pixels.shape[1:3])
        # every image in the batch fits its canvas with the full min-size rule
        for i in range(b.pixels.shape[0]):
            sh, sw = b.sizes[i]
            assert min(sh, sw) == 96  # shortest side never capped below min
    assert seen == {(96, 128), (128, 96)}


def test_eval_batches_cover_every_image_once(mixed_root):
    loader, _ = _loader(mixed_root, is_train=False)
    ids = []
    for batch, records, n_valid in loader.eval_batches():
        assert batch.pixels.shape[1:3] in {(96, 128), (128, 96)}
        assert len(records) == n_valid
        ids.extend(r["img_id"] for r in records)
    assert sorted(ids) == sorted(
        loader.source.annotation(i)["img_id"] for i in range(len(loader.source))
    )


def test_sharded_grouping_agrees_across_processes(mixed_root):
    """All shards must see the same orientation sequence (SPMD programs
    must match) and partition each global batch."""
    l0, _ = _loader(mixed_root, batch_size=2, num_shards=2, shard_index=0)
    l1, _ = _loader(mixed_root, batch_size=2, num_shards=2, shard_index=1)
    b0 = [b for _, b in zip(range(6), l0._index_batches())]
    b1 = [b for _, b in zip(range(6), l1._index_batches())]
    for a, b in zip(b0, b1):
        assert len(a) == len(b) == 2
        assert not set(a) & set(b)
        # same orientation on both shards
        assert l0._is_portrait(a[0]) == l1._is_portrait(b[0])


@pytest.mark.slow
def test_train_step_compiles_both_orientations():
    """One train step serves both canvases (anchors derived from the traced
    shape): run landscape then portrait batches through the same step."""
    import jax.numpy as jnp
    from tests.test_train_step import tiny_cfg, tiny_model, synth_batch
    from abr_iod_tpu.engine import TrainState, make_train_step
    from abr_iod_tpu.solver.optim import make_optimizer

    rng = np.random.RandomState(0)
    cfg = tiny_cfg()
    model = tiny_model()
    land = synth_batch(rng, b=2)
    port = land._replace(
        pixels=jnp.transpose(land.pixels, (0, 2, 1, 3)),
        sizes=land.sizes[:, ::-1],
        gt_boxes=land.gt_boxes[:, :, [1, 0, 3, 2]],
    )
    import jax

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), land.pixels[:1], jnp.zeros((1, 4, 4)) + 16.0
    )
    tx = make_optimizer(cfg, params)
    step, _ = make_train_step(model, tx, cfg, (64, 96))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    state, m1 = step(state, land)
    state, m2 = step(state, port)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
