"""Box rehearsal memory (Mem), PBS, crop bank, and on-device ABR fusion."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from abr_iod_tpu.config import get_default_config, VOC_CLASSES
from abr_iod_tpu.data.synthetic import make_synthetic_voc
from abr_iod_tpu.data.voc import VOCDataSource
from abr_iod_tpu.data.loader import DetectionLoader
from abr_iod_tpu.data.abr_fusion import CropBank, abr_fuse_batch, make_abr_batch_fn
from abr_iod_tpu.memory.rehearsal import Mem, load_crop_bank
from abr_iod_tpu.memory.pbs import extract_bboxes_and_features

from tests.test_train_step import tiny_model


def _mem_cfg(tmpdir, old, new, mem_type="mean", mem_buff=8):
    cfg = get_default_config()
    cfg.MODEL.ROI_BOX_HEAD.NAME_OLD_CLASSES = tuple(old)
    cfg.MODEL.ROI_BOX_HEAD.NAME_NEW_CLASSES = tuple(new)
    cfg.MEM_TYPE = mem_type
    cfg.MEM_BUFF = mem_buff
    cfg.TPU.CANVAS_TRAIN = (128, 160)
    cfg.TPU.CANVAS_TEST = (128, 160)
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.TPU.MAX_GT = 8
    return cfg


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vocmem") / "VOC2007")
    make_synthetic_voc(root, n_images=10, classes=VOC_CLASSES[:4], image_hw=(160, 200))
    return root


def _fake_pbs_info(n_new_classes, n_old, per_class=5, rng=None):
    rng = rng or np.random.RandomState(0)
    info = []
    for c in range(n_new_classes):
        entries = []
        for _ in range(per_class):
            entries.append(
                {
                    "feature": rng.randn(7, 7).astype(np.float32),
                    "logits": rng.randn(4).astype(np.float32),
                    "image_path": "000000",
                    "box_class": n_old + c + 1,
                    "box": [10.0, 10.0, 100.0, 120.0],
                }
            )
        info.append(entries)
    return info


def test_mem_strategies_write_crops(tmp_path, voc_root):
    for mem_type in ("random", "mean", "herding"):
        cfg = _mem_cfg(tmp_path, [], VOC_CLASSES[:2], mem_type=mem_type, mem_buff=4)
        mem_dir = str(tmp_path / f"mem_{mem_type}")
        mem = Mem(cfg, step=0, current_mem_path=mem_dir, img_root=voc_root)
        info = _fake_pbs_info(2, 0)
        exemplar = mem.update_memory(info)
        # quota = ceil(4/2) = 2 per class
        assert len(exemplar) == 4, (mem_type, exemplar)
        names = {os.path.splitext(f)[0].split("_")[0] for f in exemplar}
        assert names == {"1", "2"}


def test_mem_mean_matches_reference_formula(tmp_path, voc_root, rng):
    cfg = _mem_cfg(tmp_path, [], VOC_CLASSES[:1], mem_type="mean", mem_buff=2)
    mem_dir = str(tmp_path / "mem_sel")
    mem = Mem(cfg, step=0, current_mem_path=mem_dir, img_root=voc_root)
    feats = [rng.randn(7, 7).astype(np.float32) for _ in range(5)]
    info = [[
        {"feature": f, "logits": np.zeros(2), "image_path": "000000",
         "box_class": 1, "box": [0, 0, 50 + i, 50 + i]}
        for i, f in enumerate(feats)
    ]]
    mem.update_memory([list(info[0])])
    # recompute the reference's selection (extract_memory.py:111-161):
    # global-norm phi, L2-normalized class mean, smallest distances win
    arr = np.asarray(feats, np.float64)
    mu = arr.mean(0)
    mu /= np.linalg.norm(mu)
    phi = arr / np.linalg.norm(arr)
    dist = np.sqrt(((mu - phi) ** 2).sum(axis=(1, 2)))
    expected = set(np.argsort(dist)[:2].tolist())
    kept = {e["box"][2] - 50 for e in mem.current_mem_info[0]}
    assert kept == expected


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_pbs_extraction_filters_small_boxes(voc_root, tmp_path):
    cfg = _mem_cfg(tmp_path, [], VOC_CLASSES[:4])
    model = tiny_model(num_classes=5)
    src = VOCDataSource(voc_root, "trainval", "sample_new", (), VOC_CLASSES[:4], ())
    loader = DetectionLoader(src, cfg, batch_size=2, is_train=False,
                             canvas=(128, 160), flip=False)
    pixels = jnp.zeros((2, 128, 160, 3))
    rois = jnp.zeros((2, 4, 4)) + jnp.asarray([0.0, 0.0, 20.0, 20.0])
    params = model.init(jax.random.PRNGKey(0), pixels, rois)
    info = extract_bboxes_and_features(model, params, loader, cfg)
    assert len(info) == 4
    total = sum(len(c) for c in info)
    assert total > 0
    for c_idx, entries in enumerate(info):
        for e in entries:
            b = e["box"]
            assert not ((b[2] - b[0]) <= 70 and (b[3] - b[1]) <= 70)
            assert e["box_class"] == c_idx + 1
            assert np.asarray(e["feature"]).shape == (7, 7)


def test_crop_bank_roundtrip(tmp_path, voc_root):
    cfg = _mem_cfg(tmp_path, [], VOC_CLASSES[:2], mem_type="random", mem_buff=4)
    mem_dir = str(tmp_path / "bank")
    mem = Mem(cfg, step=0, current_mem_path=mem_dir, img_root=voc_root)
    mem.update_memory(_fake_pbs_info(2, 0))
    bank = load_crop_bank(mem_dir, bank_hw=(64, 64))
    assert bank.pixels.shape[0] == 4
    assert set(np.asarray(bank.labels).tolist()) == {1, 2}
    assert (np.asarray(bank.orig_hw) > 0).all()
    # content is top-left aligned and nonzero
    assert float(bank.pixels[0, :4, :4].sum()) != 0.0


def _toy_bank(rng, n=6, bank_hw=(32, 32)):
    px = rng.uniform(50, 200, (n, *bank_hw, 3)).astype(np.float32)
    content = np.tile(np.array(bank_hw, np.float32), (n, 1))
    orig = rng.uniform(40, 120, (n, 2)).astype(np.float32)
    labels = rng.randint(1, 3, n).astype(np.int32)
    return CropBank(jnp.asarray(px), jnp.asarray(content), jnp.asarray(orig),
                    jnp.asarray(labels))


@pytest.mark.slow
def test_abr_fusion_modes(rng):
    b, h, w, m = 8, 96, 128, 10
    pixels = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32))
    sizes = jnp.tile(jnp.array([[h, w]], dtype=jnp.int32), (b, 1))
    orig = jnp.tile(jnp.array([[200, 260]], dtype=jnp.int32), (b, 1))
    boxes = jnp.zeros((b, m, 4)).at[:, 0].set(jnp.array([5.0, 5.0, 40.0, 40.0]))
    labels = jnp.zeros((b, m), jnp.int32).at[:, 0].set(3)
    mask = jnp.zeros((b, m), bool).at[:, 0].set(True)
    bank = _toy_bank(rng)

    px, sz, bx, lb, mk = abr_fuse_batch(
        pixels, sizes, orig, boxes, labels, mask, bank, jax.random.PRNGKey(0), 96
    )
    px, sz, bx, lb, mk = map(np.asarray, (px, sz, bx, lb, mk))
    assert px.shape == (b, h, w, 3)
    assert np.isfinite(px).all()

    changed = [not np.allclose(px[i], np.asarray(pixels)[i]) for i in range(b)]
    mosaic = [np.allclose(sz[i], [96, 96]) and changed[i] for i in range(b)]
    assert any(changed)  # some images fused (p=1/2 over 8 images)
    for i in range(b):
        if mosaic[i] and mk[i].any():
            # mosaic drops the original gt, boxes only from bank labels 1-2
            assert set(lb[i][mk[i]].tolist()) <= {1, 2}
        # all valid boxes inside the (possibly new) valid region
        if mk[i].any():
            v = bx[i][mk[i]]
            assert (v[:, 2] <= sz[i][1] + 1e-3).all()
            assert (v[:, 3] <= sz[i][0] + 1e-3).all()
            assert (v[:, 0] >= -1e-3).all()


@pytest.mark.slow
def test_abr_fusion_mixup_blends_pixels(rng):
    # force mixup by trying many seeds and checking at least one image mixes:
    # a mixup keeps the original valid size but changes pixels
    b, h, w, m = 16, 96, 128, 10
    pixels = jnp.zeros((b, h, w, 3))
    sizes = jnp.tile(jnp.array([[h, w]], dtype=jnp.int32), (b, 1))
    orig = jnp.tile(jnp.array([[100, 130]], dtype=jnp.int32), (b, 1))
    boxes = jnp.zeros((b, m, 4)).at[:, 0].set(jnp.array([2.0, 2.0, 20.0, 20.0]))
    labels = jnp.zeros((b, m), jnp.int32).at[:, 0].set(3)
    mask = jnp.zeros((b, m), bool).at[:, 0].set(True)
    bank = _toy_bank(rng)
    px, sz, bx, lb, mk = map(
        np.asarray,
        abr_fuse_batch(pixels, sizes, orig, boxes, labels, mask, bank,
                       jax.random.PRNGKey(3), 96),
    )
    mixup_imgs = [
        i for i in range(b)
        if np.allclose(sz[i], [h, w]) and px[i].sum() != 0.0
    ]
    assert mixup_imgs, "expected at least one mixup in 16 images"
    for i in mixup_imgs:
        assert mk[i].sum() >= 2  # original + ≥1 pasted crop
        # pasted crop labels come from the bank
        extra = lb[i][mk[i]][1:]
        assert set(extra.tolist()) <= {1, 2, 3}


@pytest.mark.slow  # compile-heavy (fast-tier budget)
def test_make_abr_batch_fn_normalizes(rng, tmp_path, voc_root):
    cfg = _mem_cfg(tmp_path, [], VOC_CLASSES[:2], mem_type="random", mem_buff=4)
    mem_dir = str(tmp_path / "bank2")
    mem = Mem(cfg, step=0, current_mem_path=mem_dir, img_root=voc_root)
    mem.update_memory(_fake_pbs_info(2, 0))
    bank = load_crop_bank(mem_dir, bank_hw=(64, 64))
    fuse = make_abr_batch_fn(cfg, bank)

    src = VOCDataSource(voc_root, "trainval", "train_new", (), VOC_CLASSES[:2], ())
    loader = DetectionLoader(src, cfg, batch_size=2, is_train=True, normalize=False)
    raw = next(iter(loader.raw_batches()))
    batch = fuse(*[jnp.asarray(x) for x in raw], jax.random.PRNGKey(0))
    assert batch.pixels.shape == (2, 128, 160, 3)
    # normalized: mean subtracted → negative values exist
    assert float(batch.pixels.min()) < 0
