import json
import os

import numpy as np
import pytest

from abr_iod_tpu.data.coco import COCODataSource, COCO_CATS, CAT_TO_ALPHA_LABEL
from abr_iod_tpu.evaluation.coco_eval import (
    check_expected_results,
    eval_detection_coco,
)


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    """Tiny synthetic COCO: 6 images, categories with non-contiguous ids."""
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.RandomState(0)
    cats = [
        {"id": 1, "name": "person"},
        {"id": 5, "name": "airplane"},
        {"id": 72, "name": "tv"},
        {"id": 90, "name": "toothbrush"},
    ]
    images, annotations = [], []
    aid = 1
    for i in range(6):
        images.append({"id": 100 + i, "file_name": f"{i}.jpg", "height": 64, "width": 96})
        Image.fromarray(rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
        # even images contain 'old' cats (person/airplane), odd add tv/toothbrush
        cat_ids = [1, 5] if i % 2 == 0 else [72, 90, 1]
        for cid in cat_ids:
            annotations.append(
                {"id": aid, "image_id": 100 + i, "category_id": cid,
                 "bbox": [5 + aid % 10, 5, 30, 25], "iscrowd": 0, "area": 750}
            )
            aid += 1
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(
        {"images": images, "annotations": annotations, "categories": cats}
    ))
    return str(ann_file), str(img_dir)


def test_coco_source_train_filters_old(coco_root):
    ann, imgs = coco_root
    # old = first 2 in coco-id order (person=1, airplane=5); new = next 2
    src = COCODataSource(ann, imgs, is_train=True,
                         num_old_categories=2, num_new_categories=2)
    assert len(src) == 3  # only odd images contain tv/toothbrush
    for i in range(len(src)):
        rec = src.annotation(i)
        names = {COCO_CATS[l - 1] for l in rec["labels"]}
        assert names <= {"tv", "toothbrush"}  # old-class anns filtered
        assert rec["boxes"].shape[1] == 4
    img = src.load_image(0)
    assert img.shape == (64, 96, 3)


def test_coco_source_test_keeps_all(coco_root):
    ann, imgs = coco_root
    src = COCODataSource(ann, imgs, is_train=False,
                         num_old_categories=2, num_new_categories=2)
    assert len(src) == 6
    all_names = set()
    for i in range(len(src)):
        rec = src.annotation(i)
        all_names |= {COCO_CATS[l - 1] for l in rec["labels"]}
    assert all_names == {"person", "airplane", "tv", "toothbrush"}


def test_alpha_label_mapping():
    assert CAT_TO_ALPHA_LABEL["airplane"] == 1
    assert CAT_TO_ALPHA_LABEL["zebra"] == 80


def test_coco_eval_perfect():
    gt = [{"boxes": np.array([[10.0, 10, 50, 50]]), "labels": np.array([1])}]
    pred = [{"boxes": np.array([[10.0, 10, 50, 50]]), "labels": np.array([1]),
             "scores": np.array([0.9])}]
    res = eval_detection_coco(pred, gt)
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_coco_eval_localization_quality():
    # a detection with IoU ~0.6: counts at .5/.55/.6 but not .75 → AP in (0,1)
    gt = [{"boxes": np.array([[0.0, 0, 100, 100]]), "labels": np.array([1])}]
    pred = [{"boxes": np.array([[0.0, 0, 100, 60]]), "labels": np.array([1]),
             "scores": np.array([0.9])}]
    res = eval_detection_coco(pred, gt)
    assert 0.0 < res["AP"] < 1.0
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP75"] == 0.0


def test_check_expected_results_gate():
    res = {"AP": 0.5}
    check_expected_results(res, [("AP", 0.52, 0.02)], sigma_tol=2)
    with pytest.raises(AssertionError):
        check_expected_results(res, [("AP", 0.6, 0.01)], sigma_tol=4)
