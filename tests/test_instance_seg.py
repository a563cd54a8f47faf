import json

import numpy as np
import pytest

from abr_iod_tpu.data.voc2012_instance import VOC2012InstanceDataSource
from abr_iod_tpu.evaluation.voc_eval_inst import eval_instance_seg_voc, mask_iou


def test_mask_iou():
    a = np.zeros((1, 8, 8), bool)
    a[0, :4, :4] = True
    b = np.zeros((2, 8, 8), bool)
    b[0, :4, :4] = True
    b[1, 2:6, 2:6] = True
    iou = mask_iou(a, b)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(4 / (16 + 16 - 4))


def test_instance_eval_perfect_and_miss():
    m1 = np.zeros((16, 16), bool)
    m1[2:10, 2:10] = True
    m2 = np.zeros((16, 16), bool)
    m2[10:15, 10:15] = True
    gt = [{"masks": np.stack([m1, m2]), "labels": np.array([1, 1])}]
    pred = [{"masks": np.stack([m1]), "labels": np.array([1]),
             "scores": np.array([0.9])}]
    res = eval_instance_seg_voc(pred, gt)
    assert res["ap"][1] == pytest.approx(0.5)


def test_voc2012_instance_source(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(img_dir / "a.jpg")
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 32, "width": 48}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [4, 4, 20, 16], "iscrowd": 0, "area": 320,
             "segmentation": [[4, 4, 24, 4, 24, 20, 4, 20]]},
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    f = tmp_path / "ann.json"
    f.write_text(json.dumps(ann))
    src = VOC2012InstanceDataSource(str(f), str(img_dir), is_train=True,
                                    num_old_categories=0, num_new_categories=1)
    assert len(src) == 1
    rec = src.annotation(0)
    assert rec["masks"].shape == (1, 32, 48)
    assert rec["masks"][0, 10, 10]
    assert not rec["masks"][0, 30, 40]
