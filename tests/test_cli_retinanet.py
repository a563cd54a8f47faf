"""End-to-end CLI run of the single-stage RetinaNet family on synthetic
VOC: RETINANET_ON configs train and eval through the SAME tools as the
two-stage families (reference: RetinaNetModule runs inside the generic
GeneralizedRCNN trainer loop)."""

import os

import pytest
import yaml

from tests.test_cli_e2e import (
    FIRST_15, LAST_5, REPO, TINY_COMMON, _deep_merge, _run,
)

pytestmark = pytest.mark.slow  # compile-heavy tier


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("cli_retina")
    cfg_dir = wd / "configs" / "voc" / "15-5"
    cfg_dir.mkdir(parents=True)
    cfg = _deep_merge(TINY_COMMON, {
        "MODEL": {
            "RETINANET_ON": True,
            "RETINANET": {
                "NUM_CLASSES": 21,
                "ANCHOR_SIZES": [16, 32, 64, 128, 256],
                "ASPECT_RATIOS": [1.0],
                "SCALES_PER_OCTAVE": 2,
                "NUM_CONVS": 1,
            },
            "ROI_BOX_HEAD": {
                "NUM_CLASSES": 21,
                "NAME_OLD_CLASSES": [],
                "NAME_NEW_CLASSES": FIRST_15 + LAST_5,
                "NAME_EXCLUDED_CLASSES": [],
            },
        },
        "TPU": {"BACKBONE_STAGES": [1, 1, 1, 1], "RETINANET_CHANNELS": 16},
        "DATASETS": {"TRAIN": ["voc_rb_synthetic_train"],
                     "TEST": ["voc_synthetic_test"]},
        "OUTPUT_DIR": "output/retina/LR005_BS4",
    })
    (cfg_dir / "retinanet_tiny.yaml").write_text(yaml.safe_dump(cfg))
    return wd


def test_retinanet_trains_and_evals_through_cli(workdir):
    proc = _run(workdir, os.path.join(REPO, "tools", "train_first_step.py"),
                "-c", "configs/voc/15-5/retinanet_tiny.yaml")
    out = workdir / "output" / "retina" / "LR005_BS4"
    assert (out / "model_final.msgpack").exists()
    log = (out / "log.txt").read_text()
    assert "loss_retina_cls" in log and "loss_retina_reg" in log
    assert "mAP=" in log  # eval ran through the single-stage postprocessor
