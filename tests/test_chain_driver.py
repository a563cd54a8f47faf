"""Unit tests for tools/run_fullscale_chain.py — the multi-step chain
harness (reference workflow: scripts/run_JT.sh + run_firststep.sh +
run_MI.sh chained by hand).

Covers the two pieces of driver logic that a full-scale run exercises
only after hours of TPU time: the workdir config rewrite (step-1 source
paths must point at the chain's OWN first task, not the reference's
shared-first-task location, e.g. 10-5 -> output/10-10/, reference
configs/voc/10-5/e2e_faster_rcnn_R_50_C4_4x_RB_Target_model.yaml:3-4)
and the stamp-based --resume stage skipping.
"""

import argparse
import importlib.util
import os
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "run_fullscale_chain", os.path.join(REPO, "tools", "run_fullscale_chain.py"))
chain = importlib.util.module_from_spec(spec)
spec.loader.exec_module(chain)


def _args(task="10-5", **kw):
    d = dict(task=task, steps=2, workdir=None, jt_iters=12, first_iters=6,
             inc_iters=6, batch=2, memory_buffer=8, memory_type="mean",
             synth_images=8, skip_jt=False, resume=False, skip_ft=False)
    d.update(kw)
    return argparse.Namespace(**d)


def test_write_configs_repoints_source_at_own_first_task(tmp_path):
    """10-5's repo target configs point at output/10-10/ (the reference's
    shared first task); the chain trains its own first task under
    output/10-5/, so the workdir copies must be rewritten to match."""
    wd = str(tmp_path)
    chain.write_configs(_args("10-5"), wd)

    first = yaml.safe_load(open(os.path.join(
        wd, "configs/voc/10-5/e2e_faster_rcnn_R_50_C4_4x.yaml")))
    first_out = first["OUTPUT_DIR"]
    assert "10-5" in first_out and "10-10" not in first_out

    for name in ("e2e_faster_rcnn_R_50_C4_4x_RB_Target_model.yaml",
                 "e2e_faster_rcnn_R_50_C4_4x_Target_model.yaml"):
        tgt = yaml.safe_load(open(os.path.join(wd, "configs/voc/10-5", name)))
        assert tgt["MODEL"]["WEIGHT"] == os.path.join(
            first_out, "model_trimmed.msgpack")
        assert tgt["MODEL"]["SOURCE_WEIGHT"] == os.path.join(
            first_out, "model_final.msgpack")
        # solver surgery applied to the workdir copy
        assert tgt["SOLVER"]["MAX_ITER"] == 6
        assert tgt["DATASETS"]["TRAIN"] == ["voc_rb_synthetic_train"]

    # first task is seeded from the JT trimmed checkpoint
    assert first["MODEL"]["WEIGHT"].endswith("model_trimmed.msgpack")


def test_run_stage_writes_stamp_and_resume_skips(tmp_path):
    wd = str(tmp_path)
    marker = os.path.join(wd, "ran.txt")
    cmd = [sys.executable, "-c",
           f"open(r'{marker}', 'a').write('x')"]

    chain.run_stage("s1", cmd, wd, dict(os.environ), resume=False)
    assert os.path.exists(os.path.join(wd, ".done_s1"))
    assert open(marker).read() == "x"

    # resume: stamped stage is skipped, command not re-run
    dt = chain.run_stage("s1", cmd, wd, dict(os.environ), resume=True)
    assert dt == 0.0
    assert open(marker).read() == "x"

    # without --resume the stage re-runs even when stamped
    chain.run_stage("s1", cmd, wd, dict(os.environ), resume=False)
    assert open(marker).read() == "xx"


def test_run_stage_failure_exits_without_stamp(tmp_path):
    wd = str(tmp_path)
    cmd = [sys.executable, "-c", "import sys; sys.exit(3)"]
    with pytest.raises(SystemExit):
        chain.run_stage("bad", cmd, wd, dict(os.environ), resume=True)
    assert not os.path.exists(os.path.join(wd, ".done_bad"))
