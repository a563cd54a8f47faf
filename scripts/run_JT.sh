#!/bin/bash
# Joint training over all 20 classes (reference: scripts/run_JT.sh).
set -e
python tools/train_first_step.py -c configs/voc/e2e_faster_rcnn_R_50_C4_4x_JT.yaml
