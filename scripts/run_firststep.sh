#!/bin/bash
# First task training + Prototype Box Selection.
# (reference: scripts/run_firststep.sh — no torch.distributed.launch:
# the TPU build is single-process SPMD over the whole mesh)
set -e
task=${task:-15-5}
name=${name:-ABR}
mb=${mb:-2000}
mt=${mt:-mean}

#### 1. Train the First Task ####
python tools/train_first_step.py -c configs/voc/${task}/e2e_faster_rcnn_R_50_C4_4x.yaml

#### 2. Prototype Box Selection (PBS) ####
python tools/prototype_box_selection.py -n ${name} -t ${task} -s 0 -mb ${mb} -mt ${mt} -iss
