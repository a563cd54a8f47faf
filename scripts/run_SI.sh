#!/bin/bash
# Single-incremental step (reference: scripts/run_SI.sh).
set -e
step=${step:-1}
task=${task:-15-5}
name=${name:-ABR_LR001_BS4_ALPHA05_BETA1_GAMMA1}

python tools/train_incremental.py -t ${task} -n ${name} -s ${step} \
    --feat ard -gamma 1.0 --uce --dist_type id -alpha 0.5 -beta 1.0 \
    -mb 2000 -mt mean
