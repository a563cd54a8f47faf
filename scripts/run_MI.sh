#!/bin/bash
# Multi-incremental loop: train step s, then PBS for step s
# (reference: scripts/run_MI.sh — its `--feat afd` flags are accepted as
# an alias of `ard`, matching the intended behavior).
set -e
task=${task:-10-1}
name=${name:-ABR_LR002_BS4_ALPHA1_BETA1_GAMMA1}
mb=${mb:-2000}
mt=${mt:-mean}
steps=${steps:-10}

for s in $(seq 1 ${steps}); do
    python tools/train_incremental.py -t ${task} -n ${name} -s $s \
        --feat ard -gamma 1.0 --uce --dist_type id -alpha 1.0 -beta 1.0 \
        -mb ${mb} -mt ${mt}
    python tools/prototype_box_selection.py -n ${name} -t ${task} -s $s -mb ${mb} -mt ${mt} -iss
    echo Done
done
