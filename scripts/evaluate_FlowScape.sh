#!/bin/bash
# Evaluate on FlowScape scenes (reference scripts/evaluate_FlowScape.sh).
python -m prior_flow_tpu.cli.evaluate \
    --model ${MODEL:?set MODEL to a checkpoint path} \
    --dataset FlowScape --scene ${SCENE:-sunny} \
    --data_root ${DATA_ROOT:?set DATA_ROOT} "$@"
