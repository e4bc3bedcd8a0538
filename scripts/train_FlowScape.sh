#!/bin/bash
# Canonical FlowScape recipe (reference scripts/train_FlowScape.sh:1-9):
# 100k steps, batch 6, lr 1e-4, wdecay 1e-4, mixed precision.
python -m prior_flow_tpu.cli.train \
    --project_name PriOr-Flow --name FlowScape --stage FlowScape --preset \
    --mixed_precision \
    --restore_ckpt ${RAFT_THINGS_CKPT:-raft-things.pth} \
    --validation FlowScape \
    --save_path ${SAVE_PATH:-./checkpoints/FlowScape} \
    --data_root ${DATA_ROOT:?set DATA_ROOT to the FlowScape root} "$@"
