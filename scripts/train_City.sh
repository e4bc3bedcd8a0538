#!/bin/bash
# Canonical City training recipe (reference scripts/train_City.sh:1-9).
python -m prior_flow_tpu.cli.train \
    --project_name PriOr-Flow --name City --stage City --preset \
    --mixed_precision \
    --restore_ckpt ${RAFT_THINGS_CKPT:-raft-things.pth} \
    --validation City \
    --save_path ${SAVE_PATH:-./checkpoints/City} \
    --data_root ${DATA_ROOT:?set DATA_ROOT to the MPF dataset root} "$@"
