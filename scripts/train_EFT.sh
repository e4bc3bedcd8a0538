#!/bin/bash
# Canonical EFT training recipe (reference scripts/train_EFT.sh:1-9):
# 60k steps, batch 4, lr 1e-4, wdecay 1e-4, mixed precision, init from
# upstream-RAFT FlyingThings weights. DataParallel over 2 GPUs becomes SPMD
# over the available TPU mesh automatically.
python -m prior_flow_tpu.cli.train \
    --project_name PriOr-Flow --name EFT --stage EFT --preset \
    --mixed_precision \
    --restore_ckpt ${RAFT_THINGS_CKPT:-raft-things.pth} \
    --validation EFT \
    --save_path ${SAVE_PATH:-./checkpoints/EFT} \
    --data_root ${DATA_ROOT:?set DATA_ROOT to the MPF dataset root} "$@"
