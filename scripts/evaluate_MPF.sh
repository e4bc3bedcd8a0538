#!/bin/bash
# Evaluate on MPF EFT/City (reference scripts/evaluate_*.sh).
python -m prior_flow_tpu.cli.evaluate \
    --model ${MODEL:?set MODEL to a checkpoint path} \
    --dataset MPFDataset --scene ${SCENE:-EFT} \
    --data_root ${DATA_ROOT:?set DATA_ROOT} "$@"
