#!/bin/bash
# Evaluate on MPF City (reference scripts/evaluate_City.sh:
#   python evaluate.py --model .../City-final.pth --dataset MPFDataset --scene City).
# Pass REGIONS=sd_uni to run the cos-weighted city-regions protocol instead
# (the reference's validate_city_regions path, evaluate.py:172-230).
if [ "${REGIONS:-}" = "sd_uni" ]; then
    python -m prior_flow_tpu.cli.evaluate \
        --model ${MODEL:?set MODEL to a checkpoint path} \
        --dataset City100 \
        --data_root ${DATA_ROOT:?set DATA_ROOT} "$@"
else
    python -m prior_flow_tpu.cli.evaluate \
        --model ${MODEL:?set MODEL to a checkpoint path} \
        --dataset MPFDataset --scene City \
        --data_root ${DATA_ROOT:?set DATA_ROOT} "$@"
fi
