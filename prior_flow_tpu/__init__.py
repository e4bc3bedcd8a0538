"""PriOr-Flow TPU — a TPU-native (JAX/XLA/Pallas) framework for panoramic
optical flow with the capabilities of the reference PriOr-Flow (ICCV 2025).

The package is organised bottom-up:

- ``geometry``   — ERP <-> sphere coordinate algebra, spherical rotation grids
                   (reference: PriOr-RAFT/core/utils/projection_prim_ortho.py)
- ``ops``        — samplers, correlation volumes, DCCL lookup, warps
                   (reference: core/utils/my_cycle_sample.py, core/corr.py)
- ``nn``         — Flax neural modules: encoders, ConvGRU update blocks
                   (reference: core/extractor.py, core/update.py)
- ``models``     — the PriOr-RAFT dual-branch recurrent flow model
                   (reference: core/prior_raft.py)
- ``checkpoint`` — PyTorch ``.pth`` -> JAX converter + Orbax train state I/O
- ``data``       — flow-file I/O, 360° + perspective datasets, augmentors
- ``train``      — latitude-weighted sequence loss, optimizer, train loop
- ``eval``       — EPE / SEPE (great-circle) validators incl. per-region
- ``parallel``   — device mesh + sharded train/eval step builders
- ``utils``      — flow visualisation, padding, logging, profiling
"""

__version__ = "0.1.0"
