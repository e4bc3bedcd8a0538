from .prior_raft import PriOrRAFT, StepConsts, upsample_flow_convex
from .raft import RAFT, corr_block_lookup

__all__ = ["PriOrRAFT", "StepConsts", "upsample_flow_convex", "RAFT",
           "corr_block_lookup"]
