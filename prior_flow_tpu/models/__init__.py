from .prior_raft import PriOrRAFT, StepConsts, upsample_flow_convex

__all__ = ["PriOrRAFT", "StepConsts", "upsample_flow_convex"]
