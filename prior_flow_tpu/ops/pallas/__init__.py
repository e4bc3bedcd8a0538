from .dccl_gather import dccl_level_lookup, dccl_level_lookup_fused

__all__ = ["dccl_level_lookup", "dccl_level_lookup_fused"]
