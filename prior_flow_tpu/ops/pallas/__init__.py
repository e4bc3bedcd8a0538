from .dccl_lookup import dccl_level_lookup_pallas

__all__ = ["dccl_level_lookup_pallas"]
