"""Standalone profiling tools (run directly on the chip)."""
