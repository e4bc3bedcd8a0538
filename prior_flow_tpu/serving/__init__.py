"""Serving subsystem: AOT compilation and portable StableHLO export of the
inference forward (capability beyond the reference, which has no serving
layer — SURVEY.md §1)."""

from .export import (aot_compile, export_forward, exported_summary,
                     load_exported, make_forward, save_exported)

__all__ = [
    "aot_compile",
    "export_forward",
    "exported_summary",
    "load_exported",
    "make_forward",
    "save_exported",
]
