"""Serving subsystem: AOT compilation and portable StableHLO export of the
inference forward (capability beyond the reference, which has no serving
layer — SURVEY.md §1).

Deployment guidance (measured, docs/ARCHITECTURE.md §7): run batch 1 per
chip and scale streams across chips on the data mesh — batching within a
chip RAISES per-pair cost (~8% at batch 2-4 at 512x1024; the 4x
correlation-volume working set outweighs conv amortisation). Latency-
sensitive video serving can opt into fewer GRU iterations with warm-start
chaining (`cli/video.py --warm_start --iters N`; 12 -> 4 iterations
measured 9.4 -> 18.0 pairs/s); the 12-iteration parity protocol stays the
default."""

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
