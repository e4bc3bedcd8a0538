from . import flow_viz, profiling
from .logger import JsonlSink, MetricLogger, StdoutSink, WandbSink
from .padder import InputPadder

__all__ = [
    "flow_viz",
    "profiling",
    "JsonlSink",
    "MetricLogger",
    "StdoutSink",
    "WandbSink",
    "InputPadder",
]
