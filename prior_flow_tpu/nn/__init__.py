from .encoder import BasicEncoder, BottleneckBlock, ResidualBlock, SmallEncoder
from .update import (
    BasicMotionEncoder,
    BasicMultiMotionEncoder,
    BasicMultiUpdateBlock,
    BasicUpdateBlock,
    ConvGRU,
    FlowHead,
    SepConvGRU,
    SmallMotionEncoder,
    SmallUpdateBlock,
)

__all__ = [
    "BasicEncoder",
    "BottleneckBlock",
    "ResidualBlock",
    "SmallEncoder",
    "BasicMotionEncoder",
    "BasicMultiMotionEncoder",
    "BasicMultiUpdateBlock",
    "BasicUpdateBlock",
    "ConvGRU",
    "FlowHead",
    "SepConvGRU",
    "SmallMotionEncoder",
    "SmallUpdateBlock",
]
