from .transformer import (  # noqa: F401
    MultiHeadAttention,
    PositionwiseFeedForward,
    EncoderLayer,
    DecoderLayer,
    PositionalEncoding,
    TransformerEncoder,
    TransformerDecoder,
)
from .resnet_se import SELayer, SEBasicBlock, SEBottleneck, ResNetSE  # noqa: F401
from .tcn import TemporalConvNet  # noqa: F401
