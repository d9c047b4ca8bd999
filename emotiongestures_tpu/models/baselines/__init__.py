from .seq2seq import Seq2SeqNet  # noqa: F401
from .speech2gesture import (  # noqa: F401
    S2GGenerator,
    S2GDiscriminator,
)
from .trimodal import (  # noqa: F401
    WavEncoder,
    TextEncoderTCN32,
    PoseGenerator,
    TrimodalDiscriminator,
    ConvDiscriminator,
)
from .hierarchy import (  # noqa: F401
    HierarchicalWavEncoder,
    HierarchicalPoseGenerator,
    HierarchicalDiscriminator,
    HierarchicalConvDiscriminator,
)
from .embedding_net import EmbeddingNet, PoseEncoderConv  # noqa: F401
from .motion_ae import MotionAE  # noqa: F401
