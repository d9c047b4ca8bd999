from .generator import (  # noqa: F401
    AudioConvEncoder,
    AudioResNetEncoder,
    TextEncoderTCN,
    PriorConvEncoder,
    PriorMemoryEncoder,
    SPMemoryV1,
    SPMemoryV2,
    TMMemory,
    GestureTransformer,
)
from .discriminator import MotionDiscriminator, PoseDiscriminator  # noqa: F401
from .emotion_net import EmotionNet, DisNet  # noqa: F401
from .skeleton_classifier import SkeletonTransformer  # noqa: F401
from .cvae import EmotionCVAEv1, EmotionCVAEv2, EmotionCVAEv3  # noqa: F401
from .fgd_ae import FGDAutoEncoder  # noqa: F401
