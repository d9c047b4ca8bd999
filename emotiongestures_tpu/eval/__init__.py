from .fgd import (  # noqa: F401
    calculate_frechet_distance,
    calculate_activation_statistics,
    diversity_score,
    frechet_from_features,
)
from .beat import BeatAligner  # noqa: F401
from .metrics import (  # noqa: F401
    l2_distance_pose,
    mpjre,
    compute_acc,
    AverageMeter,
)
