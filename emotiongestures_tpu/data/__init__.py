from .synthetic import SyntheticGestureDataset, make_batch  # noqa: F401
from .codec import encode_record, decode_record  # noqa: F401
from .store import GestureStore, GestureStoreWriter  # noqa: F401
from .vocab import Vocab  # noqa: F401
from .expressive_constants import (  # noqa: F401
    EXPRESSIVE_MEAN_DIR_VEC,
    EXPRESSIVE_MEAN_POSE,
)
