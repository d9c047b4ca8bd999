from .state import TrainState, create_train_state  # noqa: F401
from . import classifier, cvae, fgd, gan, skeleton  # noqa: F401
