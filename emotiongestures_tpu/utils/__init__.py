from .logging import set_logger  # noqa: F401
from .checkpoint import (AsyncSaver, GracefulShutdown, latest_step,  # noqa: F401
                         load_checkpoint, save_checkpoint)
