from .logging import set_logger  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint, latest_step  # noqa: F401
