from . import distributed  # noqa: F401
from .mesh import (  # noqa: F401
    apply_shardings,
    batch_sharding,
    dp_setup,
    make_mesh,
    replicate,
    replicate_state,
    resolve_num_devices,
    shard_batch,
    shard_state_tp,
    tp_param_shardings,
    tp_setup,
)
