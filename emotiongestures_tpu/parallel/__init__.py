from .mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    tp_param_shardings,
    apply_shardings,
)
