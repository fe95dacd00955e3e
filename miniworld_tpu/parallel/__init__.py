from miniworld_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    env_sharding,
    init_multihost,
    make_mesh,
    replicate,
    shard_env_batch,
)
from miniworld_tpu.parallel.train import make_train_step  # noqa: F401
