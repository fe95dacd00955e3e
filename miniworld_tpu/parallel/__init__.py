from miniworld_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    env_sharding,
    init_multihost,
    make_mesh,
    replicate,
    shard_env_batch,
)
from miniworld_tpu.parallel.rollout import (  # noqa: F401
    make_sharded_rollout,
)
from miniworld_tpu.parallel.train import (  # noqa: F401
    make_ppo_step,
    make_train_step,
)
