from trigenicinteractionpredictor_tpu.parallel.mesh import make_mesh  # noqa: F401
from trigenicinteractionpredictor_tpu.parallel.sharded_em import (  # noqa: F401
    make_sharded_train_step,
    shard_batch,
)
