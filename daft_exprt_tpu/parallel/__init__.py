from daft_exprt_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
)
from daft_exprt_tpu.parallel.train_step import (
    make_train_step, make_eval_step, make_learning_rate_fn, make_optimizer,
)
