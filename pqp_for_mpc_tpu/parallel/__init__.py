from pqp_for_mpc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
)
from pqp_for_mpc_tpu.parallel.sharded import (  # noqa: F401
    shard_batch,
    solve_row_sharded,
)
