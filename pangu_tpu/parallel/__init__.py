from pangu_tpu.parallel.mesh import (  # noqa: F401
    TOKEN_SPEC,
    activate_mesh,
    distributed_init,
    is_main,
    make_mesh,
    maybe_shard,
    record_shardings,
)
from pangu_tpu.parallel.sharding import (  # noqa: F401
    batch_spec,
    shard_batch,
    shard_params,
    zero_shard_opt_state,
)
