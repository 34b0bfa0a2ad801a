from pangu_tpu.parallel.mesh import (  # noqa: F401
    TOKEN_SPEC,
    activate_mesh,
    distributed_init,
    is_main,
    make_mesh,
    maybe_shard,
    record_shardings,
    resolve_mesh,
)
from pangu_tpu.parallel.sharding import (  # noqa: F401
    batch_spec,
    replicate_constraint,
    shard_batch,
    shard_params,
    zero_bytes_per_device,
    zero_constraint,
    zero_shard_opt_state,
)
