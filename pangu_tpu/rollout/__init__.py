from pangu_tpu.rollout.autoregressive import (  # noqa: F401
    make_forecast_step,
    rollout_scan,
)
from pangu_tpu.rollout.engines import (  # noqa: F401
    ModelBundle,
    hierarchical_forecast,
    iterative_eval,
    multi_output_rollout,
    single_output_eval,
)
