from cosa_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    state_sharding,
    param_spec,
)
