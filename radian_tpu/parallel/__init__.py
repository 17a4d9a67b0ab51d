from radian_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated_sharding,
    param_shardings,
)
