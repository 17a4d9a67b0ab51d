from radian_tpu.models.sig2seq import (  # noqa: F401
    SigToSeq,
    build_model,
    init_params,
    param_count,
)
