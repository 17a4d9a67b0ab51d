from radian_tpu.ops.preprocess import (  # noqa: F401
    mad_normalise,
    mad_normalise_np,
    get_windows_np,
    preprocess_read,
    bucket_length,
)
