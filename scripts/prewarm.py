"""Pre-compile the standard bucket programs into the on-disk JAX cache.

Run once per deployment (or after changing model/options); subsequent
basecall processes start with warm compile caches, cutting the cold
~200-300 s bucket-compilation warmup to cache-load time.

Usage: python scripts/prewarm.py [bucket,lengths,csv] [read_batch]
Defaults match bench.py's configuration (bf16 forward, synthetic LM,
quantum-1024 buckets of the bundled 5-read set).
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

import jax
import jax.numpy as jnp
import numpy as np

# bench.py's bucket set: the bundled read lengths (12833/4863/11388/
# 14799/9905) rounded to the 1024 quantum
DEFAULT_BUCKETS = (5120, 10240, 12288, 13312, 15360)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from radian_tpu.lm import build_dense_tables, random_kmer_model
    from radian_tpu.models import build_model, init_params
    from radian_tpu.pipeline import Basecaller, BasecallOptions

    buckets = (
        tuple(int(x) for x in sys.argv[1].split(","))
        if len(sys.argv) > 1 else DEFAULT_BUCKETS
    )
    read_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"devices: {jax.devices()}")
    print(f"prewarming buckets {buckets} at read_batch={read_batch}")

    params = init_params(build_model(), jax.random.PRNGKey(0))
    lm = build_dense_tables(
        random_kmer_model(np.random.default_rng(42), context_len=11,
                          n_contexts=200_000, concentration=0.2),
        11,
    )
    bc = Basecaller(
        params, lm=lm, compute_dtype=jnp.bfloat16,
        options=BasecallOptions(read_batch=read_batch,
                                bucket_quantum=1024,
                                bucket_lengths=buckets),
    )
    t0 = time.perf_counter()
    bc.warmup()
    t1 = time.perf_counter() - t0
    # second pass = pure cache-hit dispatch cost
    t0 = time.perf_counter()
    bc.warmup()
    t2 = time.perf_counter() - t0
    print(f"warmup: first pass {t1:.1f}s, second (all-warm) {t2:.1f}s")


if __name__ == "__main__":
    main()
