"""Diagnose where bench.py's warmup time goes (VERDICT r3 task 3).

Per bucket program: local persistent-cache hit/miss (jax DEBUG logs) and
wall time of the first execution.  Run with an idle tunnel.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/diag_warmup.py
"""

import logging
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
for name in ("jax._src.compilation_cache", "jax._src.compiler"):
    logging.getLogger(name).setLevel(logging.DEBUG)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    # log every compile with reason
    jax.config.update("jax_log_compiles", True)

    from radian_tpu.io import iter_fast5_reads
    from radian_tpu.lm import build_dense_tables, random_kmer_model
    from radian_tpu.models import build_model, init_params
    from radian_tpu.pipeline import Basecaller, BasecallOptions

    t_start = time.perf_counter()
    log(f"devices: {jax.devices()}")
    log(f"[{time.perf_counter()-t_start:6.1f}s] backend up")

    reads = sorted(
        iter_fast5_reads("/root/reference/radian/data/reads.fast5"),
        key=lambda r: r.read_id,
    )
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    lm_rng = np.random.default_rng(42)
    lm = build_dense_tables(
        random_kmer_model(lm_rng, context_len=11, n_contexts=200_000,
                          concentration=0.2),
        11,
    )
    log(f"[{time.perf_counter()-t_start:6.1f}s] host setup done")

    bc = Basecaller(
        params, lm=lm, compute_dtype=jnp.bfloat16,
        options=BasecallOptions(read_batch=256, bucket_quantum=1024),
    )
    log(f"[{time.perf_counter()-t_start:6.1f}s] Basecaller built "
        f"(LM tables as jnp arrays — upload may be lazy)")

    # force the LM upload before any program runs, timed separately
    t0 = time.perf_counter()
    s = float(jnp.sum(bc._lm_t1).block_until_ready())
    log(f"[{time.perf_counter()-t_start:6.1f}s] LM table sync "
        f"({time.perf_counter()-t0:.1f}s, sum={s:.3e}, "
        f"{bc._lm_t1.nbytes/1e6:.1f} MB)")

    # params upload
    t0 = time.perf_counter()
    _ = float(jnp.sum(bc.params['dense2']['kernel']
                      if 'dense2' in bc.params else
                      jax.tree.leaves(bc.params)[0]).block_until_ready())
    log(f"[{time.perf_counter()-t_start:6.1f}s] params sync "
        f"({time.perf_counter()-t0:.1f}s)")

    lens = sorted({len(r.signal) for r in reads})
    for n in lens:
        sig = np.zeros(n, np.int16)
        sig[::2] = 100
        t0 = time.perf_counter()
        bc.basecall_signals([sig])
        log(f"[{time.perf_counter()-t_start:6.1f}s] bucket {n} "
            f"first call: {time.perf_counter()-t0:.1f}s")
    # second pass: everything warm in-process
    for n in lens:
        sig = np.zeros(n, np.int16)
        sig[::2] = 100
        t0 = time.perf_counter()
        bc.basecall_signals([sig])
        log(f"[{time.perf_counter()-t_start:6.1f}s] bucket {n} "
            f"second call: {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
