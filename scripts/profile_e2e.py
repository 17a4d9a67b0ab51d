"""Profile the e2e basecall split (prep+model vs assemble+decode) on TPU.

Usage: python scripts/profile_e2e.py [read_batch] [dtype] [replicas]
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

from radian_tpu.io import iter_fast5_reads
from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.models import build_model, init_params
from radian_tpu.pipeline import Basecaller, BasecallOptions


def main():
    read_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    dtype = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") \
        else jnp.float32
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else None
    prep_mode = sys.argv[4] if len(sys.argv) > 4 else "auto"
    if replicas is None:
        replicas = max(1, read_batch // 5)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    print(f"devices: {jax.devices()}  read_batch={read_batch} "
          f"dtype={dtype.__name__} replicas={replicas}", flush=True)

    reads = sorted(iter_fast5_reads(
        "/root/reference/radian/data/reads.fast5"), key=lambda r: r.read_id)
    signals = [r.signal for r in reads] * replicas

    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    lm_rng = np.random.default_rng(42)
    lm = build_dense_tables(
        random_kmer_model(lm_rng, context_len=11, n_contexts=200_000,
                          concentration=0.2), 11)
    bc = Basecaller(params, lm=lm, compute_dtype=dtype,
                    options=BasecallOptions(read_batch=read_batch,
                                            bucket_quantum=16384,
                                            prep_mode=prep_mode))

    # build one padded batch directly (same shapes as bench single bucket)
    o = bc.options
    bucket = 16384
    n = o.read_batch
    padded = np.zeros((n, bucket), np.float32)
    lengths = np.zeros(n, np.int32)
    for j in range(n):
        sig = signals[j % len(signals)]
        padded[j, : len(sig)] = sig
        lengths[j] = len(sig)
    from radian_tpu.ops.preprocess import max_windows_for
    max_w = max_windows_for(bucket, o.chunk_len, o.step_size)
    padded = jnp.asarray(padded)
    lengths = jnp.asarray(lengths)

    # axon's block_until_ready returns before remote execution finishes;
    # a host fetch of a device-reduced scalar is the only real sync
    sum1 = jax.jit(lambda x: x.sum())

    if bc.use_fullread:
        def run_prep():
            out = bc._prep_fullread(bc.params, padded, lengths)
            np.asarray(sum1(out[0]))
            return out
    elif bc.use_strips:
        def run_prep():
            out = bc._prep_strips(bc.params, padded, lengths,
                                  n_strips=bucket // o.step_size)
            np.asarray(sum1(out[0]))
            return out
    else:
        def run_prep():
            out = bc._prep(bc.params, padded, lengths, max_windows=max_w)
            np.asarray(sum1(out[0]))
            return out

    t0 = time.perf_counter()
    prep_out = run_prep()
    print(f"prep+model compile+run: {time.perf_counter()-t0:.1f}s "
          f"(fullread={bc.use_fullread} strips={bc.use_strips})", flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        prep_out = run_prep()
        prep_t = time.perf_counter() - t0
    print(f"prep+model steady: {prep_t*1e3:.0f} ms", flush=True)

    if bc.use_fullread or bc.use_strips:
        mats, t_reads, _ = prep_out

        def run_dec():
            out = bc._decode_assembled(mats, t_reads, bc._lm_t1,
                                       bc._lm_t2)
            np.asarray(sum1(out[1]))
            return out
    else:
        probs, n_wins, pad_ends, mads = prep_out

        def run_dec():
            out = bc._global_decode(probs, n_wins, pad_ends, bc._lm_t1,
                                    bc._lm_t2, out_len=bucket)
            np.asarray(sum1(out[1]))
            return out

    t0 = time.perf_counter()
    run_dec()
    print(f"decode compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        run_dec()
        dec_t = time.perf_counter() - t0
    print(f"assemble+decode steady: {dec_t*1e3:.0f} ms "
          f"({dec_t/bucket*1e6:.0f} us/step)", flush=True)

    total = prep_t + dec_t
    print(f"total {total*1e3:.0f} ms for {n} reads -> "
          f"{n/total:.1f} reads/s (prep {prep_t/total:.0%}, "
          f"decode {dec_t/total:.0%})", flush=True)


if __name__ == "__main__":
    main()
