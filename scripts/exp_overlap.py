"""Does the device queue starve between batches? (VERDICT r4 task 2)

A single TPU core executes XLA programs serially, so forward(k+1)
cannot overlap decode(k) in COMPUTE — the only overlap available is
host work (padding, upload, fetch) against device compute, which the
two-deep async dispatch already targets.  This experiment quantifies
how close the end-to-end wall is to the serial sum of warm device
program times:

    wall  ~=  sum_buckets(forward_t + decode_t)  + queue-starve gap

Measures, on the bench workload (5 buckets x read_batch reads):
  1. per-bucket warm forward and decode program times (device-synced)
  2. end-to-end ``basecall_signals`` wall (the production path)
and prints the gap.  Usage:

    python scripts/exp_overlap.py [read_batch ...]
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).parent.parent.absolute()
                          / "bench_data/.jax_cache"))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from radian_tpu.io import iter_fast5_reads
from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.models import build_model, init_params
from radian_tpu.pipeline import Basecaller, BasecallOptions

SYNC = jax.jit(lambda x: x.sum())


def sync(x):
    np.asarray(SYNC(x))


def run(read_batch: int):
    reads = sorted(iter_fast5_reads(
        "/root/reference/radian/data/reads.fast5"), key=lambda r: r.read_id)
    replicas = read_batch
    signals = [r.signal for r in reads] * replicas

    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    lm = build_dense_tables(
        random_kmer_model(np.random.default_rng(42), context_len=11,
                          n_contexts=200_000, concentration=0.2), 11)
    bc = Basecaller(params, lm=lm, compute_dtype=jnp.bfloat16,
                    options=BasecallOptions(read_batch=read_batch,
                                            bucket_quantum=1024))

    # warm + discover buckets
    bc.basecall_signals([r.signal for r in reads])

    # per-bucket warm program times (forward, decode), device-synced
    o = bc.options
    per_bucket = {}
    for r in reads:
        bucket = bc._bucket(len(r.signal))
        padded = np.zeros((read_batch, bucket), np.int16)
        lengths = np.full(read_batch, len(r.signal), np.int32)
        padded[:, : len(r.signal)] = r.signal
        dp, dl = jnp.asarray(padded), jnp.asarray(lengths)
        fwd_t = dec_t = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            mats, t_reads, mads = bc._prep_fullread(bc.params, dp, dl)
            sync(mats)
            fwd_t = min(fwd_t, time.perf_counter() - t0)
            t0 = time.perf_counter()
            rev, n_lab = bc._decode_assembled(
                mats, t_reads, bc._lm_t1, bc._lm_t2)
            sync(n_lab)
            dec_t = min(dec_t, time.perf_counter() - t0)
        per_bucket[bucket] = (fwd_t, dec_t)
        print(f"  bucket {bucket:6d}: forward {fwd_t*1e3:7.1f} ms  "
              f"decode {dec_t*1e3:7.1f} ms", flush=True)

    serial = sum(f + d for f, d in per_bucket.values())

    wall = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = bc.basecall_signals(signals)
        wall = min(wall, time.perf_counter() - t0)
    assert all(s is not None for s in out)

    n = len(signals)
    gap = wall - serial
    print(f"N={read_batch}: serial-sum {serial*1e3:.0f} ms, e2e wall "
          f"{wall*1e3:.0f} ms, gap {gap*1e3:+.0f} ms "
          f"({gap/wall:+.1%} of wall) -> {n/wall:.1f} reads/s", flush=True)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [256, 384, 512]
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jax.device_put(np.ones(4, np.float32)))
    for rb in batches:
        run(rb)


if __name__ == "__main__":
    main()
