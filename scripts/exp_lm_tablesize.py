"""Real-decoder LM gather cost: table-size and batch-size sweep.

Runs the production ``beam_search_batch`` (identical op graph throughout)
while varying only (a) the dense table's row count via ``ctx_len`` and
(b) the read batch N.  Separates the two candidate cost models for the
per-step HBM gather:

- request-count-bound: cost tracks W*N and is flat in table size
- working-set-bound:   cost tracks table bytes (HBM row locality)

Usage: python scripts/exp_lm_tablesize.py [T]
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

sys.path.insert(0, str(Path(__file__).parent.parent))

from radian_tpu.ops.beam_search import beam_search_batch  # noqa: E402


def bench(fn, t_len):
    # sync by materialising a scalar on host: block_until_ready alone
    # does not actually wait through the axon tunnel
    sum1 = jax.jit(lambda x: x[1].sum() + x[2].sum())

    def sync():
        return float(np.asarray(sum1(fn())))

    sync()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync()
        best = min(best, time.perf_counter() - t0)
    return best / t_len * 1e6


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    print(f"devices: {jax.devices()} T={t_len}", flush=True)
    rng = np.random.default_rng(0)

    def mats_for(n):
        m = rng.random((n, t_len, 5), np.float32) + 1e-3
        m /= m.sum(-1, keepdims=True)
        return jnp.asarray(m), jnp.full((n,), t_len, jnp.int32)

    def lm_for(ctx_len):
        rows = 4**ctx_len
        p = rng.random((rows, 4), np.float32) + 1e-3
        p /= p.sum(-1, keepdims=True)
        ent = -(p * np.log(p)).sum(-1)
        return jnp.asarray(p), jnp.asarray(ent)

    # table-size sweep at N=256
    mats, lens = mats_for(256)
    for ctx_len in (11, 9, 7, 5, 2):
        probs, ent = lm_for(ctx_len)
        mb = probs.size * 4 / 1e6
        us = bench(
            lambda: beam_search_batch(
                mats, lens, lm_probs=probs, lm_ent=ent,
                lm_enabled=True, ctx_len=ctx_len),
            t_len,
        )
        print(f"ctx_len={ctx_len:2d} ({mb:8.1f} MB) N=256  "
              f"{us:6.2f} us/step", flush=True)

    # batch sweep at ctx_len=11
    probs, ent = lm_for(11)
    for n in (64, 128, 256, 512):
        mats, lens = mats_for(n)
        us = bench(
            lambda: beam_search_batch(
                mats, lens, lm_probs=probs, lm_ent=ent,
                lm_enabled=True, ctx_len=11),
            t_len,
        )
        print(f"ctx_len=11 N={n:4d}  {us:6.2f} us/step "
              f"({us / n * 1e3:6.1f} ns/read-step)", flush=True)

    # packed sparse tables (KmerLM.compressed) at bench-like sparsity
    from radian_tpu.lm import build_dense_tables, random_kmer_model

    mats, lens = mats_for(256)
    for n_ctx in (200_000, 20_000):
        lm = build_dense_tables(
            random_kmer_model(rng, context_len=11, n_contexts=n_ctx,
                              concentration=0.2), 11)
        l1, vals = lm.compressed()
        l1j, valsj = jnp.asarray(l1), jnp.asarray(vals)
        mb = (l1.nbytes + vals.nbytes) / 1e6
        us = bench(
            lambda: beam_search_batch(
                mats, lens, lm_l1=l1j, lm_vals=valsj,
                lm_enabled=True, ctx_len=11),
            t_len,
        )
        print(f"packed {n_ctx:7d} ctx ({mb:5.1f} MB) N=256  "
              f"{us:6.2f} us/step", flush=True)

    # no-LM floors
    for n in (256,):
        mats, lens = mats_for(n)
        us = bench(lambda: beam_search_batch(mats, lens, lm_enabled=False),
                   t_len)
        print(f"no-LM       N={n:4d}  {us:6.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
