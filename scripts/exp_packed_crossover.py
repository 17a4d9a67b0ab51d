"""Packed-vs-dense LM crossover sweep: N × packed size (VERDICT r3 #7).

The round-3 crossover (3 MB) rested on three datapoints at N=256.  This
sweeps the production decoder at N ∈ {64, 128, 256, 512} × packed table
sizes {~1.4, ~2.0, ~3.2, ~5.0 MB} against the dense 84 MB layout at the
same N, recording µs/step for each cell.  The packed threshold in
``radian_tpu/pipeline.py`` (PACKED_LM_MAX_BYTES) is backed by this
table.

Usage: PYTHONPATH=... python scripts/exp_packed_crossover.py [T]
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.ops.beam_search import beam_search_batch


def bench(fn, t_len):
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

    # dense baseline tables (84 MB)
    p = rng.random((4 ** 11, 4), np.float32) + 1e-3
    p /= p.sum(-1, keepdims=True)
    dense_p = jnp.asarray(p)
    dense_e = jnp.asarray(-(p * np.log(p)).sum(-1))

    packed = {}
    for n_ctx in (20_000, 50_000, 110_000, 200_000):
        lm = build_dense_tables(
            random_kmer_model(rng, context_len=11, n_contexts=n_ctx,
                              concentration=0.2), 11)
        l1, vals = lm.compressed()
        packed[n_ctx] = (
            jnp.asarray(l1), jnp.asarray(vals),
            (l1.nbytes + vals.nbytes) / 1e6,
        )

    table = {}
    for n in (64, 128, 256, 512):
        mats, lens = mats_for(n)
        dense_us = bench(
            lambda: beam_search_batch(
                mats, lens, lm_probs=dense_p, lm_ent=dense_e,
                lm_enabled=True, ctx_len=11),
            t_len,
        )
        table[f"N{n}_dense"] = round(dense_us, 2)
        print(f"N={n:4d} dense  84.0 MB  {dense_us:6.2f} us/step",
              flush=True)
        for n_ctx, (l1j, valsj, mb) in packed.items():
            us = bench(
                lambda: beam_search_batch(
                    mats, lens, lm_l1=l1j, lm_vals=valsj,
                    lm_enabled=True, ctx_len=11),
                t_len,
            )
            table[f"N{n}_packed_{n_ctx}"] = round(us, 2)
            win = "WIN " if us < dense_us else "lose"
            print(f"N={n:4d} packed {mb:5.1f} MB  {us:6.2f} us/step  "
                  f"[{win}]", flush=True)

    out = Path("bench_data/packed_crossover.json")
    out.write_text(json.dumps(
        {"t_len": t_len, "us_per_step": table}, indent=2))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
