"""Isolate the LM-gather cost in the scan decoder.

Variants: full 4^11 table, tiny (1-row) table (same op, cache-resident
operand), and padded 8-float rows (aligned gather).
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

from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.ops.beam_search import beam_search_batch


def timed(fn, sync):
    fn(); sync()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fn(); sync()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"devices: {jax.devices()}  T={t_len} N={n}", flush=True)

    rng = np.random.default_rng(0)
    lm = build_dense_tables(
        random_kmer_model(rng, context_len=11, n_contexts=200_000,
                          concentration=0.2), 11)
    mats = rng.dirichlet(np.full(5, 0.3), size=(n, t_len)).astype(np.float32)
    mats_d = jnp.asarray(mats)
    lens = jnp.full((n,), t_len, jnp.int32)
    sum1 = jax.jit(lambda x: x.sum())

    out = {}

    def run(tag, probs, ent):
        def fn():
            out["x"] = beam_search_batch(
                mats_d, lens, beam_width=6, lm_probs=probs, lm_ent=ent,
                lm_enabled=True)
        best = timed(fn, lambda: np.asarray(sum1(out["x"][1])))
        print(f"{tag:24s} {best*1e3:8.1f} ms  {best/t_len*1e6:6.1f} us/step",
              flush=True)

    run("full table", jnp.asarray(lm.probs), jnp.asarray(lm.entropy))
    run("tiny table (1 row)", jnp.asarray(lm.probs[:1]),
        jnp.asarray(lm.entropy[:1]))


if __name__ == "__main__":
    main()
