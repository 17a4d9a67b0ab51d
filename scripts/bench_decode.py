"""Microbenchmark the XLA scan beam-search decoder on the real chip.

Usage: python scripts/bench_decode.py [T] [config ...]
Each config is N:lm:unroll, e.g. 128:1:4.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

import jax
import jax.numpy as jnp
import numpy as np

from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.ops.beam_search import beam_search_batch


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    configs = sys.argv[2:] or ["40:1:4", "128:1:4", "256:1:4", "512:1:4"]
    print(f"devices: {jax.devices()}  T={t_len}", flush=True)

    rng = np.random.default_rng(0)
    lm = build_dense_tables(
        random_kmer_model(rng, context_len=11, n_contexts=200_000,
                          concentration=0.2), 11)
    lm_probs = jnp.asarray(lm.probs)
    lm_ent = jnp.asarray(lm.entropy)
    sum1 = jax.jit(lambda x: x.sum())

    for cfg in configs:
        n, lm_on, unroll = (int(x) for x in cfg.split(":"))
        mats = rng.dirichlet(np.full(5, 0.3), size=(n, t_len)).astype(
            np.float32)
        mats_d = jnp.asarray(mats)
        lens = jnp.full((n,), t_len, jnp.int32)

        def run():
            out = beam_search_batch(
                mats_d, lens, beam_width=6,
                lm_probs=lm_probs, lm_ent=lm_ent,
                lm_enabled=bool(lm_on), unroll=unroll)
            np.asarray(sum1(out[1]))
            return out

        t0 = time.perf_counter()
        run()
        compile_t = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        print(f"N={n:4d} lm={lm_on} unroll={unroll}: "
              f"{best*1e3:8.1f} ms  {best/t_len*1e6:7.1f} us/step  "
              f"{best/t_len/n*1e9:7.1f} ns/read-step  "
              f"(compile {compile_t:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
