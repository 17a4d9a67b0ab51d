"""Head-to-head: Pallas beam-search kernel vs the batch-minor XLA scan
(no-LM path) at matched shapes, on the real chip."""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

import jax
import jax.numpy as jnp
import numpy as np

from radian_tpu.ops.beam_pallas import beam_search_pallas
from radian_tpu.ops.beam_search import beam_search_batch


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ns = [int(x) for x in sys.argv[2:]] or [128, 256]
    print(f"devices: {jax.devices()}  T={t_len}", flush=True)
    rng = np.random.default_rng(0)
    sum1 = jax.jit(lambda x: x.sum())

    for n in ns:
        mats = rng.dirichlet(np.full(5, 0.3), size=(n, t_len)).astype(
            np.float32)
        mats_d = jnp.asarray(mats)
        lens = jnp.full((n,), t_len, jnp.int32)
        for tag, fn in (
            ("scan", lambda: beam_search_batch(mats_d, lens, beam_width=6)),
            ("pallas", lambda: beam_search_pallas(mats_d, lens,
                                                  beam_width=6)),
        ):
            out = fn()
            np.asarray(sum1(out[1]))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn()
                np.asarray(sum1(out[1]))
                best = min(best, time.perf_counter() - t0)
            print(f"N={n:4d} {tag:7s} {best*1e3:8.1f} ms "
                  f"{best/t_len*1e6:6.1f} us/step "
                  f"{best/t_len/n*1e9:6.1f} ns/read-step", flush=True)


if __name__ == "__main__":
    main()
