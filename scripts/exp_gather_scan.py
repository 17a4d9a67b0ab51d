"""Isolate the per-step LM gather cost inside a lax.scan (decode-like).

Variants probe what the ~16 us/step fixed cost is made of: gather with
[W, N] vs flat [W*N] indices, with/without the moveaxis to batch-minor,
and a no-gather control.
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

W = 6


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"devices: {jax.devices()} T={t_len} N={n}", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((4**11, 5), np.float32))
    idx0 = jnp.asarray(rng.integers(0, 4**11, (W, n)).astype(np.int32))
    sum1 = jax.jit(lambda x: x.sum())

    def make(variant):
        @jax.jit
        def run(idx0):
            def step(idx, _):
                if variant == "none":
                    rows_sum = idx.astype(jnp.float32)[None]
                elif variant == "wn":
                    rows = table[idx]  # [W, N, 5]
                    rows_sum = rows.sum(-1)[None]
                elif variant == "wn_moveaxis":
                    rows = jnp.moveaxis(table[idx], -1, 0)  # [5, W, N]
                    rows_sum = rows.sum(0)[None]
                elif variant == "flat":
                    rows = table[idx.reshape(-1)].reshape(W, n, 5)
                    rows_sum = rows.sum(-1)[None]
                nxt = (idx + rows_sum[0].astype(jnp.int32) + 1) % (4**11)
                return nxt, ()
            out, _ = jax.lax.scan(step, idx0, None, length=t_len, unroll=4)
            return out
        return run

    for variant in ("none", "wn", "wn_moveaxis", "flat"):
        fn = make(variant)
        np.asarray(sum1(fn(idx0)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(sum1(fn(idx0)))
            best = min(best, time.perf_counter() - t0)
        print(f"{variant:12s} {best*1e3:8.1f} ms  "
              f"{best/t_len*1e6:6.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
