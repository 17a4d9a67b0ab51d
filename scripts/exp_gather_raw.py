"""Raw serialized-gather latency: chain K dependent gathers of R rows
from the dense LM table, outside any scan, to bound the per-step cost
the decoder's LM lookup can ever reach."""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    print(f"devices: {jax.devices()} rows={rows} chain={k} width={width}",
          flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((4**11, width), np.float32))
    idx0 = jnp.asarray(rng.integers(0, 4**11, rows).astype(np.int32))

    @jax.jit
    def chain(idx):
        def body(i, idx):
            got = table[idx]  # [rows, width]
            # derive next indices from the values: forces serialization
            nxt = (idx + got[:, 0].astype(jnp.int32) + 1) % (4**11)
            return nxt
        return jax.lax.fori_loop(0, k, body, idx)

    sum1 = jax.jit(lambda x: x.sum())
    np.asarray(sum1(chain(idx0)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(sum1(chain(idx0)))
        best = min(best, time.perf_counter() - t0)
    per = best / k
    print(f"{best*1e3:.1f} ms for {k} chained gathers -> "
          f"{per*1e6:.2f} us/gather ({per/rows*1e9:.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
