"""Does an in-scan HBM gather overlap with independent VPU work?

Also: how does gather cost scale with row count (fixed latency vs
per-row)?  Informs a speculative-gather decoder restructure where the
[4,W,N] extension-candidate rows are fetched at step start instead of a
[W,N] post-selection fetch on the serial chain.
"""

import functools
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, sync):
    fn(); sync()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fn(); sync()
        best = min(best, time.perf_counter() - t0)
    return best


@functools.partial(
    jax.jit, static_argnames=("t_len", "rows_mult", "heavy_iters"))
def run(table, idx0, vec0, t_len, rows_mult, heavy_iters):
    n_rows = table.shape[0]
    w, n = idx0.shape

    def step(carry, _):
        idx, vec = carry
        # gather: rows_mult*W*N rows; indices derived from idx only
        gi = (idx[None] * 4 + jnp.arange(rows_mult, dtype=jnp.int32)[
            :, None, None]) % n_rows
        rows = table[gi] if rows_mult else None  # [M, W, N, R]
        # heavy independent VPU work on vec
        v = vec
        for _ in range(heavy_iters):
            v = jnp.tanh(v) * 1.0001 + 0.3
        if rows_mult:
            chk = rows.sum(axis=(0, 3))  # [W, N]
            nxt = (idx * 4 + (chk > 0).astype(jnp.int32) + 1) % n_rows
            v = v + (chk[0, 0] > 0).astype(jnp.float32) * 1e-9
        else:
            nxt = idx
        return (nxt, v), v[0, :1]

    _, outs = jax.lax.scan(step, (idx0, vec0), None, length=t_len, unroll=4)
    return outs


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    w = 6
    print(f"devices: {jax.devices()}  T={t_len} N={n} W={w}", flush=True)

    rng = np.random.default_rng(0)
    big = 4**11
    t5 = jnp.asarray(rng.standard_normal((big, 5), dtype=np.float32))
    idx0 = jnp.asarray(rng.integers(0, big, size=(w, n)), jnp.int32)
    vec0 = jnp.asarray(rng.standard_normal((64, n), dtype=np.float32))
    sum1 = jax.jit(lambda x: x.sum())
    out = {}

    def bench(tag, rows_mult, heavy_iters):
        def fn():
            out["x"] = run(t5, idx0, vec0, t_len, rows_mult, heavy_iters)
        best = timed(fn, lambda: np.asarray(sum1(out["x"])))
        print(f"{tag:28s} {best/t_len*1e6:6.2f} us/step", flush=True)
        return best / t_len

    b0 = bench("gather x0 heavy 0", 0, 0)
    g1 = bench("gather x1 (W rows)  heavy 0", 1, 0)
    g4 = bench("gather x4 (4W rows) heavy 0", 4, 0)
    g16 = bench("gather x16          heavy 0", 16, 0)
    h = bench("gather x0 heavy 40", 0, 40)
    gh = bench("gather x4 heavy 40", 4, 40)
    # subtract the bare-scan baseline from each term so the fixed
    # per-step overhead isn't double-counted in the predicted sum
    print(f"\n4W-row gather alone {(g4-b0)*1e6:.2f}; "
          f"heavy alone {(h-b0)*1e6:.2f}; "
          f"together {(gh-b0)*1e6:.2f} "
          f"(sum {1e6*(g4-b0+h-b0):.2f} -> overlap saves "
          f"{1e6*((g4-b0)+(h-b0)-(gh-b0)):.2f} us/step)")
    print(f"row scaling: x1 {g1*1e6:.2f}  x4 {g4*1e6:.2f}  x16 {g16*1e6:.2f}")


if __name__ == "__main__":
    main()
