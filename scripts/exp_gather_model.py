"""Cost model of the in-scan LM table gather on TPU.

The round-2 LM decode step spends ~16 of 23.7 us in one [W*N]-row gather
from the 4^11-row HBM table (NOTES.md).  Round-2 probes left an
inconsistent picture (fixed ~50 us per serialized gather op independent
of row count, vs 16 us amortized in-scan).  This sweep pins down what
the cost actually scales with so the LM-fusion redesign targets the
right axis:

  axis A  table row count      (4^7 .. 4^11) at fixed 1536 indices
  axis B  table dtype/bytes    (f32 / bf16 / int8) at 4^11
  axis C  index count          (384 .. 129k) at 4^11 f32
  axis D  gathers per step     (1 x 1536 vs 2 x 1536)
  axis E  serial vs parallel   (idx chained through carry vs constant)

Every step consumes the gathered values into the carried index so the
scan cannot dead-code or hoist the gather; the "none" control measures
the bare chain.
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


def bench(fn, arg, t_len):
    sum1 = jax.jit(lambda x: x.sum())
    np.asarray(sum1(fn(arg)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(sum1(fn(arg)))
        best = min(best, time.perf_counter() - t0)
    return best / t_len * 1e6  # us/step


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print(f"devices: {jax.devices()} T={t_len}", flush=True)
    rng = np.random.default_rng(0)

    def make(n_rows, dtype, idx_shape, n_gathers=1, chained=True,
             unroll=4):
        tab = jnp.asarray(
            (rng.random((n_rows, 5)) * 100).astype(dtype))
        idx0 = jnp.asarray(
            rng.integers(0, n_rows, idx_shape).astype(np.int32))

        @jax.jit
        def run(idx0):
            def step(idx, _):
                acc = jnp.zeros((), jnp.int32)
                for g in range(n_gathers):
                    rows = tab[(idx + g) % n_rows]  # [.., 5]
                    acc = acc + rows.sum().astype(jnp.int32)
                if chained:
                    nxt = (idx + acc + 1) % n_rows
                else:
                    nxt = (idx + 1) % n_rows
                return nxt, ()
            out, _ = jax.lax.scan(step, idx0, None, length=t_len,
                                  unroll=unroll)
            return out
        return run, idx0

    cases = [
        # axis E: bare chain control
        ("none (no gather)", None),
        # axis A: table rows at 1536 indices, f32
        ("rows=4^7  f32 idx[6,256]", (4**7, np.float32, (6, 256))),
        ("rows=4^9  f32 idx[6,256]", (4**9, np.float32, (6, 256))),
        ("rows=4^10 f32 idx[6,256]", (4**10, np.float32, (6, 256))),
        ("rows=4^11 f32 idx[6,256]", (4**11, np.float32, (6, 256))),
        # axis B: dtype at 4^11
        ("rows=4^11 bf16 idx[6,256]", (4**11, jnp.bfloat16, (6, 256))),
        ("rows=4^11 int8 idx[6,256]", (4**11, np.int8, (6, 256))),
        # axis C: index count at 4^11 f32
        ("rows=4^11 f32 idx[6,64]", (4**11, np.float32, (6, 64))),
        ("rows=4^11 f32 idx[6,512]", (4**11, np.float32, (6, 512))),
        ("rows=4^11 f32 idx[6,1024]", (4**11, np.float32, (6, 1024))),
        ("rows=4^11 f32 idx[30,256]", (4**11, np.float32, (30, 256))),
        ("rows=4^11 f32 idx[120,256]", (4**11, np.float32, (120, 256))),
        ("rows=4^11 f32 idx[504,256]", (4**11, np.float32, (504, 256))),
        # axis D: two gathers per step
        ("rows=4^11 f32 2x idx[6,256]",
         (4**11, np.float32, (6, 256), 2)),
        # axis E: unchained (constant idx stream)
        ("rows=4^11 f32 idx[6,256] unchained",
         (4**11, np.float32, (6, 256), 1, False)),
        ("rows=4^11 f32 idx[120,256] unchained",
         (4**11, np.float32, (120, 256), 1, False)),
    ]

    for name, spec in cases:
        if spec is None:
            fn, idx0 = make(4**11, np.float32, (6, 256), n_gathers=0)
        else:
            fn, idx0 = make(*spec)
        us = bench(fn, idx0, t_len)
        print(f"{name:42s} {us:8.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
