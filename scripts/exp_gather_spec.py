"""Does a dependency-distance-2 (speculative) gather hide its latency?

exp_gather_model showed the in-scan LM gather costs ~13 ns/index when
its indices depend on the previous step's gather (distance 1), but ~0
when fully independent.  The real decoder can be restructured so the
gather's indices depend only on the *selection* two steps back
(pre-selection slice gather over all 4 possible extensions), i.e.
dependency distance 2.  This measures that middle case, plus slice-form
gathers ([W,N] starts x (4,5) slice vs [4,W,N] row indices).
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

W, N = 6, 256
R = 4**11


def bench(fn, arg, t_len):
    sum1 = jax.jit(lambda x: jax.tree.map(lambda y: y.sum(), x))
    np.asarray(jax.tree.leaves(sum1(fn(arg)))[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(sum1(fn(arg)))[0])
        best = min(best, time.perf_counter() - t0)
    return best / t_len * 1e6


def slice_gather(tab, starts):
    """[W, N] int32 starts -> [W, N, 4, 5] via one slice-form gather."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    return jax.lax.gather(
        tab, starts[..., None], dn, slice_sizes=(4, 5),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print(f"devices: {jax.devices()} T={t_len}", flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((R + 4, 5), np.float32))
    idx0 = jnp.asarray(rng.integers(0, R, (W, N)).astype(np.int32))

    def make(variant, unroll=4):
        @jax.jit
        def run(idx0):
            def step(carry, _):
                prev, cur = carry  # prev = idx from 2 steps back
                if variant == "dist1_row":
                    rows = tab[cur]  # [W, N, 5]
                    nxt = (cur + rows.sum(-1).astype(jnp.int32) + 1) % R
                elif variant == "dist2_row":
                    rows = tab[prev]
                    nxt = (cur + rows.sum(-1).astype(jnp.int32) + 1) % R
                elif variant == "dist1_slice":
                    sl = slice_gather(tab, cur)  # [W, N, 4, 5]
                    nxt = (cur + sl.sum((-1, -2)).astype(jnp.int32) + 1) % R
                elif variant == "dist2_slice":
                    sl = slice_gather(tab, prev)
                    nxt = (cur + sl.sum((-1, -2)).astype(jnp.int32) + 1) % R
                elif variant == "dist2_4rows":
                    rows = tab[(prev[None] + jnp.arange(4)[:, None, None]) % R]
                    nxt = (cur + rows.sum(-1).sum(0).astype(jnp.int32) + 1) % R
                return (cur, nxt), ()
            out, _ = jax.lax.scan(step, (idx0, idx0), None, length=t_len,
                                  unroll=unroll)
            return out
        return run

    for variant in ("dist1_row", "dist2_row", "dist1_slice", "dist2_slice",
                    "dist2_4rows"):
        for unroll in (4, 8):
            us = bench(make(variant, unroll), idx0, t_len)
            print(f"{variant:14s} unroll={unroll}  {us:8.2f} us/step",
                  flush=True)


if __name__ == "__main__":
    main()
