"""LM-table gather layout shootout (in-scan, TPU).

NOTE: superseded by scripts/exp_lm_tablesize.py, which sweeps the
*production decoder* itself (this proxy's [W, N, 5] layout adds its own
lane-hostile relayout overhead — its 12.8 us/step no-gather floor vs
the real decoder's 6.2 us no-LM step).  Headline conclusion from both:
gather cost tracks the table's random-access span, so layout changes at
constant span (lane128 etc.) don't pay; shrinking the span does.

The decoder's per-step cost with LM fusion is dominated by ONE gather of
[W*N] rows from the dense 12-mer table (ops/beam_search.py:328-337).
This experiment isolates that gather inside a scan with the same
dependency structure (next index depends on gathered values, so nothing
hoists) and compares layouts:

  flat5    [4^11, 5]    f32   current layout (20 B rows)
  flat8    [4^11, 8]    f32   rows padded to 32 B
  lane128  [4^9, 128]   f32   low-2 context bases select a 8-float slot
                              inside a 512 B lane-aligned row
  lane128h [4^9, 128]   bf16  same, half the bytes
  flat5h   [4^11, 5]    bf16
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


@functools.partial(jax.jit, static_argnames=("t_len", "slot_bits", "no_gather"))
def run_scan(table, idx0, t_len, slot_bits, no_gather=False):
    """Scan of t_len steps; each step gathers rows for the current idx and
    derives the next idx from the gathered values (serial dependency).
    ``no_gather`` statically broadcasts row 0 (same chk/nxt math, zero
    gather ops emitted) for a true no-gather floor."""
    n_rows = table.shape[0]

    def step(idx, _):
        if no_gather:
            rows = jnp.broadcast_to(
                table[0][None, None], (*idx.shape, table.shape[-1])
            )
        else:
            rows = table[idx]  # [W, N, R]
        rows = rows.astype(jnp.float32)
        if slot_bits:
            # select an 8-float slot by the low context bits, as the real
            # two-level layout would.  The slot comes from the carried
            # idx (not from the gathered data); the serial dependency is
            # maintained only through the chk -> nxt chain below.  Note
            # slot = idx % nslot is fully correlated with the row index,
            # whereas a real two-level layout splits one context into
            # independent high-bit row / low-bit slot — close enough for
            # this layout probe, but slots-per-row coverage differs.
            nslot = rows.shape[-1] // 8
            slot = (idx % nslot)[..., None]  # [W, N, 1]
            sel = jnp.arange(nslot, dtype=jnp.int32)[None, None] == slot
            rows = jnp.einsum(
                "wns,wnsk->wnk",
                sel.astype(jnp.float32),
                rows.reshape(*rows.shape[:-1], nslot, 8),
            )
        chk = rows.sum(-1)  # [W, N]
        nxt = (idx * 4 + (chk > 0).astype(jnp.int32) + 1) % n_rows
        return nxt, chk[0, :1]

    _, outs = jax.lax.scan(step, idx0, None, length=t_len, unroll=4)
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
    small = 4**9

    idx_big = jnp.asarray(rng.integers(0, big, size=(w, n)), jnp.int32)
    idx_small = jnp.asarray(rng.integers(0, small, size=(w, n)), jnp.int32)
    sum1 = jax.jit(lambda x: x.sum())
    out = {}

    def bench(tag, table, idx, slot_bits, no_gather=False):
        def fn():
            out["x"] = run_scan(table, idx, t_len, slot_bits, no_gather)
        best = timed(fn, lambda: np.asarray(sum1(out["x"])))
        print(f"{tag:10s} {best*1e3:8.1f} ms  {best/t_len*1e6:6.2f} us/step",
              flush=True)

    t5 = rng.standard_normal((big, 5), dtype=np.float32)
    bench("flat5", jnp.asarray(t5), idx_big, False)
    bench("flat5h", jnp.asarray(t5, jnp.bfloat16), idx_big, False)
    t8 = rng.standard_normal((big, 8), dtype=np.float32)
    bench("flat8", jnp.asarray(t8), idx_big, False)
    t128 = rng.standard_normal((small, 128), dtype=np.float32)
    bench("lane128", jnp.asarray(t128), idx_small, True)
    bench("lane128h", jnp.asarray(t128, jnp.bfloat16), idx_small, True)
    t512 = rng.standard_normal((4**7, 512), dtype=np.float32)
    idx_7 = jnp.asarray(rng.integers(0, 4**7, size=(w, n)), jnp.int32)
    bench("lane512", jnp.asarray(t512), idx_7, True)
    t32 = rng.standard_normal((4**10, 32), dtype=np.float32)
    idx_10 = jnp.asarray(rng.integers(0, 4**10, size=(w, n)), jnp.int32)
    bench("lane32", jnp.asarray(t32), idx_10, True)
    t64 = rng.standard_normal((4**10, 64), dtype=np.float32)
    bench("lane64pad", jnp.asarray(t64), idx_10, True)
    t256 = rng.standard_normal((4**8, 256), dtype=np.float32)
    idx_8 = jnp.asarray(rng.integers(0, 4**8, size=(w, n)), jnp.int32)
    bench("lane256", jnp.asarray(t256), idx_8, True)
    # no-gather floor: same scan math, row 0 statically broadcast so no
    # gather op is emitted at all
    bench("floor", jnp.asarray(t5[:1]), jnp.zeros((w, n), jnp.int32), False,
          no_gather=True)


if __name__ == "__main__":
    main()
