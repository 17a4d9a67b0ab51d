"""Gate-aware LM gather: does clamping cold lanes to row 0 pay? (r3 #4)

Round 3 established that the decoder's per-step LM gather cost tracks
the table's random-access SPAN, not the request count
(exp_lm_tablesize).  With trained weights the fusion gate (signal
entropy > s_threshold) opens on only ~10-25% of (step, read) lanes — so
clamping the gather index to 0 for gate-closed lanes keeps the request
count constant but collapses the span to the hot rows.  Exactness:
clamped rows are never consulted (the fused distribution is only
selected where the gate is open).

This measures the production decoder's step cost with the gather index
masked at several simulated open rates, against the always-gather
baseline — the premise test for a gate-aware decoder restructure.

The mask here is a fixed pseudo-random [T, W, N] pattern (rate p), NOT
the real entropy gate — it isolates the memory-system question.  If the
win is real at p≈0.2, the restructure gathers at consult time with
``idx = where(s_gate & len_ok, ctx, 0)``.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_gate_gather.py
"""

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

W, N = 6, 256
R = 4 ** 11
T = 4096


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((R, 5), np.float32))

    def make_prog(rate_key):
        """Scan with a dependency-1 in-scan gather; per-step [W, N] mask
        at the given open rate clamps the index to 0."""

        def prog(tab, gates):
            def step(carry, gate):
                idx = carry
                idx = jnp.where(gate, idx, 0)
                rows = tab[idx]  # [W, N, 5]
                # index for the next step depends on this gather (the
                # real decoder's dependency structure)
                nxt = (
                    (idx * 4 + rows[..., 0].astype(jnp.int32) % 4
                     + jnp.int32(rate_key)) % R
                )
                return nxt, rows.sum()

            init = jnp.asarray(
                rng.integers(0, R, (W, N)), jnp.int32)
            _, sums = jax.lax.scan(step, init, gates)
            return sums.sum()

        return jax.jit(prog)

    for p in (1.0, 0.5, 0.25, 0.1, 0.02, 0.0):
        gates = jnp.asarray(rng.random((T, W, N)) < p)
        prog = make_prog(int(p * 1000))
        np.asarray(prog(table, gates))  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(prog(table, gates))
            best = min(best, time.perf_counter() - t0)
        print(f"open rate {p:4.2f}: {best / T * 1e6:6.2f} us/step",
              flush=True)


if __name__ == "__main__":
    main()
