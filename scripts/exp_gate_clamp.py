"""Gate-clamped LM gather on the PRODUCTION decoder, trained traffic.

VERDICT r3 task 4 closer.  The synthetic probe (exp_gate_gather.py)
already refutes the span-collapse hypothesis: clamping 98% of a chained
gather's indices to row 0 leaves its cost unchanged (~60 µs/step either
way) — the in-scan gather pays a fixed worst-case latency per gather op,
not per random byte touched.  This confirms on the real decoder with
real trained-weights traffic: `RADIAN_GATE_CLAMP_PROBE=1` clamps the
per-step row gather to 0 on signal-certain lanes (the traffic a
gather-at-consult restructure would generate; ~22% open rate at
σ=0.12), and the step time is compared against the stock decoder.

Usage (two runs, flag read at import):
  PYTHONPATH=... python scripts/exp_gate_clamp.py
  RADIAN_GATE_CLAMP_PROBE=1 PYTHONPATH=... python scripts/exp_gate_clamp.py
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from radian_tpu.config import default_config
    from radian_tpu.models.checkpoint import load_params_npz
    from radian_tpu.ops import beam_search as bs
    from radian_tpu.pipeline import Basecaller, BasecallOptions
    from radian_tpu.utils.synthetic import (
        kmer_level_table,
        markov_kmer_lm,
        markov_labels,
        synth_signal,
    )
    from scripts.train_accuracy_run import make_trans

    print(f"devices: {jax.devices()}  CLAMP={bs._GATE_CLAMP_PROBE}",
          flush=True)
    rng = np.random.default_rng(7)
    levels = kmer_level_table(rng)
    trans = make_trans(0.9)
    params = load_params_npz("bench_data/trained/params.npz")
    lm = markov_kmer_lm(trans, 11)

    rng_eval = np.random.default_rng(1234)
    sigs = []
    for _ in range(128):
        labels = markov_labels(rng_eval, 370, trans)
        sig, _ = synth_signal(rng_eval, labels, levels, dwell_mean=40.0,
                              dwell_std=8.0, noise=0.12,
                              return_dwells=True)
        sigs.append((sig * 100 + 500).astype(np.int16))

    bc = Basecaller(
        params, default_config(), lm=lm, compute_dtype=jnp.bfloat16,
        options=BasecallOptions(read_batch=128, bucket_quantum=4096),
    )
    bucket = -(-max(len(s) for s in sigs) // 4096) * 4096
    padded = np.zeros((128, bucket), np.int16)
    lengths = np.zeros(128, np.int32)
    for j, s in enumerate(sigs):
        padded[j, : len(s)] = s
        lengths[j] = len(s)
    dp, dl = jnp.asarray(padded), jnp.asarray(lengths)
    mats, t_reads, mads = bc._prep_fullread(bc.params, dp, dl)
    jax.block_until_ready(mats)

    sync = jax.jit(lambda x: x.astype(jnp.int32).sum())

    def run():
        rev, n_lab = bc._decode_assembled(
            mats, t_reads, bc._lm_t1, bc._lm_t2
        )
        # axon: block_until_ready returns before remote execution ends;
        # fetching a device-reduced scalar really syncs
        return int(np.asarray(sync(rev)))

    run()  # compile
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    t_steps = int(mats.shape[1])
    print(f"decode: {best:.3f}s for [128, {t_steps}] -> "
          f"{best / t_steps * 1e6:.2f} us/step "
          f"({best / t_steps / 128 * 1e9:.1f} ns/read-step)", flush=True)


if __name__ == "__main__":
    main()
