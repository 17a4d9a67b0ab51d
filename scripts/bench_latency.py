"""Single-read serving latency: warm read_batch-1 decode per mode.

Measures best-of-3 warm latency for each bundled read (plus synthetic
long reads) under three decode modes:

  - global+LM        (the parity/throughput path; decode = T sequential
                      scan steps, so latency scales with read length)
  - tiled chunk      (window-parallel, 1024-step scans: ~length-
                      independent, 29-40 ms on the bundled reads)
  - tiled chunk + LM (--chunk-lm serving mode with gated fusion)

Writes bench_data/latency.json.  Usage:

    python scripts/bench_latency.py [--skip-long]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str((REPO / "bench_data/.jax_cache").absolute()))
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-long", action="store_true",
                    help="skip the synthetic 24k/49k/98k-sample reads")
    ap.add_argument("--out", default=str(REPO / "bench_data/latency.json"))
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    import jax.numpy as jnp

    from radian_tpu.io import iter_fast5_reads
    from radian_tpu.lm import build_dense_tables, random_kmer_model
    from radian_tpu.models import build_model, init_params
    from radian_tpu.pipeline import Basecaller, BasecallOptions

    reads = sorted(
        iter_fast5_reads("/root/reference/radian/data/reads.fast5"),
        key=lambda r: len(r.signal),
    )
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    lm = build_dense_tables(
        random_kmer_model(np.random.default_rng(42), context_len=11,
                          n_contexts=200_000, concentration=0.2), 11)

    modes = {
        "global_lm": Basecaller(
            params, lm=lm, compute_dtype=jnp.bfloat16,
            options=BasecallOptions(read_batch=1, bucket_quantum=1024)),
        "tiled_chunk": Basecaller(
            params, compute_dtype=jnp.bfloat16,
            options=BasecallOptions(
                decode_type="chunk", chunk_prep="fullprobs",
                read_batch=1, bucket_quantum=1024)),
        "tiled_chunk_lm": Basecaller(
            params, lm=lm, compute_dtype=jnp.bfloat16,
            options=BasecallOptions(
                decode_type="chunk", chunk_prep="fullprobs",
                chunk_lm=True, read_batch=1, bucket_quantum=1024)),
    }

    sigs = {str(len(r.signal)): r.signal for r in reads}
    long_sigs = {}
    if not args.skip_long:
        base = np.concatenate([r.signal for r in reads] * 3)
        for L in (24576, 49152, 98304):
            long_sigs[f"synthetic_{L}"] = base[:L].astype(np.int16)

    np.asarray(jax.device_put(np.ones(4, np.float32)))
    results = {}
    for mode, bc in modes.items():
        results[mode] = {}
        # long-read points only for the tiled mode (the long-read serving
        # claim); compiling 24k-98k global buckets costs minutes each
        mode_sigs = dict(sigs)
        if mode == "tiled_chunk":
            mode_sigs.update(long_sigs)
        for name, sig in mode_sigs.items():
            bc.basecall_signals([sig])  # warm this bucket
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = bc.basecall_signals([sig])
                best = min(best, time.perf_counter() - t0)
            results[mode][name] = {
                "ms": round(best * 1e3, 1), "bases": len(out[0] or ""),
            }
            print(f"{mode:15s} {name:16s} {best*1e3:7.1f} ms "
                  f"({len(out[0] or '')} bases)", flush=True)

    artifact = {
        "comment": ("warm best-of-3 single-read latency, read_batch 1, "
                    "TPU v5e over the axon tunnel (tunnel round trips "
                    "included, so on-host latency is lower)"),
        "results": results,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
