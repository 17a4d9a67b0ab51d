"""Real-read sanity check for the synthetic-trained model (VERDICT r4
task 9).

The published RNA002 weights are stripped from the snapshot, so full
realism is impossible — but the cheap reality checks are not: basecall
the 5 bundled REAL reads (/root/reference/radian/data/reads.fast5, the
reference's intended workload, basecall.py:70-76) with the
synthetic-trained full-size bf16 weights and record, per read:

  - decoded sequence length,
  - samples-per-base (RNA002 translocation ~70 bases/s at 3012 Hz
    gives a ~10-12 samples/base dwell on real data; the synthetic
    training dwell is 40, so the trained model should call FEWER bases
    per sample than a real-data model — this quantifies how far),
  - signal-entropy gate-open rate at s_threshold 0.5 (how often LM
    fusion would consult the LM on real signals).

Writes bench_data/trained/real_reads.json.  Usage:

    python scripts/real_reads_sanity.py [--cpu]
"""

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).parent.parent.absolute()
                          / "bench_data/.jax_cache"))
sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--params", default="bench_data/trained/params.npz")
    ap.add_argument("--out", default="bench_data/trained/real_reads.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    import jax.numpy as jnp
    import numpy as np

    from radian_tpu.config import default_config
    from radian_tpu.io import iter_fast5_reads
    from radian_tpu.models.checkpoint import load_params_npz
    from radian_tpu.ops.beam_search import signal_entropies
    from radian_tpu.pipeline import Basecaller, BasecallOptions

    params = load_params_npz(args.params)
    cfg = default_config()
    reads = sorted(
        iter_fast5_reads("/root/reference/radian/data/reads.fast5"),
        key=lambda r: r.read_id,
    )
    bc = Basecaller(params, cfg, compute_dtype=jnp.bfloat16,
                    options=BasecallOptions(read_batch=5,
                                            bucket_quantum=1024))
    seqs = bc.basecall_signals([r.signal for r in reads])

    # per-read gate-open rate on the real signals (probs from the same
    # trained bf16 forward; gate-open == signal entropy > s_threshold,
    # reference decode.py:79-96)
    bucket = -(-max(len(r.signal) for r in reads) // 1024) * 1024
    padded = np.zeros((len(reads), bucket), np.int16)
    lengths = np.zeros(len(reads), np.int32)
    for j, r in enumerate(reads):
        padded[j, : len(r.signal)] = r.signal
        lengths[j] = len(r.signal)
    mats, t_reads, _ = bc._prep_fullread(
        bc.params, jnp.asarray(padded), jnp.asarray(lengths)
    )
    ents = np.asarray(jax.vmap(signal_entropies)(mats))
    t_reads = np.asarray(t_reads)

    per_read = {}
    for j, (r, s) in enumerate(zip(reads, seqs)):
        e = ents[j, : t_reads[j]]
        n = len(s) if s else 0
        per_read[r.read_id] = {
            "signal_samples": int(len(r.signal)),
            "seq_len": n,
            "samples_per_base": round(len(r.signal) / n, 2) if n else None,
            "gate_open_rate_sthr_0.5": round(float((e > 0.5).mean()), 4),
        }

    artifact = {
        "weights": str(args.params),
        "note": ("synthetic-trained (dwell 40, sigma 0.12) weights on "
                 "REAL RNA002 signals; real dwell is ~10-12 samples/"
                 "base, so samples_per_base >> 12 quantifies the "
                 "domain gap"),
        "reads": per_read,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
