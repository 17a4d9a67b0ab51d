"""Measure the reference pipeline's CPU throughput on this machine.

Runs the actual reference code (imported read-only from /root/reference)
on the bundled 5-read fast5 with shared seed-0 weights and a synthetic
12-mer LM — the same inputs bench.py gives our TPU pipeline — and stores
reads/s in bench_data/baseline.json.

The reference's trained weights and LM are stripped from the snapshot
(.MISSING_LARGE_BLOBS), so both stacks share our deterministically
initialised model; the signal-model forward for the reference path runs
on CPU via the same network (generous to the reference: its TF/cuDNN
forward would not be faster on this CPU, and the python beam search
dominates its runtime anyway).

Usage: JAX_PLATFORMS=cpu python bench_baseline.py
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"

from tests import reference_oracle as oracle


def main():
    chunk_only = "--chunk-only" in sys.argv
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env

    from radian_tpu.io import iter_fast5_reads
    from radian_tpu.lm import build_dense_tables, random_kmer_model
    from radian_tpu.models import build_model, init_params
    from tests.test_beam_search import _DenseDictView

    reads = sorted(
        iter_fast5_reads("/root/reference/radian/data/reads.fast5"),
        key=lambda r: r.read_id,
    )
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    fwd = jax.jit(lambda w: model.apply({"params": params}, w, probs=True))

    lm_rng = np.random.default_rng(42)
    lm = build_dense_tables(
        random_kmer_model(lm_rng, context_len=11, n_contexts=200_000,
                          concentration=0.2),
        11,
    )
    lm_dict = _DenseDictView(lm)

    ref_pp = oracle.preprocess()
    ref_ma = oracle.matrix_assembly()
    ref_de = oracle.decode()

    entr_cache = {}
    t_total = 0.0
    t_decode = 0.0
    n_samples = 0
    seqs = {}
    for read in (() if chunk_only else reads):
        t0 = time.perf_counter()
        norm = ref_pp.mad_normalise(read.signal, 4)
        windows, pad = ref_pp.get_windows(norm, 1024, 128)
        probs = np.asarray(fwd(windows.astype(np.float32)[..., None]))
        mats = [probs[i] for i in range(len(probs))]
        mats[-1] = mats[-1][:-pad]
        mat = ref_ma.assemble_matrices(mats, 128)
        t1 = time.perf_counter()
        seq = ref_de.beam_search(mat, "ACGT", 6, lm_dict, 0.5, 0.5, 11,
                                 entr_cache)
        t2 = time.perf_counter()
        t_total += t2 - t0
        t_decode += t2 - t1
        n_samples += len(read.signal)
        seqs[read.read_id] = seq[::-1]
        print(f"  {read.read_id}: {len(read.signal)} samples, "
              f"{t2 - t0:.2f}s ({t2 - t1:.2f}s decode)")

    # chunk mode (reference basecall.py:111-123): per-window no-LM beam
    # search + simple_assembly consensus
    np.lib.pad = np.pad  # reference sequence_assembly.py:30 uses the
    # np.lib alias removed in modern numpy
    ref_sa = oracle.sequence_assembly()
    t_chunk = 0.0
    for read in reads:
        t0 = time.perf_counter()
        norm = ref_pp.mad_normalise(read.signal, 4)
        windows, pad = ref_pp.get_windows(norm, 1024, 128)
        probs = np.asarray(fwd(windows.astype(np.float32)[..., None]))
        mats = [probs[i] for i in range(len(probs))]
        mats[-1] = mats[-1][:-pad]
        frags = [
            ref_de.beam_search(m, "ACGT", 6, None, None, None, None, None)
            for m in mats
        ]
        consensus = ref_sa.simple_assembly(frags)
        _ = ref_sa.index2base(np.argmax(consensus, axis=0))
        t_chunk += time.perf_counter() - t0
        print(f"  chunk {read.read_id}: {time.perf_counter() - t0:.2f}s")

    if chunk_only:
        # merge the chunk numbers into the recorded round-1 baseline
        base_path = Path("bench_data/baseline.json")
        if not base_path.exists():
            raise SystemExit(
                "--chunk-only merges into bench_data/baseline.json, which "
                "does not exist — run the full baseline first "
                "(python bench_baseline.py)"
            )
        out = json.loads(base_path.read_text())
    else:
        out = {
            "workload": "5 reads, data/reads.fast5, global decode, LM "
                        "fusion (synthetic 12-mer, seed 42), seed-0 "
                        "weights",
            "reads": len(reads),
            "signal_samples": n_samples,
            "total_s": t_total,
            "decode_s": t_decode,
            "reads_per_s": len(reads) / t_total,
            "samples_per_s": n_samples / t_total,
            "machine": "reference python pipeline on local CPU",
        }
        Path("bench_data/baseline_fasta.json").write_text(
            json.dumps(seqs, indent=2))
    out["chunk_total_s"] = t_chunk
    out["chunk_reads_per_s"] = len(reads) / t_chunk
    Path("bench_data").mkdir(exist_ok=True)
    Path("bench_data/baseline.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
