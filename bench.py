"""Benchmark: end-to-end basecalling throughput on the TPU chip.

Workload: the bundled 5-read fast5 replicated to 5120 reads (five
pipelined 1024-read batches; chunk mode: 1280 reads at 256), global
decode with 12-mer LM fusion
(synthetic LM, deterministic seed — the reference's published LM blob is
stripped from the snapshot), seed-0 weights shared with the measured
reference baseline.  The forward runs in bfloat16 (the production
config; f32 reproduces the reference bit-for-bit on CPU, see
COMPONENTS.md "Known deviations"), the decode in f32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup over the reference python pipeline measured on
this machine's CPU (bench_data/baseline.json; regenerate with
bench_baseline.py).
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

# 'global' (headline: global assembly + LM fusion) or 'chunk'
# (per-window no-LM decode + host consensus, reference basecall.py:111-123;
# also reports the device-consensus agreement rate)
DECODE = os.environ.get("BENCH_DECODE", "global")

# experiment knobs (defaults = the recorded configuration); the fused
# chunk path streams window slabs (no [N, windows, 1024, 5] tensor), so
# chunk mode runs the full read batch too (round 3 was capped at 64).
# global read_batch sweep (round 5, after the async device->host copy
# fix; the round-4 "N=512 regresses" probe predated it): 256 -> 903,
# 384 -> 1037, 512 -> 1116, 768 -> 974 (non-power-of-2 anomaly),
# 1024 -> 1169 reads/s, 1536 -> remote-compiler failure, 2048 -> OOM.
# 1024 is the operating point; chunk mode peaks at 256 (384 -> 825,
# 512 -> 643 — the window-expanded batch is already huge).
_DEFAULT_N = 1024 if DECODE == "global" else 256
REPLICAS = int(os.environ.get("BENCH_REPLICAS", _DEFAULT_N))
READ_BATCH = int(os.environ.get("BENCH_READ_BATCH", _DEFAULT_N))
QUANTUM = int(os.environ.get("BENCH_QUANTUM", 1024))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from radian_tpu.io import iter_fast5_reads
    from radian_tpu.lm import build_dense_tables, random_kmer_model
    from radian_tpu.models import build_model, init_params
    from radian_tpu.pipeline import Basecaller, BasecallOptions

    log(f"devices: {jax.devices()}")

    # Session connect, timed SEPARATELY from warmup: the first device
    # interaction of a fresh process over the axon tunnel can stall
    # 0.5 s .. ~6 min waiting for the server to release the previous
    # client's session (measured round 4, scripts/diag_warmup.py).  It
    # is connection latency, not compilation — the bucket programs all
    # hit the on-disk compile cache (1.6 s/bucket first call) and the
    # 84 MB LM upload takes ~1 s once the session is live.
    t0 = time.perf_counter()
    np.asarray(jax.device_put(np.ones(4, np.float32)))
    log(f"axon session connect: {time.perf_counter() - t0:.1f}s")

    reads = sorted(
        iter_fast5_reads("/root/reference/radian/data/reads.fast5"),
        key=lambda r: r.read_id,
    )
    signals = [r.signal for r in reads] * REPLICAS
    n_samples = sum(len(s) for s in signals)

    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))
    lm_rng = np.random.default_rng(42)
    lm = build_dense_tables(
        random_kmer_model(lm_rng, context_len=11, n_contexts=200_000,
                          concentration=0.2),
        11,
    )
    # quantum 1024 buckets reads into 5 length classes (5120..15360 for
    # the bundled set) — ~27% fewer padded decode steps than one 16384
    # bucket, at 5 bucket programs (compile-cached on disk across runs)
    import jax.numpy as jnp

    if DECODE == "chunk":
        opts = BasecallOptions(
            decode_type="chunk", read_batch=READ_BATCH,
            bucket_quantum=QUANTUM,
            # measured max emission on this workload: 285 labels/window
            chunk_max_lab=384,
            # 'fullprobs' benches the corrected no-head-fixup variant
            chunk_prep=os.environ.get("BENCH_CHUNK_PREP", "auto"),
        )
        bc = Basecaller(params, compute_dtype=jnp.bfloat16, options=opts)
    else:
        bc = Basecaller(
            params,
            lm=lm,
            compute_dtype=jnp.bfloat16,
            options=BasecallOptions(read_batch=READ_BATCH,
                                    bucket_quantum=QUANTUM),
        )

    # warmup: compile each bucket program
    log("warmup (compiling bucket programs)...")
    t0 = time.perf_counter()
    warm = bc.basecall_signals([r.signal for r in reads])
    log(f"warmup done in {time.perf_counter() - t0:.1f}s; "
        f"seq lens {[len(s) if s else 0 for s in warm]}")

    # best of 3: the axon tunnel's dispatch/fetch round-trip latency
    # fluctuates run to run (532-957 reads/s observed on identical code
    # with an idle host); min-time is the standard way to report the
    # machine's capability rather than transient link congestion
    log(f"timed runs: {len(signals)} reads, {n_samples} samples")
    dt = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        seqs = bc.basecall_signals(signals)
        d = time.perf_counter() - t0
        log(f"  run {r}: {d:.2f}s ({len(signals) / d:.1f} reads/s)")
        dt = min(dt, d)
    assert all(s is not None for s in seqs)
    reads_per_s = len(signals) / dt
    samples_per_s = n_samples / dt
    log(f"best: {dt:.2f}s -> {reads_per_s:.2f} reads/s, "
        f"{samples_per_s / 1e6:.2f} Msamples/s")

    if DECODE == "chunk":
        # device-consensus agreement: same decoded fragments, stitcher
        # swapped from the host difflib parity path to the jitted
        # offset-correlation stitcher
        import dataclasses

        bc_dev = Basecaller(
            params, compute_dtype=jnp.bfloat16,
            options=dataclasses.replace(bc.options, consensus="device"),
        )
        dev_seqs = bc_dev.basecall_signals(signals[: len(reads) * 8])
        ref_seqs = seqs[: len(reads) * 8]
        agree = sum(a == b for a, b in zip(ref_seqs, dev_seqs))
        log(f"device-consensus agreement: {agree}/{len(dev_seqs)}")

    baseline_path = Path("bench_data/baseline.json")
    vs = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        key = ("chunk_reads_per_s" if DECODE == "chunk" else "reads_per_s")
        base_rps = base.get(key) or base["reads_per_s"]
        vs = reads_per_s / base_rps
        log(f"baseline {base_rps:.3f} reads/s -> {vs:.1f}x")

    out = {
        "metric": ("basecall_throughput_chunk" if DECODE == "chunk"
                   else "basecall_throughput_global_lm"),
        "value": round(reads_per_s, 3),
        "unit": "reads/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    if DECODE == "chunk":
        # exact-string agreement between the two stitchers; with the
        # bench's seed-0 random weights both stitch noise fragments, so
        # low agreement is expected — the trained-weights comparison
        # (NOTES.md round 3: difflib 85.96% vs device 81.96% identity)
        # is the meaningful one
        out["device_consensus_exact_agreement_random_weights"] = (
            f"{agree}/{len(dev_seqs)}"
        )

    # Per-round parity artifact (VERDICT r4 task 1): full-length 5-read
    # fasta parity vs the reference pipeline, on CPU (the bit-identity
    # regime), written to PARITY_r{N}.json.  ~25 s in a subprocess; skip
    # with BENCH_SKIP_PARITY=1.
    if os.environ.get("BENCH_SKIP_PARITY") != "1":
        import subprocess

        log("parity artifact (CPU subprocess)...")
        try:
            p = subprocess.run(
                [sys.executable, "scripts/parity_artifact.py"],
                capture_output=True, text=True, timeout=600,
                cwd=Path(__file__).parent,
            )
            tail = (p.stdout.strip().splitlines() or [""])[-1]
            log(f"parity: {tail} (rc={p.returncode})")
            try:
                out["parity"] = json.loads(tail)
            except json.JSONDecodeError:
                out["parity"] = {"error": tail or p.stderr[-200:]}
        except Exception as e:  # parity must never sink the perf bench
            log(f"parity artifact failed: {e}")
            out["parity"] = {"error": str(e)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
