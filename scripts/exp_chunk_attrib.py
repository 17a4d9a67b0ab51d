"""Attribute chunk-mode identity loss: fragments vs stitcher (VERDICT r3 #6).

Chunk mode scores ~11 identity points below global decode with trained
weights (85.96 vs 96.81 median, bench_data/trained/accuracy_chunk.json).
This experiment splits the loss between the two candidate causes:

1. **per-window decode truncation** — each 1024-sample window decodes
   with zero context outside itself, so its fragment's edges are
   unreliable;
2. **stitcher error** — the consensus displacement between consecutive
   fragments is estimated (difflib longest block on the reference path,
   match-count offset-correlation on the device path) and mistakes
   smear votes.

Synthetic reads expose the exact sample→base map (``synth_signal
return_dwells=True``), giving three oracles per read:

- *fragment identity*: each fragment scored against the TRUE bases its
  window covers (isolates per-window decode quality);
- *oracle-displacement stitch*: the reference vote-matrix consensus run
  with TRUE displacements (isolates vote/argmax loss from displacement
  loss);
- *displacement error*: per consecutive pair, difflib's and the device
  stitcher's displacement vs the true base offset.

Usage: python scripts/exp_chunk_attrib.py [--cpu] [--reads 32]
"""

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reads", type=int, default=32)
    ap.add_argument("--read-bases", type=int, default=370)
    ap.add_argument("--noise", type=float, default=0.12)
    ap.add_argument("--params", default="bench_data/trained/params.npz")
    ap.add_argument("--out",
                    default="bench_data/trained/chunk_attribution.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    from radian_tpu.config import default_config
    from radian_tpu.eval.align import read_identity
    from radian_tpu.models.checkpoint import load_params_npz
    from radian_tpu.ops.beam_search import rows_to_seqs, unpack_labels2
    from radian_tpu.ops.consensus import (
        consensus_sequence,
        longest_block,
        simple_assembly,
    )
    from radian_tpu.ops.consensus_device import assemble_fragments_device
    from radian_tpu.pipeline import Basecaller, BasecallOptions
    from radian_tpu.utils.inspect import BASES
    from radian_tpu.utils.synthetic import (
        kmer_level_table,
        markov_labels,
        synth_signal,
    )
    from scripts.train_accuracy_run import make_trans

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(7)
    levels = kmer_level_table(rng)
    trans = make_trans(0.9)
    params = load_params_npz(args.params)
    cfg = default_config()

    rng_eval = np.random.default_rng(1234)
    reads = []
    for _ in range(args.reads):
        labels = markov_labels(rng_eval, args.read_bases, trans)
        sig, dwells = synth_signal(
            rng_eval, labels, levels, dwell_mean=40.0, dwell_std=8.0,
            noise=args.noise, return_dwells=True,
        )
        reads.append((sig, labels, dwells))
    sigs = [(r[0] * 100 + 500).astype(np.int16) for r in reads]

    window, step = 1024, 128
    bc = Basecaller(
        params, cfg, compute_dtype=jnp.bfloat16,
        options=BasecallOptions(
            decode_type="chunk", read_batch=min(args.reads, 32),
            bucket_quantum=4096,
        ),
    )

    # fragments straight from the fused chunk program
    from radian_tpu.ops.preprocess import max_windows_for

    bucket = -(-max(len(s) for s in sigs) // 4096) * 4096
    n = len(sigs)
    padded = np.zeros((n, bucket), np.int16)
    lengths = np.zeros(n, np.int32)
    for j, s in enumerate(sigs):
        padded[j, : len(s)] = s
        lengths[j] = len(s)
    packed, n_lab, n_wins, mads = bc._chunk_fused_prog(
        bc.params, jnp.asarray(padded), jnp.asarray(lengths),
        max_windows=max_windows_for(bucket, window, step),
    )
    packed = np.asarray(packed)
    n_lab = np.asarray(n_lab)
    n_wins = np.asarray(n_wins)

    def to_str(labs):
        return "".join(BASES[b] for b in labs)

    frag_accs, stitched, device_st, oracle_st = [], [], [], []
    disp_err_difflib, disp_err_device = [], []
    for j in range(n):
        sig, labels, dwells = reads[j]
        truth = to_str(labels)
        w_count = int(n_wins[j])
        frags = rows_to_seqs(unpack_labels2(packed[j, :w_count], n_lab[j, :w_count]))
        # sample→base map: base b covers samples [starts[b], starts[b+1])
        seg_ends = np.cumsum(dwells)
        seg_starts = np.concatenate([[0], seg_ends[:-1]])
        first_base = np.zeros(w_count, np.int64)
        for w in range(w_count):
            s0 = min(w * step, max(len(sig) - window, 0))
            first_base[w] = np.searchsorted(seg_ends, s0, side="right")
        # fragment identity vs the window's true bases
        for w in range(w_count):
            s0 = min(w * step, max(len(sig) - window, 0))
            b0 = first_base[w]
            b1 = np.searchsorted(seg_starts, s0 + window, side="left")
            tsub = truth[b0:b1]
            if len(tsub) >= 5 and frags[w]:
                frag_accs.append(
                    read_identity(tsub, frags[w])["accuracy"])
        # displacements
        true_disp = np.diff(first_base)
        for w in range(1, w_count):
            a, b, size = longest_block(frags[w - 1], frags[w])
            disp_err_difflib.append(int(a - b) - int(true_disp[w - 1]))
        # device displacements: reproduce pair_disp scoring in numpy
        for w in range(1, w_count):
            prev, cur = frags[w - 1], frags[w]
            L = max(len(prev), len(cur), 1)
            hi = min(256, L + 1)
            lo = -min(max(hi // 4, 8), L)
            best_d, best_key = 0, -1
            pa = np.frombuffer(prev.encode(), np.uint8)
            ca = np.frombuffer(cur.encode(), np.uint8)
            for d in range(lo, hi):
                jj = np.arange(len(ca))
                idx = d + jj
                ok = (idx >= 0) & (idx < len(pa))
                m = int(np.sum(pa[idx[ok]] == ca[jj[ok]]))
                key = m * (2 * (hi - lo) + 2) + (-2 * abs(d) + (d >= 0))
                if key > best_key:
                    best_key, best_d = key, d
            disp_err_device.append(best_d - int(true_disp[w - 1]))
        # stitches
        called = consensus_sequence(simple_assembly(frags))
        stitched.append(read_identity(truth, called)["accuracy"]
                        if called else 0.0)
        dev_called = assemble_fragments_device(frags)
        device_st.append(read_identity(truth, dev_called)["accuracy"]
                         if dev_called else 0.0)
        # oracle stitch: reference vote semantics with TRUE displacements
        cap = sum(len(f) for f in frags) + 1000
        counts = np.zeros((4, cap))
        pos = 0
        length = 0
        from radian_tpu.ops.consensus import _vote

        _vote(counts, 0, frags[0])
        for w in range(1, w_count):
            d = int(true_disp[w - 1])
            _vote(counts, pos + d, frags[w])
            pos += d
            length = max(length, pos + len(frags[w]))
        ocalled = consensus_sequence(counts[:, :length])
        oracle_st.append(read_identity(truth, ocalled)["accuracy"]
                         if ocalled else 0.0)
        print(f"read {j}: frags_med "
              f"{np.median(frag_accs[-w_count:]):.1f} stitched "
              f"{stitched[-1]:.1f} device {device_st[-1]:.1f} oracle "
              f"{oracle_st[-1]:.1f}", flush=True)

    def med(x):
        return float(np.median(x)) if len(x) else None

    de_d = np.abs(disp_err_difflib)
    de_v = np.abs(disp_err_device)
    out = {
        "n_reads": n,
        "noise": args.noise,
        "fragment_identity_median": med(frag_accs),
        "stitched_identity_median_difflib": med(stitched),
        "stitched_identity_median_device": med(device_st),
        "stitched_identity_median_oracle_disp": med(oracle_st),
        "disp_exact_rate_difflib": float((de_d == 0).mean()),
        "disp_exact_rate_device": float((de_v == 0).mean()),
        "disp_abs_err_mean_difflib": float(de_d.mean()),
        "disp_abs_err_mean_device": float(de_v.mean()),
        "disp_abs_err_p90_difflib": float(np.percentile(de_d, 90)),
        "disp_abs_err_p90_device": float(np.percentile(de_v, 90)),
    }
    print(json.dumps(out, indent=2), flush=True)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
