"""Trained-weights accuracy run: train full-size model, measure identity.

The round-2 gap (VERDICT "what's missing" #2): every parity/bench
artifact used seed-0 random weights, so no read-identity number existed
for a *trained* model through the full global+LM pipeline, and the bf16
production forward's accuracy delta vs f32 was unquantified.

This script
1. trains the full-size (256-filter) sig2seq on synthetic squiggles
   (RNA002-realistic ~40-sample dwells) to convergence,
2. basecalls held-out synthetic reads drawn from a biased first-order
   Markov chain through the complete global pipeline, and
3. reports median/mean read identity (eval/align.py, the reference's
   accuracy contract at reference radian/align.py:93-109) for
   f32+LM, bf16+LM and bf16 no-LM forwards.

The Markov chain's exact 11-mer LM (utils/synthetic.markov_kmer_lm) has
per-context entropy below the default r_threshold, so the fusion gate
genuinely fires on uncertain signal — the LM path is exercised with a
*true* LM, not a random one.

Usage:
  python scripts/train_accuracy_run.py                # full run on TPU
  python scripts/train_accuracy_run.py --quick --cpu  # smoke test
"""

import argparse
import itertools
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def make_trans(p: float) -> np.ndarray:
    """Biased first-order chain: after base b, base (b+1)%4 has prob p."""
    trans = np.full((4, 4), (1.0 - p) / 3.0, np.float32)
    for b in range(4):
        trans[b, (b + 1) % 4] = p
    return trans


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--dwell", type=float, default=40.0)
    ap.add_argument("--dwell-std", type=float, default=8.0)
    ap.add_argument("--noise", type=float, default=0.12)
    ap.add_argument("--eval-noise", type=float, default=None,
                    help="noise sigma for the held-out eval reads "
                         "(default: same as --noise); a mismatch probes "
                         "the uncertain-signal regime without retraining")
    ap.add_argument("--threshold-sweep", action="store_true",
                    help="also evaluate bf16+LM at sig_threshold 0.3/0.7 "
                         "(gate sensitivity)")
    # noise vs k-mer level spacing (0.063 for 64 levels over
    # [-2,2]): at 0.25 adjacent levels stay ~1.6 sigma apart even
    # after dwell-averaging (irreducible confusions, CTC never
    # reaches the peaky regime); 0.12 makes levels separable
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train-batches", type=int, default=240,
                    help="distinct pre-generated batches (cycled)")
    ap.add_argument("--eval-reads", type=int, default=128)
    ap.add_argument("--read-bases", type=int, default=370)
    ap.add_argument("--markov-p", type=float, default=0.9)
    ap.add_argument("--out", default="bench_data/trained")
    ap.add_argument("--result-name", default=None,
                    help="results json filename (default accuracy.json / "
                         "accuracy_chunk.json)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="tiny model / few steps / few reads")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse <out>/params.npz from a previous run")
    ap.add_argument("--chunk", action="store_true",
                    help="also evaluate chunk mode (reference difflib vs "
                         "device consensus) with the trained weights")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from radian_tpu.config import default_config
    from radian_tpu.eval.align import (
        random_identity_baseline,
        read_identity,
    )
    from radian_tpu.models.checkpoint import load_params_npz, save_params_npz
    from radian_tpu.pipeline import Basecaller, BasecallOptions
    from radian_tpu.train.trainer import TrainConfig, Trainer
    from radian_tpu.utils.inspect import BASES
    from radian_tpu.utils.synthetic import (
        kmer_level_table,
        markov_kmer_lm,
        synth_norm_windows,
        synth_read,
    )

    if args.quick:
        if args.out == "bench_data/trained":
            args.out = "/tmp/radian_tpu_trained_quick"  # don't mix with
            # the full-size run's checkpoints
        args.steps = min(args.steps, 60)
        args.batch = 16
        args.window = 256
        args.train_batches = 12
        args.eval_reads = 4
        args.read_bases = 60
        args.dwell = 12.0
        args.dwell_std = 2.0

    print(f"devices: {jax.devices()}", flush=True)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    levels = kmer_level_table(rng)
    trans = make_trans(args.markov_p)

    cfg = default_config()
    cfg.model.timesteps = args.window
    cfg.data.window_size = args.window
    cfg.train.batch_size = args.batch
    cfg.train.opt.adam.lr = args.lr
    # the full-size model at lr 1e-3 escapes the uniform-base CTC
    # plateau but blows up periodically without clipping
    # (scripts/exp_train_probe.py traces); clipped it descends
    # monotonically
    cfg.train.opt.adam.clipnorm = 1.0
    if args.quick:
        cfg.model.tcn.nb_filters = 48
        cfg.model.relu_units = 48
        cfg.model.tcn.dilations = [1, 2, 4, 8]

    synth_kw = dict(dwell_mean=args.dwell, dwell_std=args.dwell_std,
                    noise=args.noise)

    if args.skip_train:
        params = load_params_npz(out / "params.npz")
        print(f"loaded params from {out / 'params.npz'}", flush=True)
    else:
        import shutil

        # stale managers silently keep old epochs' checkpoints and
        # restore_best would resurrect a previous run's weights
        shutil.rmtree(out / "ckpt", ignore_errors=True)
        trainer = Trainer(cfg, TrainConfig(
            checkpoint_dir=str((out / "ckpt").absolute()),
            log_dir=str(out / "logs"),
            compute_dtype="bfloat16",
        ))
        print(f"generating {args.train_batches} train + 8 val batches "
              f"of {args.batch}x{args.window}...", flush=True)
        t0 = time.perf_counter()
        # windows are cut from MAD-normalised int16 reads — the exact
        # transform the inference pipeline applies — alternating uniform
        # and Markov-chain sequences so the signal model handles both
        batches = [
            synth_norm_windows(
                rng, args.batch, window=args.window, levels=levels,
                trans=trans if i % 4 == 3 else None, **synth_kw)
            for i in range(args.train_batches)
        ]
        val = [
            synth_norm_windows(
                rng, args.batch, window=args.window, levels=levels,
                trans=trans if i % 4 == 3 else None, **synth_kw)
            for i in range(8)
        ]
        print(f"  ...{time.perf_counter() - t0:.1f}s", flush=True)

        steps_per_epoch = 100 if not args.quick else 20
        n_epochs = max(1, args.steps // steps_per_epoch)
        # device-resident pool + one-scan epochs: per-step host→device
        # round trips over the tunnel cost ~1.46 s/step (40× the device
        # step) — preloading makes the whole run tunnel-free
        pool = trainer.preload_batches(batches)
        val_pool = trainer.preload_batches(val)
        t0 = time.perf_counter()
        for ep in range(n_epochs):
            tl = trainer.train_epoch_scan(
                pool, epoch=ep, steps=steps_per_epoch,
                start=(ep * steps_per_epoch) % len(batches),
            )
            vl = trainer.evaluate_scan(val_pool, epoch=ep)
            trainer.save_checkpoint(ep, val_loss=vl)
            print(f"epoch {ep}: train ctc {tl:.3f}  val ctc {vl:.3f}  "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        trainer.restore_best_checkpoint()
        params = trainer.state.params
        save_params_npz(params, out / "params.npz")

    # held-out reads from the Markov chain
    eval_kw = dict(synth_kw)
    if args.eval_noise is not None:
        eval_kw["noise"] = args.eval_noise
    rng_eval = np.random.default_rng(1234)
    reads = [
        synth_read(rng_eval, args.read_bases, levels, trans=trans,
                   **eval_kw)
        for _ in range(args.eval_reads)
    ]
    sigs = [(r[0] * 100 + 500).astype(np.int16) for r in reads]
    lm = markov_kmer_lm(trans, 11)
    print(f"LM entropy: min {lm.entropy.min():.3f} max {lm.entropy.max():.3f} "
          f"(r_threshold default 0.5)", flush=True)

    def gate_open_rate(bc, sigs, s_thr):
        """Fraction of decode timesteps whose signal entropy exceeds the
        gate threshold (the LM side of the gate is constant for the
        first-order Markov LM: every context has the same entropy, so
        gate-open ⇔ signal-uncertain whenever that entropy < r_thr —
        reference decode.py:79-96)."""
        import jax.numpy as jnp

        from radian_tpu.ops.beam_search import signal_entropies

        bucket = -(-max(len(s) for s in sigs) // 4096) * 4096
        n = len(sigs)
        padded = np.zeros((n, bucket), np.int16)
        lengths = np.zeros(n, np.int32)
        for j, s in enumerate(sigs):
            padded[j, : len(s)] = s
            lengths[j] = len(s)
        mats, t_reads, _ = bc._prep_fullread(
            bc.params, jnp.asarray(padded), jnp.asarray(lengths)
        )
        import jax

        ents = np.asarray(jax.vmap(signal_entropies)(mats))  # [n, T]
        t_reads = np.asarray(t_reads)
        valid = np.arange(ents.shape[1])[None, :] < t_reads[:, None]
        return float((ents[valid] > s_thr).mean())

    configs = [
        ("f32+LM", "float32", True, None, None, {}),
        ("bf16+LM", "bfloat16", True, None, None, {}),
        ("bf16 no-LM", "bfloat16", False, None, None, {}),
    ]
    if args.threshold_sweep:
        configs += [
            ("bf16+LM s_thr=0.3", "bfloat16", True, None, 0.3, {}),
            ("bf16+LM s_thr=0.7", "bfloat16", True, None, 0.7, {}),
        ]
    if args.chunk:
        configs += [
            ("bf16 chunk ref-cons", "bfloat16", False, "reference", None,
             {}),
            ("bf16 chunk dev-cons", "bfloat16", False, "device", None, {}),
            # corrected fullprobs mode, without and with center-cropped
            # decoding (VERDICT r4 task 3)
            ("bf16 chunk fullprobs", "bfloat16", False, "reference", None,
             {"chunk_prep": "fullprobs", "chunk_crop": False}),
            ("bf16 chunk fullprobs+crop", "bfloat16", False, "reference",
             None, {"chunk_prep": "fullprobs", "chunk_crop": True}),
            # LM-fused tiled chunk: the serving mode with gated fusion
            ("bf16 chunk tiled+LM", "bfloat16", True, "reference",
             None, {"chunk_prep": "fullprobs", "chunk_crop": True,
                    "chunk_lm": True}),
        ]
    results = {}
    seqs_by_tag = {}
    rng_base = np.random.default_rng(0)
    results["random_baseline_median"] = float(np.median([
        random_identity_baseline(
            "".join(BASES[b] for b in labels), len(labels), rng_base)
        for _, labels in reads
    ]))
    print(f"random-call identity baseline (median): "
          f"{results['random_baseline_median']:.2f}%", flush=True)
    gate_rate_done = False
    for tag, dtype, use_lm, consensus, s_thr, extra in configs:
        opt_kw = dict(
            read_batch=min(args.eval_reads, 128 if consensus is None else 32),
            bucket_quantum=4096,
        )
        if s_thr is not None:
            opt_kw.update(sig_threshold=s_thr)
        if consensus is not None:
            opt_kw.update(decode_type="chunk", consensus=consensus)
        opt_kw.update(extra)
        bc = Basecaller(
            params, cfg, lm=lm if use_lm else None,
            compute_dtype=dtype,
            options=BasecallOptions(**opt_kw),
        )
        if use_lm and consensus is None and not gate_rate_done:
            gate_rate_done = True
            for thr in (0.3, 0.5, 0.7):
                results[f"gate_open_rate_sthr_{thr}"] = gate_open_rate(
                    bc, sigs, thr)
            print("gate-open rate (signal entropy > s_thr): " + "  ".join(
                f"thr {t}: {results[f'gate_open_rate_sthr_{t}']:.3f}"
                for t in (0.3, 0.5, 0.7)), flush=True)
        t0 = time.perf_counter()
        seqs = bc.basecall_signals(sigs)
        dt = time.perf_counter() - t0
        accs = []
        for (sig, labels), seq in zip(reads, seqs):
            truth = "".join(BASES[b] for b in labels)
            called = seq[::-1] if seq else ""  # decoder order
            accs.append(read_identity(truth, called)["accuracy"]
                        if called else 0.0)
        accs = np.array(accs)
        seqs_by_tag[tag] = seqs
        results[tag] = {
            "median_identity": float(np.median(accs)),
            "mean_identity": float(np.mean(accs)),
            "min_identity": float(accs.min()),
            "reads": len(accs),
            "seconds": dt,
            # per-read accuracies: paired LM-on/off deltas need them
            "per_read": [round(float(a), 4) for a in accs],
        }
        print(f"{tag:12s} median {np.median(accs):6.2f}%  "
              f"mean {np.mean(accs):6.2f}%  min {accs.min():6.2f}%  "
              f"({dt:.1f}s)", flush=True)

    if args.chunk:
        a = seqs_by_tag["bf16 chunk ref-cons"]
        b = seqs_by_tag["bf16 chunk dev-cons"]
        exact = sum(x == y for x, y in zip(a, b))
        results["chunk_consensus_exact_agreement"] = f"{exact}/{len(a)}"
        print(f"chunk consensus exact agreement: {exact}/{len(a)}",
              flush=True)

    path = out / (args.result_name or
                  ("accuracy_chunk.json" if args.chunk else "accuracy.json"))
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
