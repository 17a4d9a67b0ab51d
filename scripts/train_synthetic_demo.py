"""End-to-end framework demo: train → basecall → evaluate identity.

Trains a small sig2seq on synthetic squiggles, writes TFRecord shards
through our codec, runs the trained model through the full basecall
pipeline (windowing, assembly, beam search), and scores read identity
with the alignment evaluator — the complete reference workflow
(train.py → basecall.py → align.py) exercised in one run on generated
data.

Usage: python scripts/train_synthetic_demo.py [--steps 300] [--reads 8]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--reads", type=int, default=8)
    ap.add_argument("--read-bases", type=int, default=250)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--out", default="/tmp/radian_tpu_demo")
    args = ap.parse_args()

    import jax

    if os.environ.get("RADIAN_DEMO_TPU") != "1":
        # run on CPU unless explicitly asked; the env pins JAX_PLATFORMS=axon
        jax.config.update("jax_platforms", "cpu")

    from radian_tpu.config import default_config
    from radian_tpu.eval.align import read_identity
    from radian_tpu.pipeline import Basecaller, BasecallOptions
    from radian_tpu.train.trainer import TrainConfig, Trainer
    from radian_tpu.utils.inspect import BASES
    from radian_tpu.utils.synthetic import (
        kmer_level_table,
        synth_read,
        synth_windows,
    )

    rng = np.random.default_rng(0)
    levels = kmer_level_table(rng)

    cfg = default_config()
    cfg.model.tcn.nb_filters = 64
    cfg.model.tcn.dilations = [1, 2, 4, 8]
    cfg.model.relu_units = 64
    cfg.model.timesteps = args.window
    cfg.data.window_size = args.window
    cfg.train.batch_size = 16
    cfg.train.opt.adam.lr = 0.002

    out = Path(args.out)
    trainer = Trainer(cfg, TrainConfig(checkpoint_dir=str(out / "ckpt"),
                                       log_dir=str(out / "logs")))

    print(f"training {args.steps} steps on synthetic squiggles...")
    batches = [
        synth_windows(rng, 16, window=args.window, levels=levels)
        for _ in range(args.steps)
    ]
    first = trainer.evaluate(batches[:4])
    trainer.train_epoch(batches, epoch=0)
    last = trainer.evaluate(batches[:4])
    trainer.save_checkpoint(0)
    print(f"ctc loss: {first:.2f} -> {last:.2f}")

    # basecall fresh synthetic reads with the trained weights
    print("basecalling synthetic reads...")
    bc = Basecaller(
        trainer.state.params, cfg,
        options=BasecallOptions(
            chunk_len=args.window, step_size=args.window // 8,
            read_batch=args.reads,
        ),
    )
    reads = [synth_read(rng, args.read_bases, levels) for _ in range(args.reads)]
    # synthetic signals are already normalised scale; feed them with a
    # amplitude that survives MAD-normalisation round trip
    sigs = [(r[0] * 100 + 500).astype(np.int16) for r in reads]
    seqs = bc.basecall_signals(sigs)

    accs = []
    for (sig, labels), seq in zip(reads, seqs):
        truth = "".join(BASES[b] for b in labels)
        called = seq[::-1] if seq else ""  # decoder order for comparison
        if not called:
            accs.append(0.0)
            continue
        st = read_identity(truth, called)
        accs.append(st["accuracy"])
    print(f"read identity vs ground truth: median {np.median(accs):.1f}% "
          f"mean {np.mean(accs):.1f}% over {len(accs)} reads")

    from radian_tpu.models.checkpoint import save_params_npz

    save_params_npz(trainer.state.params, out / "demo_params.npz")
    print(f"saved params to {out / 'demo_params.npz'}")
    return float(np.median(accs))


if __name__ == "__main__":
    main()
