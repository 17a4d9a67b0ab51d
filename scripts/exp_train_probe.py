"""Training-dynamics probe for the full-size accuracy-run config.

The full runs plateau at ~L*ln4 (labels located, bases uniform) while
small-config overfit probes on CPU converge to ~0 (f32 AND bf16) — so
the loss/model/data are correct and the question is which knob of the
full configuration stalls optimisation.  This script isolates them on
the TPU: overfit vs fresh data, lr, dwell, model size.

Usage: python scripts/exp_train_probe.py [mode] [steps] [lr] [dwell]
  mode: 'overfit' (cycle 64 windows) | 'fresh' (240-batch cycle)
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
    mode = sys.argv[1] if len(sys.argv) > 1 else "overfit"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-3
    dwell = float(sys.argv[4]) if len(sys.argv) > 4 else 40.0
    clipnorm = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from radian_tpu.config import default_config
    from radian_tpu.train.trainer import TrainConfig, Trainer
    from radian_tpu.utils.synthetic import kmer_level_table, synth_norm_windows

    print(f"devices: {jax.devices()} mode={mode} steps={steps} lr={lr} "
          f"dwell={dwell} clip={clipnorm}", flush=True)
    rng = np.random.default_rng(7)
    levels = kmer_level_table(rng)
    cfg = default_config()
    cfg.train.batch_size = 128
    cfg.train.opt.adam.lr = lr
    if clipnorm:
        cfg.train.opt.adam.clipnorm = clipnorm

    kw = dict(window=1024, levels=levels, dwell_mean=dwell,
              dwell_std=dwell / 5, noise=0.12)
    if mode == "overfit":
        batches = [synth_norm_windows(rng, 128, **kw)]
    else:
        batches = [synth_norm_windows(rng, 128, **kw) for _ in range(60)]
    print("data ready", flush=True)

    trainer = Trainer(cfg, TrainConfig(checkpoint_dir=None, log_dir=None,
                                       compute_dtype="bfloat16"))
    t0 = time.perf_counter()
    for i in range(steps):
        b = batches[i % len(batches)]
        trainer.state, loss = trainer._train_step(
            trainer.state, trainer._put_batch(b))
        if i % 100 == 0 or i == steps - 1:
            print(f"step {i}: {float(loss):.3f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
