"""Training CLI — reference-compatible flags (reference train.py:100-114)
plus TPU extensions.

Usage:
    python -m radian_tpu.cli.train -s SHARDS_DIR [-g CONFIG]
        [-c CHECKPOINT_DIR -e EPOCH] [--steps-per-epoch N] ...

Multi-host: pass --coordinator/--num-processes/--process-id (or rely on
TPU pod auto-discovery) instead of the reference's tensorflow_nodefile.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--checkpoint",
                   help="checkpoint directory to resume from")
    p.add_argument("-e", "--initial_epoch", type=int, default=None,
                   help="epoch to resume training at (inferred from the "
                        "checkpoint if omitted)")
    p.add_argument("-g", "--config-file",
                   help="yaml config (defaults to bundled sig2seq.yaml)")
    p.add_argument("-s", "--shards-dir", required=True,
                   help="directory containing train/val shard files")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--n-epochs", type=int, default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--max-label", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="bfloat16 runs conv/dense math on the MXU native "
                        "dtype (params/optimizer/loss stay f32)")
    p.add_argument("--epoch-scan", action="store_true",
                   help="preload the batch pool to the device and run "
                        "each epoch as one jitted lax.scan dispatch (11x "
                        "end-to-end over a remote-device link; pool must "
                        "fit device memory)")
    p.add_argument("--eval-edit-distance", action="store_true",
                   help="greedy-decode edit distance on the val pool at "
                        "each val epoch (the reference's "
                        "EditDistanceCallback, working)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from radian_tpu.parallel.distributed import initialize

    initialize(args.coordinator, args.num_processes, args.process_id)

    import jax

    from radian_tpu.config import default_config, get_config
    from radian_tpu.train.data import (
        ShardDataset, host_shard_files, list_shards,
    )
    from radian_tpu.train.trainer import TrainConfig, Trainer

    config = (
        get_config(args.config_file) if args.config_file else default_config()
    )
    window = config.data.window_size
    batch = config.train.batch_size

    train_files = host_shard_files(
        list_shards(args.shards_dir, "train"),
        jax.process_index(), jax.process_count(),
    )
    val_files = list_shards(args.shards_dir, "val")

    tcfg = TrainConfig(
        steps_per_epoch=args.steps_per_epoch,
        checkpoint_dir=args.checkpoint or args.checkpoint_dir,
        log_dir=args.log_dir,
        seed=args.seed,
        mesh_data=args.mesh_data,
        mesh_model=args.mesh_model,
        compute_dtype=args.compute_dtype,
    )
    trainer = Trainer(config, tcfg)

    initial_epoch = 0
    if args.checkpoint:
        initial_epoch = trainer.restore_checkpoint(args.initial_epoch)
        print(f"resuming at epoch {initial_epoch}")

    def train_factory():
        return ShardDataset(
            train_files, batch, train=True, window=window,
            max_label=args.max_label,
            seed=args.seed + jax.process_index(),
        )

    def val_factory():
        return ShardDataset(
            val_files, batch, train=False, window=window,
            max_label=args.max_label,
        ) if val_files else []

    history = trainer.fit(
        train_factory,
        val_factory if val_files else None,
        n_epochs=args.n_epochs,
        initial_epoch=initial_epoch,
        epoch_scan=args.epoch_scan,
        eval_edit_distance=args.eval_edit_distance,
    )
    print(f"final train loss: {history['train_loss'][-1]:.4f}")
    if history["val_loss"]:
        print(f"final val loss: {history['val_loss'][-1]:.4f}")


if __name__ == "__main__":
    main()
