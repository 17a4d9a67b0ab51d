"""CLI drivers end-to-end on tiny inputs (CPU)."""

import json

import h5py
import numpy as np
import pytest
import yaml

from radian_tpu.io.fasta import read_fasta


def _write_multi_fast5(path, reads):
    with h5py.File(path, "w") as f:
        for rid, signal in reads.items():
            g = f.create_group(f"read_{rid}")
            raw = g.create_group("Raw")
            raw.attrs["read_id"] = np.bytes_(rid.encode())
            raw.create_dataset("Signal", data=signal.astype(np.int16))
            ch = g.create_group("channel_id")
            ch.attrs["sampling_rate"] = 3012.0


def _tiny_config(tmp_path):
    cfg = {
        "data": {"n_classes": 5, "window_size": 256},
        "train": {
            "batch_size": 4, "n_epochs": 1, "n_folds": 1, "val_freq": 1,
            "opt": {
                "type": "adam",
                "adam": {"lr": 0.001, "beta_1": 0.9, "beta_2": 0.999,
                         "epsilon": 1e-7, "amsgrad": False,
                         "clipnorm": False, "clipvalue": False},
            },
        },
        "model": {
            "relu_units": 16, "softmax_units": 5, "timesteps": 256,
            "tcn": {
                "nb_filters": 16, "kernel_size": 3, "nb_stacks": 1,
                "dilations": [1, 2], "padding": "causal",
                "use_skip_connections": False, "dropout_rate": 0.0,
                "return_sequences": True, "activation": "relu",
                "kernel_initializer": "he_normal", "use_batch_norm": False,
            },
        },
    }
    p = tmp_path / "tiny.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_basecall_cli(tmp_path, rng):
    from radian_tpu.cli.basecall import main

    fast5_dir = tmp_path / "fast5"
    fasta_dir = tmp_path / "fasta"
    fast5_dir.mkdir()
    reads = {
        "read-aaa": rng.integers(300, 700, 1500),
        "read-bbb": rng.integers(300, 700, 2100),
    }
    _write_multi_fast5(fast5_dir / "batch0.fast5", reads)

    cfg = _tiny_config(tmp_path)
    main([
        str(fast5_dir), str(fasta_dir),
        "--sig-config", str(cfg),
        "--chunk-len", "256", "--step-size", "64",
        "--read-batch", "2", "--local",
    ])
    out = read_fasta(fasta_dir / "reads-0.fasta")
    assert set(out) == set(reads)
    assert all(set(v) <= set("ACGT") for v in out.values())


@pytest.mark.slow
def test_basecall_cli_chunk_mode_device_consensus(tmp_path, rng):
    from radian_tpu.cli.basecall import main
    from radian_tpu.pipeline import BasecallOptions, load_basecaller

    fast5_dir = tmp_path / "fast5"
    fasta_dir = tmp_path / "fasta"
    fast5_dir.mkdir()
    _write_multi_fast5(
        fast5_dir / "b.fast5", {"read-ccc": rng.integers(300, 700, 1200)}
    )
    cfg = _tiny_config(tmp_path)
    bc = load_basecaller(
        config_path=cfg,
        options=BasecallOptions(
            chunk_len=256, step_size=64, decode_type="chunk",
            consensus="device", read_batch=1,
        ),
    )
    n = bc.basecall_directory(fast5_dir, fasta_dir, verbose=False)
    assert n == 1


@pytest.mark.slow
def test_train_cli(tmp_path, rng):
    from radian_tpu.cli.train import main
    from radian_tpu.io.tfrecord import write_shard
    from radian_tpu.utils.synthetic import kmer_level_table, synth_windows

    cfg = _tiny_config(tmp_path)
    shards = tmp_path / "shards"
    (shards / "train").mkdir(parents=True)
    (shards / "val").mkdir()
    levels = kmer_level_table(rng)
    for split, n in (("train", 2), ("val", 1)):
        for s in range(n):
            batch = synth_windows(rng, 8, window=256, levels=levels)
            exs = [
                {
                    "signal": batch["signal"][i],
                    "label": batch["labels"][i][: batch["label_length"][i]]
                    .astype(np.float32),
                    "signal_length": 256,
                    "label_length": int(batch["label_length"][i]),
                }
                for i in range(8)
            ]
            write_shard(shards / split / f"s{s}.tfrecords", exs)

    main([
        "-s", str(shards), "-g", str(cfg),
        "--steps-per-epoch", "3", "--n-epochs", "2",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "logs"),
    ])
    metrics = [
        json.loads(l)
        for l in (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    assert any(m["tag"] == "val/loss" for m in metrics)
    assert (tmp_path / "ckpt" / "1").exists()  # epoch checkpoints saved
