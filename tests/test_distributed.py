"""Multi-host/multi-device inference sharding + tensorboard logging."""

import numpy as np

from radian_tpu.parallel.distributed import (
    host_read_indices,
    merge_fasta_shards,
)


def test_host_read_indices_partition():
    all_idx = sorted(
        i for p in range(4) for i in host_read_indices(10, p, 4)
    )
    assert all_idx == list(range(10))
    assert host_read_indices(10, 1, 4) == [1, 5, 9]


def test_merge_fasta_shards(tmp_path):
    (tmp_path / "reads-h0-0.fasta").write_text(">a\nAAAA\n>c\nCCCC\n")
    (tmp_path / "reads-h1-0.fasta").write_text(">b\nGGGG\n")
    n = merge_fasta_shards(tmp_path, tmp_path / "merged.fasta",
                           read_order=["a", "b", "c"])
    assert n == 3
    text = (tmp_path / "merged.fasta").read_text()
    assert text == ">a\nAAAA\n>b\nGGGG\n>c\nCCCC\n"


def test_tensorboard_events_parse_with_tf(tmp_path):
    """Our hand-encoded event files must be readable by TF's reader."""
    import pytest

    tf = pytest.importorskip("tensorflow")
    from radian_tpu.utils.tensorboard import EventWriter

    w = EventWriter(tmp_path)
    w.scalar("train/loss", 1.5, 10)
    w.scalar("train/loss", 1.2, 20)
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    events = []
    for rec in tf.data.TFRecordDataset(str(files[0])):
        ev = tf.compat.v1.Event()
        ev.ParseFromString(rec.numpy())
        events.append(ev)
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (e.step, v.tag, v.simple_value)
        for e in events for v in e.summary.value
    ]
    assert scalars == [(10, "train/loss", np.float32(1.5)),
                       (20, "train/loss", np.float32(1.2))]
