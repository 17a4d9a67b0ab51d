"""Greedy CTC decode + edit distance metric."""

import jax
import jax.numpy as jnp
import numpy as np

from radian_tpu.ops.greedy import (
    batch_mean_edit_distance,
    edit_distance,
    greedy_decode,
)


def test_greedy_collapse():
    # timeline: A A blank A C C -> A A C
    path = [0, 0, 4, 0, 1, 1]
    logits = np.full((1, 6, 5), -10.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 10.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    out = greedy_decode(lp)
    np.testing.assert_array_equal(out[0], [0, 0, 1])


def test_edit_distance():
    assert edit_distance([0, 1, 2], [0, 1, 2]) == 0
    assert edit_distance([0, 1, 2], [0, 2]) == 1
    assert edit_distance([], [1, 2]) == 2
    assert edit_distance([0, 1], [2, 3]) == 2


def test_batch_mean_edit_distance_perfect():
    path = [4, 0, 4, 1, 4, 2]
    logits = np.full((1, 6, 5), -10.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 10.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    labels = np.array([[0, 1, 2, 0]], np.int32)
    med = batch_mean_edit_distance(lp, labels, np.array([3]))
    assert med == 0.0


def test_trainer_edit_distance_eval(rng, tmp_path):
    """The metric integrates with the trainer and logs — working where the
    reference's EditDistanceCallback is a commented-out no-op.  (Early CTC
    training passes through an all-blank phase, so improvement at tiny
    scale isn't asserted; correctness of the metric itself is covered by
    the deterministic tests above.)"""
    import json

    from radian_tpu.train.trainer import TrainConfig, Trainer
    from tests.test_train import _tiny_config
    from radian_tpu.utils.synthetic import kmer_level_table, synth_windows

    cfg = _tiny_config()
    trainer = Trainer(
        cfg, TrainConfig(checkpoint_dir=None, log_dir=str(tmp_path))
    )
    levels = kmer_level_table(rng)
    batches = [synth_windows(rng, 8, window=256, levels=levels)
               for _ in range(2)]
    ed = trainer.edit_distance_eval(batches, epoch=0)
    assert np.isfinite(ed) and 0.0 <= ed <= 2.0
    logged = [
        json.loads(l)
        for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert any(m["tag"] == "val/edit_distance" for m in logged)
