"""Dev-utility parity: label rendering, dataset stats, synthetic data."""

import numpy as np

from radian_tpu.utils.inspect import (
    benchmark_dataset,
    count_steps_per_epoch,
    get_label_stats,
    label_to_sequence,
)
from radian_tpu.utils.synthetic import kmer_level_table, synth_windows


def test_label_to_sequence():
    assert label_to_sequence([0, 1, 2, 3, 0], 4) == "ACGT"
    assert label_to_sequence(np.array([3.0, 3.0, 1.0]), np.int64(2)) == "TT"


def test_dataset_utils(rng):
    levels = kmer_level_table(rng)
    batches = [synth_windows(rng, 4, window=256, levels=levels) for _ in range(3)]
    assert count_steps_per_epoch(batches) == 3
    assert benchmark_dataset(batches) >= 0
    stats = get_label_stats(batches)
    assert sum(stats.values()) == 12
    for seq in stats:
        assert set(seq) <= set("ACGT")


def test_synth_windows_schema(rng):
    batch = synth_windows(rng, 5, window=256)
    assert batch["signal"].shape == (5, 256)
    assert batch["labels"].shape[0] == 5
    assert (batch["label_length"] > 0).all()
    assert (batch["input_length"] == 256).all()
    # labels lie in range and pad is zero
    for i in range(5):
        n = batch["label_length"][i]
        assert set(np.unique(batch["labels"][i][:n])) <= {0, 1, 2, 3}
        assert np.all(batch["labels"][i][n:] == 0)


def test_markov_synthetics(rng):
    from radian_tpu.utils.synthetic import (
        markov_kmer_lm,
        markov_labels,
        synth_read,
    )

    trans = np.full((4, 4), 0.1 / 3, np.float32)
    for b in range(4):
        trans[b, (b + 1) % 4] = 0.9
    labels = markov_labels(rng, 2000, trans)
    # favoured transition should dominate
    favoured = np.mean(labels[1:] == (labels[:-1] + 1) % 4)
    assert 0.85 < favoured < 0.95

    lm = markov_kmer_lm(trans, context_len=5)
    assert lm.probs.shape == (4**5, 4)
    # row for context ending in base b must equal trans[b]
    for ctx in (0, 1, 2, 3, 17, 255, 4**5 - 1):
        np.testing.assert_allclose(lm.probs[ctx], trans[ctx % 4], rtol=1e-6)
    # entropy below the default r_threshold -> fusion gate can fire
    assert lm.entropy.max() < 0.5

    sig, labs = synth_read(rng, 50, kmer_level_table(rng), trans=trans)
    assert sig.ndim == 1 and len(labs) == 50


def test_print_dataset_and_same_label(rng, tmp_path):
    """Plot helpers (reference utilities.py:63-148 counterparts) render
    to files headlessly."""
    from radian_tpu.utils.inspect import (
        print_dataset,
        print_same_label_signals,
    )

    levels = kmer_level_table(rng)
    batches = [synth_windows(rng, 4, window=256, levels=levels)]
    fig = print_dataset(batches, n_windows=4,
                        out_path=tmp_path / "ds.png")
    assert (tmp_path / "ds.png").exists()
    target = label_to_sequence(batches[0]["labels"][0],
                               batches[0]["label_length"][0])
    found = print_same_label_signals(
        batches, target, out_path=tmp_path / "same.png")
    assert len(found) >= 1
    assert (tmp_path / "same.png").exists()
