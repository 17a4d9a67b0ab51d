"""TFRecord codec: roundtrip + cross-compatibility with TensorFlow."""

import numpy as np
import pytest

from radian_tpu.io import tfrecord as tfr


def _examples(rng, n=7, window=64):
    out = []
    for _ in range(n):
        lab_n = int(rng.integers(1, 10))
        out.append(
            {
                "signal": rng.normal(size=window).astype(np.float32),
                "label": rng.integers(0, 4, lab_n).astype(np.float32),
                "signal_length": window,
                "label_length": lab_n,
            }
        )
    return out


@pytest.mark.parametrize("use_native", [True, False])
def test_roundtrip(rng, tmp_path, use_native):
    exs = _examples(rng)
    path = tmp_path / "shard.tfrecords"
    tfr.write_shard(path, exs)
    sig, lab, slen, llen = tfr.read_shard(
        path, window=64, max_label=16, verify_crc=True, use_native=use_native
    )
    assert sig.shape == (7, 64)
    for i, ex in enumerate(exs):
        np.testing.assert_array_equal(sig[i], ex["signal"])
        n = ex["label_length"]
        np.testing.assert_array_equal(lab[i, :n], ex["label"])
        assert np.all(lab[i, n:] == 0)
        assert slen[i] == 64
        assert llen[i] == n


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("block", [1, 3, 256])
def test_iter_shard_streams_whole_shard(rng, tmp_path, use_native, block):
    """Block-streaming reader yields exactly read_shard's arrays."""
    exs = _examples(rng, n=11)
    path = tmp_path / "shard.tfrecords"
    tfr.write_shard(path, exs)
    whole = tfr.read_shard(path, 64, 16)
    blocks = list(
        tfr.iter_shard(path, 64, 16, block=block, use_native=use_native)
    )
    assert all(b[0].shape[0] <= block for b in blocks)
    cat = [np.concatenate([b[i] for b in blocks]) for i in range(4)]
    for x, y in zip(whole, cat):
        np.testing.assert_array_equal(x, y)


def test_native_matches_python(rng, tmp_path):
    exs = _examples(rng, n=20)
    path = tmp_path / "shard.tfrecords"
    tfr.write_shard(path, exs)
    a = tfr.read_shard(path, 64, 16, use_native=True)
    b = tfr.read_shard(path, 64, 16, use_native=False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_tf_reads_our_shards(rng, tmp_path):
    """TensorFlow's TFRecordDataset (the reference's reader) must parse
    our shards — validates framing, crc and proto encoding."""
    tf = pytest.importorskip("tensorflow")
    exs = _examples(rng, n=5)
    path = tmp_path / "shard.tfrecords"
    tfr.write_shard(path, exs)

    features = {
        "signal": tf.io.FixedLenFeature([64], tf.float32),
        "label": tf.io.VarLenFeature(tf.float32),
        "signal_length": tf.io.FixedLenFeature([], tf.int64),
        "label_length": tf.io.FixedLenFeature([], tf.int64),
    }
    ds = tf.data.TFRecordDataset(str(path))
    for i, rec in enumerate(ds):
        parsed = tf.io.parse_single_example(rec, features)
        np.testing.assert_allclose(
            parsed["signal"].numpy(), exs[i]["signal"], rtol=1e-6
        )
        lab = tf.sparse.to_dense(parsed["label"]).numpy()
        np.testing.assert_array_equal(lab, exs[i]["label"])
        assert int(parsed["label_length"]) == exs[i]["label_length"]
    assert i == 4


def test_we_read_tf_shards(rng, tmp_path):
    """And the reverse: shards written by TF parse through our codec."""
    tf = pytest.importorskip("tensorflow")
    exs = _examples(rng, n=4)
    path = tmp_path / "tfshard.tfrecords"
    with tf.io.TFRecordWriter(str(path)) as w:
        for ex in exs:
            feat = {
                "signal": tf.train.Feature(
                    float_list=tf.train.FloatList(value=ex["signal"])
                ),
                "label": tf.train.Feature(
                    float_list=tf.train.FloatList(value=ex["label"])
                ),
                "signal_length": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[ex["signal_length"]])
                ),
                "label_length": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[ex["label_length"]])
                ),
            }
            w.write(
                tf.train.Example(
                    features=tf.train.Features(feature=feat)
                ).SerializeToString()
            )
    for use_native in (True, False):
        sig, lab, slen, llen = tfr.read_shard(
            path, 64, 16, verify_crc=True, use_native=use_native
        )
        assert sig.shape[0] == 4
        for i, ex in enumerate(exs):
            np.testing.assert_allclose(sig[i], ex["signal"], rtol=1e-6)
            assert llen[i] == ex["label_length"]
