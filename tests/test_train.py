"""Training stack: optimizers, train step convergence, checkpoint resume,
data pipeline, multi-device sharding."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radian_tpu.config import default_config
from radian_tpu.train.data import ShardDataset, host_shard_files, list_shards
from radian_tpu.train.optimizers import build_optimizer
from radian_tpu.train.trainer import TrainConfig, Trainer
from radian_tpu.utils.synthetic import kmer_level_table, synth_windows


def _tiny_config():
    cfg = default_config()
    cfg.model.tcn.nb_filters = 32
    cfg.model.tcn.dilations = [1, 2, 4]
    cfg.model.relu_units = 32
    cfg.model.timesteps = 256
    cfg.data.window_size = 256
    cfg.train.batch_size = 8
    cfg.train.opt.adam.lr = 0.003
    return cfg


@pytest.mark.parametrize("kind", ["adam", "sgd", "adagrad", "cc_opt"])
def test_build_optimizer_variants(kind):
    cfg = default_config()
    cfg.train.opt.type = kind
    tx = build_optimizer(cfg.train.opt)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
    assert updates["w"].shape == (3,)


def test_optimizer_clipnorm():
    cfg = default_config()
    cfg.train.opt.adam.clipnorm = 1.0
    tx = build_optimizer(cfg.train.opt)
    params = {"w": jnp.zeros((4,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.full((4,), 100.0)}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


@pytest.fixture(scope="module")
def synth_batches():
    rng = np.random.default_rng(0)
    levels = kmer_level_table(rng)
    return [
        synth_windows(rng, 8, window=256, levels=levels, max_label=64)
        for _ in range(30)
    ]


def test_training_reduces_loss(synth_batches, tmp_path):
    cfg = _tiny_config()
    trainer = Trainer(
        cfg,
        TrainConfig(checkpoint_dir=None, log_dir=str(tmp_path / "logs"),
                    steps_per_epoch=None),
    )
    first = trainer.evaluate(synth_batches[:4])
    for _ in range(3):
        trainer.train_epoch(synth_batches, epoch=0)
    last = trainer.evaluate(synth_batches[:4])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.7, f"loss did not decrease: {first} -> {last}"
    # metrics were logged
    lines = (tmp_path / "logs" / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) >= 2


def test_checkpoint_save_restore(synth_batches, tmp_path):
    cfg = _tiny_config()
    ckpt_dir = str(tmp_path / "ckpt")
    tr1 = Trainer(cfg, TrainConfig(checkpoint_dir=ckpt_dir))
    tr1.train_epoch(synth_batches[:5], epoch=0)
    tr1.save_checkpoint(epoch=0)
    step1 = int(tr1.state.step)
    p1 = jax.tree.map(np.asarray, tr1.state.params)

    tr2 = Trainer(cfg, TrainConfig(checkpoint_dir=ckpt_dir))
    resume_epoch = tr2.restore_checkpoint()
    assert resume_epoch == 1
    assert int(tr2.state.step) == step1
    p2 = jax.tree.map(np.asarray, tr2.state.params)
    jax.tree.map(np.testing.assert_array_equal, p1, p2)
    # optimizer state restored too (not just weights — fixes reference gap)
    o1 = jax.tree.map(np.asarray, tr1.state.opt_state)
    o2 = jax.tree.map(np.asarray, tr2.state.opt_state)
    jax.tree.map(np.testing.assert_array_equal, o1, o2)


@pytest.mark.slow
def test_best_on_val_checkpoint(synth_batches, tmp_path):
    """The best-on-val-loss checkpoint survives later, worse epochs and
    restores the exact parameters of the best epoch (reference
    ModelCheckpoint monitor='val_loss' save_best_only, train.py:72-78)."""
    cfg = _tiny_config()
    ckpt_dir = str(tmp_path / "ckpt")
    tr = Trainer(cfg, TrainConfig(checkpoint_dir=ckpt_dir))

    snapshots = {}
    for epoch, vl in enumerate([2.0, 1.0, 3.0]):
        tr.train_epoch(synth_batches[:2], epoch=epoch)
        snapshots[epoch] = jax.tree.map(np.asarray, tr.state.params)
        tr.save_checkpoint(epoch, val_loss=vl)
    assert tr.best_epoch == 1 and tr.best_val_loss == 1.0

    tr2 = Trainer(cfg, TrainConfig(checkpoint_dir=ckpt_dir))
    resume = tr2.restore_best_checkpoint()
    assert resume == 2  # epoch after the best (epoch 1)
    p2 = jax.tree.map(np.asarray, tr2.state.params)
    jax.tree.map(np.testing.assert_array_equal, snapshots[1], p2)
    with pytest.raises(AssertionError):
        jax.tree.map(np.testing.assert_array_equal, snapshots[2], p2)

    # latest (rotating) checkpoint is independent: resumes from epoch 2
    tr3 = Trainer(cfg, TrainConfig(checkpoint_dir=ckpt_dir))
    assert tr3.restore_checkpoint() == 3


def test_data_pipeline_from_shards(rng, tmp_path):
    from radian_tpu.io.tfrecord import write_shard

    levels = kmer_level_table(rng)
    (tmp_path / "train").mkdir()
    for s in range(3):
        batch = synth_windows(rng, 10, window=256, levels=levels)
        exs = [
            {
                "signal": batch["signal"][i],
                "label": batch["labels"][i][: batch["label_length"][i]].astype(
                    np.float32
                ),
                "signal_length": 256,
                "label_length": int(batch["label_length"][i]),
            }
            for i in range(10)
        ]
        write_shard(tmp_path / "train" / f"shard-{s}.tfrecords", exs)

    files = list_shards(tmp_path, "train")
    assert len(files) == 3
    ds = ShardDataset(files, batch_size=4, train=False, window=256)
    assert ds.count_examples() == 30
    batches = list(ds)
    assert len(batches) == 8  # 30/4 -> 7 full + remainder kept (val mode)
    total = sum(b["signal"].shape[0] for b in batches)
    assert total == 30
    for b in batches:
        assert b["signal"].shape[1] == 256
        assert b["labels"].dtype == np.int32

    # train mode: infinite, shuffled, drop remainder
    it = iter(ShardDataset(files, batch_size=4, train=True, window=256, seed=1))
    seen = [next(it) for _ in range(10)]
    assert all(b["signal"].shape == (4, 256) for b in seen)

    # host sharding covers all files disjointly
    a = host_shard_files(files, 0, 2)
    b = host_shard_files(files, 1, 2)
    assert sorted(a + b) == files


def test_cross_shard_shuffle_mixes_early_batches(rng, tmp_path):
    """Early train batches must mix examples from many shards — the
    reference interleaves 32 shards and shuffles through a 50,001-example
    buffer (reference radian/data.py:57-69), so consecutive batches never
    come from a single shard."""
    from radian_tpu.io.tfrecord import write_shard

    n_shards, per_shard = 8, 25
    (tmp_path / "train").mkdir()
    for s in range(n_shards):
        exs = [
            {
                # encode the shard id in the signal so batches are traceable
                "signal": np.full(64, float(s), np.float32),
                "label": np.zeros(3, np.float32),
                "signal_length": 64,
                "label_length": 3,
            }
            for _ in range(per_shard)
        ]
        write_shard(tmp_path / "train" / f"shard-{s}.tfrecords", exs)

    files = list_shards(tmp_path, "train")
    it = iter(
        ShardDataset(
            files, batch_size=16, train=True, window=64, seed=0,
            interleave_cycle=8, shuffle_buffer=100, read_block=4,
        )
    )
    first, second = next(it), next(it)
    for b in (first, second):
        shard_ids = set(b["signal"][:, 0].astype(int).tolist())
        assert len(shard_ids) >= 4, shard_ids

    # val mode stays deterministic and sequential (cycle 1, no shuffle)
    val = list(
        ShardDataset(files, batch_size=per_shard, train=False, window=64)
    )
    for i, b in enumerate(val):
        assert set(b["signal"][:, 0].astype(int).tolist()) == {i}


@pytest.mark.slow
def test_multi_device_data_parallel_training(synth_batches):
    """Train step over an 8-device mesh: batch sharded, grads all-reduced."""
    from radian_tpu.parallel.mesh import make_mesh

    cfg = _tiny_config()
    mesh = make_mesh(data=8, model=1)
    trainer = Trainer(cfg, TrainConfig(checkpoint_dir=None), mesh=mesh)
    l0 = trainer.evaluate(synth_batches[:2])
    trainer.train_epoch(synth_batches[:20], epoch=0)
    l1 = trainer.evaluate(synth_batches[:2])
    assert np.isfinite(l1) and l1 < l0


@pytest.mark.slow
def test_tensor_parallel_mesh(synth_batches):
    """data×model = 4×2 mesh with sharded conv/dense kernels still trains."""
    from radian_tpu.parallel.mesh import make_mesh

    cfg = _tiny_config()
    mesh = make_mesh(data=4, model=2)
    trainer = Trainer(cfg, TrainConfig(checkpoint_dir=None), mesh=mesh)
    state0 = trainer.evaluate(synth_batches[:2])
    trainer.train_epoch(synth_batches[:10], epoch=0)
    state1 = trainer.evaluate(synth_batches[:2])
    assert np.isfinite(state1) and state1 < state0


@pytest.mark.slow
def test_training_bf16_compute(synth_batches):
    """Mixed-precision training: bf16 conv/dense math, f32 params/loss.

    Loss must stay finite, decrease, and parameters remain f32."""
    cfg = _tiny_config()
    trainer = Trainer(
        cfg,
        TrainConfig(checkpoint_dir=None, compute_dtype="bfloat16"),
    )
    first = trainer.evaluate(synth_batches[:4])
    for _ in range(3):
        trainer.train_epoch(synth_batches, epoch=0)
    last = trainer.evaluate(synth_batches[:4])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.8, f"bf16 loss did not decrease: {first} -> {last}"
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.dtype == np.float32


@pytest.mark.slow
def test_fit_epoch_scan_matches_per_step(synth_batches, tmp_path):
    """fit(epoch_scan=True) runs the SAME step program as the per-step
    path — per-epoch losses must match to float tolerance (VERDICT r4
    task 5), and val eval / best-on-val checkpointing / edit-distance
    history must all be populated."""
    cfg = _tiny_config()
    batches = synth_batches[:6]
    val = synth_batches[6:8]

    def factory():
        return list(batches)

    def val_factory():
        return list(val)

    hists = {}
    for scan in (False, True):
        tr = Trainer(
            cfg,
            TrainConfig(checkpoint_dir=str(tmp_path / f"ck{scan}"),
                        log_dir=None, seed=0),
        )
        hists[scan] = tr.fit(
            factory, val_factory, n_epochs=2, val_freq=1,
            epoch_scan=scan, eval_edit_distance=True,
        )
        assert tr.best_epoch is not None  # best-on-val ckpt saved

    a, b = hists[False], hists[True]
    np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a["val_loss"], b["val_loss"],
                               rtol=1e-5, atol=1e-6)
    assert len(a["val_edit_distance"]) == 2
    np.testing.assert_allclose(a["val_edit_distance"],
                               b["val_edit_distance"], rtol=1e-5)


@pytest.mark.slow
def test_fit_epoch_scan_short_final_batch(synth_batches, tmp_path):
    """preload_batches pads a short final batch with zero-weight filler
    rows; the padded pool trains to the same losses as the per-step
    path over the same ragged batches."""
    cfg = _tiny_config()
    short = {k: v[:3] for k, v in synth_batches[2].items()}
    batches = [synth_batches[0], synth_batches[1], short]

    hists = {}
    for scan in (False, True):
        tr = Trainer(cfg, TrainConfig(checkpoint_dir=None, seed=0))
        hists[scan] = tr.fit(lambda: list(batches), None, n_epochs=1,
                             val_freq=1, epoch_scan=scan)
    np.testing.assert_allclose(hists[False]["train_loss"],
                               hists[True]["train_loss"], rtol=1e-5)


@pytest.mark.slow
def test_fit_epoch_scan_cycles_pool(synth_batches):
    """With steps_per_epoch set, scan epochs cycle through the pool via
    the start offset (epoch e starts at (e*steps) % pool)."""
    cfg = _tiny_config()
    tr = Trainer(
        cfg,
        TrainConfig(checkpoint_dir=None, steps_per_epoch=4, seed=0),
    )
    h = tr.fit(lambda: list(synth_batches[:6]), None, n_epochs=3,
               epoch_scan=True)
    assert len(h["train_loss"]) == 3
    assert int(tr.state.step) == 12  # 3 epochs x 4 steps
    assert all(np.isfinite(h["train_loss"]))


def test_update_learning_rate_preserves_opt_state(synth_batches):
    """Mid-training LR override (reference model.py:155-158): the new
    rate takes effect and the optimizer moments survive the swap."""
    cfg = _tiny_config()
    tr = Trainer(cfg, TrainConfig(checkpoint_dir=None, seed=0))
    tr.train_epoch(synth_batches[:2], epoch=0)
    mom_before = jax.tree.map(np.asarray, tr.state.opt_state)

    tr.update_learning_rate(1e-6)
    mom_after = jax.tree.map(np.asarray, tr.state.opt_state)
    jax.tree.map(np.testing.assert_array_equal, mom_before, mom_after)

    p0 = jax.tree.map(np.asarray, tr.state.params)
    tr.train_epoch(synth_batches[:1], epoch=1)
    p1 = jax.tree.map(np.asarray, tr.state.params)
    # lr 1e-6 (vs 3e-3): the post-swap step must barely move params
    deltas = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p0, p1)
    )
    assert max(deltas) < 1e-4, f"lr override ignored: max delta {max(deltas)}"
