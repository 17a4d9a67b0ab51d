"""Distributed CTC training.

TPU-native replacement for the reference training driver (reference
radian/train.py:48-93): a jitted train step sharded over a device mesh
(batch on the 'data' axis, parameters replicated or tensor-sharded on
'model'; XLA inserts the gradient all-reduce that
MultiWorkerMirroredStrategy's ring all-reduce provided), an optax
optimizer from the same config schema, orbax checkpoints that — unlike
the reference (model.py:33-40 restores weights only) — capture optimizer
state for exact resume, and scalar logging to jsonl + TensorBoard event
files.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import NamedSharding, PartitionSpec as P

from radian_tpu.config import DotDict, default_config
from radian_tpu.models.sig2seq import build_model, init_params
from radian_tpu.ops.ctc import ctc_loss
from radian_tpu.parallel.mesh import make_mesh, param_shardings
from radian_tpu.train.optimizers import build_optimizer


@dataclasses.dataclass
class TrainConfig:
    steps_per_epoch: int | None = None  # None: one pass over train data
    checkpoint_dir: str | None = "checkpoints"
    log_dir: str | None = None
    seed: int = 0
    keep_checkpoints: int = 5
    blank_id: int = 4
    mesh_data: int | None = None
    mesh_model: int = 1
    log_every: int = 50
    # 'bfloat16' runs conv/dense math on the MXU native dtype; parameters,
    # optimizer state, residual sums, softmax, and the CTC loss stay f32
    # (the reference trains pure f32, model.py:100-153)
    compute_dtype: str = "float32"


def make_train_step(model, tx, blank_id: int = 4):
    """Build the pure train-step function (jitted by the caller)."""

    def loss_fn(params, batch):
        log_probs = model.apply(
            {"params": params}, batch["signal"][..., None], train=True
        )
        losses = ctc_loss(
            log_probs,
            batch["input_length"],
            batch["labels"],
            batch["label_length"],
            blank_id=blank_id,
        )
        w = batch["weight"]
        return (losses * w).sum() / jnp.maximum(w.sum(), 1.0)

    def train_step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return state.apply_gradients(grads=grads), loss

    def eval_step(params, batch):
        return loss_fn(params, batch)

    return train_step, eval_step


class Trainer:
    def __init__(
        self,
        config: DotDict | None = None,
        train_config: TrainConfig | None = None,
        mesh=None,
    ):
        self.config = config if config is not None else default_config()
        self.tcfg = train_config or TrainConfig()
        self.model = build_model(
            self.config,
            compute_dtype=jnp.dtype(self.tcfg.compute_dtype),
        )
        self.tx = build_optimizer(self.config.train.opt)
        self.mesh = mesh if mesh is not None else make_mesh(
            data=self.tcfg.mesh_data, model=self.tcfg.mesh_model
        )

        params = init_params(self.model, jax.random.PRNGKey(self.tcfg.seed))
        self._pshard = param_shardings(params, self.mesh)
        params = jax.device_put(params, self._pshard)
        self.state = train_state.TrainState.create(
            apply_fn=self.model.apply, params=params, tx=self.tx
        )

        self._batch_shard = {
            "signal": NamedSharding(self.mesh, P("data", None)),
            "labels": NamedSharding(self.mesh, P("data", None)),
            "input_length": NamedSharding(self.mesh, P("data")),
            "label_length": NamedSharding(self.mesh, P("data")),
            "weight": NamedSharding(self.mesh, P("data")),
        }
        train_step, eval_step = make_train_step(
            self.model, self.tx, self.tcfg.blank_id
        )
        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

        self._ckpt_mgr = None
        self._best_mgr = None
        self.best_val_loss = float("inf")
        self.best_epoch: int | None = None
        if self.tcfg.checkpoint_dir:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                Path(self.tcfg.checkpoint_dir).absolute(),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.tcfg.keep_checkpoints
                ),
            )
            # best-on-val-loss checkpoint (reference ModelCheckpoint
            # monitor='val_loss' save_best_only, train.py:72-78), kept in
            # its own directory so the keep-N rotation never deletes it
            self._best_mgr = ocp.CheckpointManager(
                Path(self.tcfg.checkpoint_dir).absolute() / "best",
                options=ocp.CheckpointManagerOptions(max_to_keep=1),
            )
        self._writers = []
        if self.tcfg.log_dir:
            Path(self.tcfg.log_dir).mkdir(parents=True, exist_ok=True)
            self._jsonl = open(
                Path(self.tcfg.log_dir) / "metrics.jsonl", "a"
            )
            try:
                from radian_tpu.utils.tensorboard import EventWriter

                self._writers.append(EventWriter(self.tcfg.log_dir))
            except Exception:
                pass
        else:
            self._jsonl = None

    # -- checkpointing ----------------------------------------------------

    def _payload(self, epoch: int, val_loss: float | None) -> dict:
        return {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": int(self.state.step),
            "epoch": epoch,
            "val_loss": float("nan") if val_loss is None else float(val_loss),
        }

    def save_checkpoint(self, epoch: int, val_loss: float | None = None) -> None:
        """Save the epoch checkpoint; when ``val_loss`` improves on the
        best seen so far, also update the best-on-val checkpoint
        (reference ModelCheckpoint monitor='val_loss', train.py:72-78)."""
        if self._ckpt_mgr is None:
            return
        import orbax.checkpoint as ocp

        payload = self._payload(epoch, val_loss)
        self._ckpt_mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._ckpt_mgr.wait_until_finished()
        if val_loss is not None and float(val_loss) < self.best_val_loss:
            self.best_val_loss = float(val_loss)
            self.best_epoch = epoch
            self._best_mgr.save(epoch, args=ocp.args.StandardSave(payload))
            self._best_mgr.wait_until_finished()

    def _restore_from(self, mgr, epoch: int | None) -> int:
        import orbax.checkpoint as ocp

        if epoch is None:
            epoch = mgr.latest_step()
            if epoch is None:
                return 0
        template = self._payload(0, None)
        restored = mgr.restore(
            epoch, args=ocp.args.StandardRestore(template)
        )
        self.state = self.state.replace(
            params=jax.device_put(restored["params"], self._pshard),
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return int(restored["epoch"]) + 1

    def restore_checkpoint(self, epoch: int | None = None) -> int:
        """Restore params *and* optimizer state; returns the epoch to
        resume from (reference resume loses optimizer state,
        model.py:33-40 — fixed here)."""
        return self._restore_from(self._ckpt_mgr, epoch)

    def restore_best_checkpoint(self) -> int:
        """Restore the best-on-val-loss checkpoint; returns the epoch
        after the one restored (0 if no best checkpoint exists)."""
        return self._restore_from(self._best_mgr, None)

    def update_learning_rate(self, new_rate: float) -> None:
        """Mid-training LR override that PRESERVES optimizer state
        (moments), the counterpart of the reference's
        ``update_learning_rate`` (reference radian/model.py:155-158,
        which set_value's the live Keras optimizer's lr).  Rebuilds the
        optax transform with the new rate and swaps it into the train
        state; the first step after the swap recompiles (the transform
        is part of the state's treedef).  For SCHEDULED decay prefer an
        optax schedule in the config (train.opt.cc_opt) — this hook is
        for the reference's manual-restart workflow."""
        c = self.config.train.opt
        kind = c.get("type", "adam")
        if kind == "cc_opt":
            c.cc_opt.init_rate = float(new_rate)
        else:
            c[kind].lr = float(new_rate)
        self.tx = build_optimizer(c)
        self.state = self.state.replace(tx=self.tx)

    # -- logging ----------------------------------------------------------

    def _log(self, tag: str, value: float, step: int) -> None:
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": step,
                            "time": time.time()}) + "\n"
            )
            self._jsonl.flush()
        for w in self._writers:
            w.scalar(tag, float(value), step)

    # -- loops ------------------------------------------------------------

    def _host_batch(self, batch: dict) -> dict:
        """Pad a host batch to a multiple of the data axis with
        zero-weight filler rows so short final batches still run."""
        n = batch["signal"].shape[0]
        d = self.mesh.shape["data"]
        pad = -n % d
        out = {}
        weight = np.ones(n, np.float32)
        for k, v in batch.items():
            v = np.asarray(v)
            if pad:
                filler = np.repeat(v[:1], pad, axis=0)
                v = np.concatenate([v, filler], axis=0)
            out[k] = v
        if pad:
            weight = np.concatenate([weight, np.zeros(pad, np.float32)])
        out["weight"] = weight
        return out

    def _put_batch(self, batch: dict):
        """Shard a host batch onto the mesh."""
        return {
            k: jax.device_put(jnp.asarray(v), self._batch_shard[k])
            for k, v in self._host_batch(batch).items()
        }

    # -- device-resident epoch scan ---------------------------------------

    def preload_batches(self, batches: list[dict]):
        """Stack equal-shape host batches into device-resident arrays.

        Over a remote-device link (axon tunnel) the per-step host→device
        round trip dominates training (measured round 4: ~1.46 s/step at
        128×1024 — 40× the 36 ms device step).  Uploading the whole
        batch pool ONCE and scanning epochs on device
        (:meth:`train_epoch_scan`) removes every per-step round trip.
        Returns the stacked pytree ({k: [S, ...]}) to pass to the scan.
        A short final batch is padded to the pool's row count with
        zero-weight filler so every slice has one static shape.
        """
        proc = [self._host_batch(b) for b in batches]
        rows = max(p["signal"].shape[0] for p in proc)
        for p in proc:
            pad = rows - p["signal"].shape[0]
            if pad:
                for k, v in p.items():
                    filler = (np.zeros((pad,) + v.shape[1:], v.dtype)
                              if k == "weight"
                              else np.repeat(v[:1], pad, axis=0))
                    p[k] = np.concatenate([v, filler], axis=0)
        stacked = {
            k: np.stack([p[k] for p in proc]) for k in proc[0]
        }
        shard = {
            k: NamedSharding(
                self.mesh, P(None, *self._batch_shard[k].spec)
            )
            for k in stacked
        }
        return {
            k: jax.device_put(jnp.asarray(v), shard[k])
            for k, v in stacked.items()
        }

    def _epoch_scan_fns(self):
        if not hasattr(self, "_scan_jit"):
            train_step, eval_step = make_train_step(
                self.model, self.tx, self.tcfg.blank_id
            )

            def train_scan(state, stacked, idxs):
                def body(st, i):
                    batch = jax.tree.map(lambda x: x[i], stacked)
                    st, loss = train_step(st, batch)
                    return st, loss

                return jax.lax.scan(body, state, idxs)

            def eval_scan(params, stacked):
                def body(_, i):
                    batch = jax.tree.map(lambda x: x[i], stacked)
                    return None, eval_step(params, batch)

                n = stacked["signal"].shape[0]
                _, losses = jax.lax.scan(
                    body, None, jnp.arange(n, dtype=jnp.int32)
                )
                return losses.mean()

            self._scan_jit = jax.jit(train_scan, donate_argnums=(0,))
            self._eval_scan_jit = jax.jit(eval_scan)
        return self._scan_jit, self._eval_scan_jit

    def train_epoch_scan(self, stacked, epoch: int, steps: int,
                         start: int = 0) -> float:
        """One jitted ``lax.scan`` over ``steps`` train steps — a single
        dispatch per epoch.  ``start`` cycles through the pool
        (batch for step s = ``stacked[(start + s) % S]``)."""
        train_scan, _ = self._epoch_scan_fns()
        s_total = int(jax.tree.leaves(stacked)[0].shape[0])
        idxs = (start + jnp.arange(steps, dtype=jnp.int32)) % s_total
        t0 = time.time()
        self.state, losses = train_scan(self.state, stacked, idxs)
        losses = np.asarray(losses)
        step = int(self.state.step)
        for i in range(0, len(losses), self.tcfg.log_every):
            chunk = losses[i : i + self.tcfg.log_every]
            self._log("train/loss", float(chunk.mean()),
                      step - len(losses) + i + len(chunk))
        n_windows = steps * stacked["signal"].shape[1]
        self._log("train/windows_per_s",
                  n_windows / max(time.time() - t0, 1e-9), step)
        mean = float(losses.mean())
        self._log("train/epoch_loss", mean, epoch)
        return mean

    def evaluate_scan(self, stacked, epoch: int | None = None,
                      tag: str = "val/loss") -> float:
        """Jitted full-pool eval — one dispatch."""
        _, eval_scan = self._epoch_scan_fns()
        mean = float(eval_scan(self.state.params, stacked))
        if epoch is not None:
            self._log(tag, mean, epoch)
        return mean

    def train_epoch(self, dataset: Iterable[dict], epoch: int) -> float:
        losses = []
        t0 = time.time()
        n_windows = 0
        for i, batch in enumerate(dataset):
            if (
                self.tcfg.steps_per_epoch is not None
                and i >= self.tcfg.steps_per_epoch
            ):
                break
            n_windows += batch["signal"].shape[0]
            self.state, loss = self._train_step(self.state, self._put_batch(batch))
            losses.append(loss)
            if (i + 1) % self.tcfg.log_every == 0:
                l = float(jnp.stack(losses[-self.tcfg.log_every:]).mean())
                step = int(self.state.step)
                self._log("train/loss", l, step)
                rate = n_windows / (time.time() - t0)
                self._log("train/windows_per_s", rate, step)
        mean = float(jnp.stack(losses).mean()) if losses else float("nan")
        self._log("train/epoch_loss", mean, epoch)
        return mean

    def edit_distance_eval(self, dataset: Iterable[dict],
                           epoch: int | None = None,
                           tag: str = "val/edit_distance") -> float:
        """Greedy-decode edit distance on a dataset — the working version
        of the reference's no-op EditDistanceCallback (train.py:31-46)."""
        from radian_tpu.ops.greedy import batch_mean_edit_distance

        dists, weights = [], []
        fwd = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x[..., None])
        )
        for batch in dataset:
            lp = fwd(self.state.params, jnp.asarray(batch["signal"]))
            dists.append(
                batch_mean_edit_distance(
                    lp, batch["labels"], batch["label_length"],
                    batch.get("input_length"),
                )
            )
            weights.append(batch["signal"].shape[0])
        mean = float(np.average(dists, weights=weights)) if dists else float("nan")
        if epoch is not None:
            self._log(tag, mean, epoch)
        return mean

    def evaluate(self, dataset: Iterable[dict], epoch: int | None = None,
                 tag: str = "val/loss") -> float:
        losses, weights = [], []
        for batch in dataset:
            loss = self._eval_step(self.state.params, self._put_batch(batch))
            losses.append(float(loss))
            weights.append(batch["signal"].shape[0])
        mean = float(np.average(losses, weights=weights)) if losses else float("nan")
        if epoch is not None:
            self._log(tag, mean, epoch)
        return mean

    def fit(
        self,
        train_data_factory,
        val_data_factory=None,
        n_epochs: int | None = None,
        initial_epoch: int = 0,
        val_freq: int | None = None,
        epoch_scan: bool = False,
        eval_edit_distance: bool = False,
    ) -> dict:
        """Run the training loop (reference fit loop, train.py:82-90).

        ``*_factory`` are zero-arg callables returning fresh iterables
        (datasets are restarted per epoch in val mode).

        ``epoch_scan=True`` uploads the whole batch pool once
        (:meth:`preload_batches`) and runs each epoch as ONE jitted
        ``lax.scan`` dispatch — 11× end-to-end over a remote-device link
        (NOTES round 4: 7.2k vs 0.6k windows/s).  The pool must fit
        device memory; with ``steps_per_epoch`` set, epochs cycle
        through the pool via the scan's ``start`` offset.  Val eval
        runs as one jitted scan too.  Losses match the per-step path
        exactly (same step program, tested).

        ``eval_edit_distance=True`` additionally runs the greedy-decode
        edit-distance metric on the val pool at each val epoch — the
        working version of the reference's no-op EditDistanceCallback
        (train.py:31-46).
        """
        n_epochs = n_epochs or self.config.train.n_epochs
        val_freq = val_freq or self.config.train.val_freq
        history = {"train_loss": [], "val_loss": [],
                   "val_edit_distance": []}

        val_batches = (list(val_data_factory())
                       if val_data_factory is not None else None)

        if epoch_scan:
            train_batches = list(train_data_factory())
            stacked = self.preload_batches(train_batches)
            pool = len(train_batches)
            steps = self.tcfg.steps_per_epoch or pool
            val_stacked = (self.preload_batches(val_batches)
                           if val_batches else None)
        else:
            train_iter = iter(train_data_factory())

        for epoch in range(initial_epoch, n_epochs):
            if epoch_scan:
                start = (((epoch - initial_epoch) * steps) % pool
                         if self.tcfg.steps_per_epoch is not None else 0)
                tl = self.train_epoch_scan(stacked, epoch, steps,
                                           start=start)
            else:
                source = (
                    train_iter
                    if self.tcfg.steps_per_epoch is not None
                    else train_data_factory()
                )
                tl = self.train_epoch(source, epoch)
            history["train_loss"].append(tl)
            vl = None
            if val_batches and (epoch + 1) % val_freq == 0:
                vl = (self.evaluate_scan(val_stacked, epoch)
                      if epoch_scan else self.evaluate(val_batches, epoch))
                history["val_loss"].append(vl)
                if eval_edit_distance:
                    ed = self.edit_distance_eval(val_batches, epoch)
                    history["val_edit_distance"].append(ed)
            self.save_checkpoint(epoch, val_loss=vl)
        return history
