"""Two-process multi-host simulation over jax.distributed on CPU.

Validates the multi-host story without a pod: two processes form a
cluster via ``jax.distributed.initialize``, each owning half the (CPU)
devices; the data-parallel gradient psum crosses process boundaries and
both processes converge to identical parameters — the TPU-native
equivalent of the reference's MultiWorkerMirroredStrategy sync training
(reference train.py:123-133).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import os, sys, json
import numpy as np

proc_id = int(sys.argv[1]); n_procs = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_procs, process_id=proc_id,
)
assert jax.process_count() == n_procs
assert len(jax.devices()) == n_procs * 2  # global devices

from radian_tpu.config import default_config
from radian_tpu.parallel.mesh import make_mesh
from radian_tpu.train.trainer import TrainConfig, Trainer
from radian_tpu.utils.synthetic import kmer_level_table, synth_windows

cfg = default_config()
cfg.model.tcn.nb_filters = 16
cfg.model.tcn.dilations = [1, 2]
cfg.model.relu_units = 16
cfg.model.timesteps = 128
cfg.data.window_size = 128
cfg.train.opt.adam.lr = 0.003

mesh = make_mesh(data=n_procs * 2, model=1)
trainer = Trainer(cfg, TrainConfig(checkpoint_dir=None, seed=0), mesh=mesh)

rng = np.random.default_rng(123)  # same data on both procs; global batch
levels = kmer_level_table(rng)
batches = [synth_windows(rng, 8, window=128, levels=levels) for _ in range(6)]

losses = []
for b in batches:
    # each process feeds its slice of the global batch
    per = 8 // n_procs
    local = {k: v[proc_id * per:(proc_id + 1) * per] for k, v in b.items()}
    local["weight"] = np.ones(per, np.float32)
    gb = {k: jax.make_array_from_process_local_data(
            trainer._batch_shard[k], np.asarray(local[k])) for k in local}
    trainer.state, loss = trainer._train_step(trainer.state, gb)
    losses.append(float(loss))

leaves = jax.tree_util.tree_leaves(trainer.state.params)
checksum = float(sum(float(np.asarray(x).astype(np.float64).sum()) for x in leaves))
print(json.dumps({"proc": proc_id, "losses": losses, "checksum": checksum}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel_training(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")}
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=str(Path(__file__).parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-3000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))

    # both processes observed identical losses and identical final params
    assert outs[0]["losses"] == outs[1]["losses"]
    assert outs[0]["checksum"] == outs[1]["checksum"]
    assert outs[0]["losses"][-1] < outs[0]["losses"][0]
