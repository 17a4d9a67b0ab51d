"""Two-process multi-host INFERENCE simulation.

Runs ``basecall_sharded`` + ``merge_fasta_shards`` across two real
processes joined via ``jax.distributed`` on CPU and asserts the merged
fasta equals the single-process pipeline's output on the same reads —
the output contract of the reference driver (reference
radian/basecall.py:128-138), scaled out per-host.  Complements
test_multihost_sim.py, which covers the training collective path.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest
import yaml

_TINY_MODEL = {
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

_WORKER = r"""
import os, sys, json
proc_id = int(sys.argv[1]); n_procs = int(sys.argv[2]); port = sys.argv[3]
cfg_path, fast5_dir, fasta_dir = sys.argv[4:7]
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

from radian_tpu.config import get_config
from radian_tpu.models import build_model, init_params
from radian_tpu.pipeline import Basecaller, BasecallOptions
from radian_tpu.parallel.distributed import basecall_sharded

cfg = get_config(cfg_path)
params = init_params(build_model(cfg), jax.random.PRNGKey(0))
bc = Basecaller(params, config=cfg, options=BasecallOptions(
    chunk_len=256, step_size=64, read_batch=2))
n = basecall_sharded(bc, fast5_dir, fasta_dir, verbose=False)
print(json.dumps({"proc": proc_id, "n_written": n}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_multi_fast5(path, reads):
    with h5py.File(path, "w") as f:
        for rid, signal in reads.items():
            g = f.create_group(f"read_{rid}")
            raw = g.create_group("Raw")
            raw.attrs["read_id"] = np.bytes_(rid.encode())
            raw.create_dataset("Signal", data=signal.astype(np.int16))
            ch = g.create_group("channel_id")
            ch.attrs["sampling_rate"] = 3012.0


@pytest.mark.slow
def test_two_process_sharded_inference_matches_single(tmp_path, rng):
    from radian_tpu.config import get_config
    from radian_tpu.io.fasta import read_fasta
    from radian_tpu.models import build_model, init_params
    from radian_tpu.parallel.distributed import merge_fasta_shards
    from radian_tpu.pipeline import Basecaller, BasecallOptions
    import jax

    fast5_dir = tmp_path / "fast5"
    fasta_dir = tmp_path / "fasta"
    fast5_dir.mkdir()
    fasta_dir.mkdir()
    reads = {
        f"read-{c}": rng.integers(300, 700, n)
        for c, n in zip("abcd", (1500, 2100, 1200, 1800))
    }
    _write_multi_fast5(fast5_dir / "batch0.fast5", reads)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(_TINY_MODEL))

    # single-process expected output (in-process, same seed/options)
    cfg = get_config(cfg_path)
    params = init_params(build_model(cfg), jax.random.PRNGKey(0))
    bc = Basecaller(params, config=cfg, options=BasecallOptions(
        chunk_len=256, step_size=64, read_batch=2))
    bc.basecall_directory(str(fast5_dir), str(tmp_path / "single"))
    expected = read_fasta(tmp_path / "single" / "reads-0.fasta")
    assert set(expected) == set(reads)

    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")}
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port),
             str(cfg_path), str(fast5_dir), str(fasta_dir)],
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
    assert sum(o["n_written"] for o in outs) == len(reads)

    # per-host shards exist and are disjoint
    shard_files = sorted(fasta_dir.glob("reads-h*.fasta"))
    assert len(shard_files) == 2
    ids0 = set(read_fasta(shard_files[0]))
    ids1 = set(read_fasta(shard_files[1]))
    assert ids0 and ids1 and not (ids0 & ids1)

    merged_path = tmp_path / "merged.fasta"
    n = merge_fasta_shards(fasta_dir, merged_path)
    assert n == len(reads)
    merged = read_fasta(merged_path)
    assert merged == expected
