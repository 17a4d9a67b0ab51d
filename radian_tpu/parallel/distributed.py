"""Multi-host orchestration.

Training: `initialize()` wires `jax.distributed` (TPU pods discover peers
automatically; explicit coordinator args supported for CPU fleets) —
replacing the reference's TF_CONFIG / tensorflow_nodefile cluster
bootstrap (reference radian/train.py:123-133).

Inference: reads are sharded round-robin across hosts by read index;
each host basecalls its share with a fully replicated model + LM table
and writes its own fasta shard (``reads-h<proc>-<n>.fasta``), merged
deterministically by read order afterwards if desired.  Aggregate
counters ride a psum over the 'data' axis.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up multi-host JAX (no-op in single-process runs)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def host_read_indices(n_reads: int, process_index: int | None = None,
                      process_count: int | None = None) -> list[int]:
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(range(pi, n_reads, pc))


def basecall_sharded(basecaller, fast5_dir, fasta_dir, verbose: bool = True):
    """Each host basecalls its round-robin share of the reads."""
    from radian_tpu.io.fast5 import iter_fast5_dir
    from radian_tpu.io.fasta import FastaWriter

    reads = list(iter_fast5_dir(fast5_dir))
    mine = host_read_indices(len(reads))
    pi = jax.process_index()
    t0 = time.time()
    seqs = basecaller.basecall_signals([reads[i].signal for i in mine])
    n_written = 0
    with FastaWriter(fasta_dir, basecaller.options.reads_per_fasta,
                     prefix=f"reads-h{pi}") as w:
        for idx, seq in zip(mine, seqs):
            if seq is None:
                continue
            w.write(reads[idx].read_id, seq)
            n_written += 1
    if verbose:
        dt = time.time() - t0
        print(
            f"[host {pi}/{jax.process_count()}] {n_written}/{len(mine)} reads "
            f"in {dt:.2f}s ({n_written / dt:.2f} reads/s)"
        )
    return n_written


def merge_fasta_shards(fasta_dir: str | Path, out_path: str | Path,
                       read_order: list[str] | None = None) -> int:
    """Deterministic merge of per-host fasta shards (by read order or id)."""
    from radian_tpu.io.fasta import read_fasta

    merged: dict[str, str] = {}
    for p in sorted(Path(fasta_dir).glob("reads-h*.fasta")):
        merged.update(read_fasta(p))
    order = read_order if read_order is not None else sorted(merged)
    with open(out_path, "w") as f:
        for rid in order:
            if rid in merged:
                f.write(f">{rid}\n{merged[rid]}\n")
    return len(merged)
