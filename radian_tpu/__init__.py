"""radian-tpu: a TPU-native nanopore direct-RNA basecalling framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
comprna/radian (reference: /root/reference/radian): signal preprocessing,
a TCN sig2seq model, CTC beam-search decoding with 12-mer mRNA language
model fusion, chunk/global assembly, CTC training with data-parallel
gradient sync, checkpointing, and identity-based evaluation.

Subpackages
-----------
- ``radian_tpu.ops``       device ops: preprocessing, assembly, CTC loss, beam search
- ``radian_tpu.models``    the sig2seq TCN network (flax) + keras-h5 weight import
- ``radian_tpu.lm``        12-mer mRNA language model tables
- ``radian_tpu.io``        host I/O: fast5, fasta, tfrecord
- ``radian_tpu.parallel``  meshes, sharding, multi-host helpers
- ``radian_tpu.train``     training loop, optimizers, checkpoints
- ``radian_tpu.eval``      read-identity evaluation tooling
- ``radian_tpu.cli``       basecall / train command-line drivers
"""

__version__ = "0.1.0"


def load_basecaller(*args, **kwargs):
    """Convenience re-export of :func:`radian_tpu.pipeline.load_basecaller`."""
    from radian_tpu.pipeline import load_basecaller as _lb

    return _lb(*args, **kwargs)
