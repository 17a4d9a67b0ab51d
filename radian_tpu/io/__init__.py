from radian_tpu.io.fast5 import Fast5Read, iter_fast5_reads, iter_fast5_dir  # noqa: F401
from radian_tpu.io.fasta import FastaWriter, read_fasta  # noqa: F401
