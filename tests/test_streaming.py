"""Streaming basecall: in-order flush, batch dispatch, bounded state."""

import numpy as np
import pytest

from radian_tpu.io.fast5 import Fast5Read
from radian_tpu.io.fasta import read_fasta
from radian_tpu.pipeline import Basecaller, BasecallOptions
from tests.test_pipeline_parity import shared_params, signals  # noqa: F401


def test_streaming_matches_batch_mode(shared_params, signals, tmp_path):  # noqa: F811
    reads = [
        Fast5Read(read_id=f"r{i:02d}", signal=s[:2000])
        for i, s in enumerate(signals[:2] * 3)
    ]
    bc = Basecaller(shared_params, options=BasecallOptions(read_batch=2))

    out_a = tmp_path / "batch"
    out_b = tmp_path / "stream"
    bc.basecall_directory(None, out_a, verbose=False, reads=reads)
    bc.basecall_directory(None, out_b, verbose=False, reads=iter(reads),
                          streaming=True)

    a = read_fasta(out_a / "reads-0.fasta")
    b = read_fasta(out_b / "reads-0.fasta")
    assert a == b
    assert len(a) == 6
    # streaming preserved input order in the fasta
    order = [l[1:].strip() for l in (out_b / "reads-0.fasta").read_text()
             .splitlines() if l.startswith(">")]
    assert order == [r.read_id for r in reads]


@pytest.mark.slow
def test_bucket_ladder_caps_programs():
    """A fixed bucket ladder routes lengths to ladder entries (overflow
    falls back to quantum rounding) and warmup() compiles each bucket."""
    import numpy as np
    from radian_tpu.config import default_config
    from radian_tpu.models import build_model, init_params
    from radian_tpu.pipeline import Basecaller, BasecallOptions
    import jax

    cfg = default_config()
    cfg.model.tcn.nb_filters = 16
    cfg.model.tcn.dilations = [1, 2]
    cfg.model.relu_units = 16
    cfg.model.timesteps = 256
    cfg.data.window_size = 256
    params = init_params(build_model(cfg), jax.random.PRNGKey(0))
    bc = Basecaller(params, config=cfg, options=BasecallOptions(
        chunk_len=256, step_size=64, read_batch=2,
        bucket_lengths=(512, 1024), bucket_quantum=512))
    assert bc._bucket(300) == 512
    assert bc._bucket(512) == 512
    assert bc._bucket(700) == 1024
    assert bc._bucket(1500) == 1536  # overflow -> quantum rounding
    dt = bc.warmup()
    assert dt > 0
    # warmed buckets decode real signals fine
    rng = np.random.default_rng(0)
    seqs = bc.basecall_signals([rng.integers(300, 700, 600).astype(np.int16)])
    assert seqs[0] is not None


@pytest.mark.slow
def test_streaming_chunk_fused(shared_params, signals, tmp_path):  # noqa: F811
    """Streaming mode over the fused chunk path matches batch mode."""
    reads = [
        Fast5Read(read_id=f"c{i:02d}", signal=s[:2400])
        for i, s in enumerate(signals[:3])
    ]
    bc = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", read_batch=2, bucket_quantum=1024
        ),
    )
    assert bc.use_chunk_fused
    out_a = tmp_path / "batch"
    out_b = tmp_path / "stream"
    bc.basecall_directory(None, out_a, verbose=False, reads=reads)
    bc.basecall_directory(None, out_b, verbose=False, reads=iter(reads),
                          streaming=True)
    a = read_fasta(out_a / "reads-0.fasta")
    b = read_fasta(out_b / "reads-0.fasta")
    assert a == b and len(a) == 3
