"""Single-process multi-chip inference: a Basecaller sharded over an
8-device 'data' mesh must produce exactly the single-device sequences
(reads are independent — shard_map with no collectives)."""

import jax
import numpy as np
import pytest

# mesh execution also covered by the per-round dryrun
pytestmark = pytest.mark.slow

from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.models import build_model, init_params
from radian_tpu.parallel.mesh import make_mesh
from radian_tpu.pipeline import Basecaller, BasecallOptions


@pytest.fixture(scope="module")
def params():
    model = build_model()
    return init_params(model, jax.random.PRNGKey(0))


def _signals(rng, lens):
    return [
        (rng.normal(0, 30, size=n) + 400).astype(np.float32) for n in lens
    ]


@pytest.mark.parametrize("decode_type", ["global", "chunk"])
def test_mesh_matches_single_device(params, rng, decode_type):
    lens = [3000, 900, 2048, 1500, 4095, 1024, 2500, 700]
    sigs = _signals(rng, lens)
    lm = build_dense_tables(
        random_kmer_model(rng, context_len=3, n_contexts=40), 3
    )
    kw = dict(
        lm=lm if decode_type == "global" else None,
        options=BasecallOptions(
            read_batch=8, decode_type=decode_type, context_len=3
        ),
    )
    single = Basecaller(params, **kw).basecall_signals(sigs)
    mesh = make_mesh(data=8, model=1)
    sharded = Basecaller(params, mesh=mesh, **kw).basecall_signals(sigs)
    assert single == sharded
    assert all(s is not None for s in single)  # '' is legal (chunk-mode
    # single-fragment quirk on short reads); None = skipped read


def test_mesh_validation(params):
    mesh = make_mesh(data=8, model=1)
    with pytest.raises(ValueError):
        Basecaller(params, mesh=mesh,
                   options=BasecallOptions(read_batch=12))
    with pytest.raises(ValueError):
        Basecaller(
            params,
            mesh=jax.sharding.Mesh(np.array(jax.devices()), ("x",)),
            options=BasecallOptions(read_batch=8),
        )
