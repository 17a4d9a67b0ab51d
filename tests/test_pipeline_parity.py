"""End-to-end fasta parity: our TPU pipeline vs the reference pipeline.

The reference's trained weights are stripped from the snapshot, so both
stacks share deterministically-initialised weights (our model is the
weight source; the reference path consumes its softmax outputs, exactly
as the reference driver consumes sig_model.predict()).  Signals are the
real reads from data/reads.fast5, truncated to keep the pure-python
oracle decoder fast.
"""

import numpy as np
import pytest
import jax

from radian_tpu.io import iter_fast5_reads
from radian_tpu.lm import build_dense_tables, random_kmer_model
from radian_tpu.lm.kmer import KmerLM
from radian_tpu.models import build_model, init_params
from radian_tpu.pipeline import Basecaller, BasecallOptions
from tests import reference_oracle as oracle
from tests.test_beam_search import _DenseDictView


@pytest.fixture(scope="module")
def shared_params():
    model = build_model()
    return init_params(model, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def signals(reads_fast5_path):
    reads = sorted(
        iter_fast5_reads(reads_fast5_path), key=lambda r: len(r.signal)
    )
    return [r.signal for r in reads]


def _reference_pipeline(signal, params, decode_type="global", lm=None,
                        s_thr=0.5, r_thr=0.5, ctx_len=11, beam_width=6):
    """Reference driver dataflow (basecall.py:75-123), oracle modules +
    shared model weights."""
    ref_pp = oracle.preprocess()
    ref_ma = oracle.matrix_assembly()
    ref_sa = oracle.sequence_assembly()
    ref_de = oracle.decode()
    model = build_model()

    norm = ref_pp.mad_normalise(signal, 4)
    windows, pad = ref_pp.get_windows(norm, 1024, 128)
    probs = np.asarray(
        model.apply(
            {"params": params},
            windows.astype(np.float32)[..., None],
            probs=True,
        )
    )
    matrices = [probs[i] for i in range(probs.shape[0])]
    matrices[-1] = matrices[-1][:-pad]

    if decode_type == "global":
        mat = ref_ma.assemble_matrices(matrices, 128)
        seq = ref_de.beam_search(
            mat, "ACGT", beam_width, lm, s_thr, r_thr, ctx_len, {}
        )
    else:
        frags = [
            ref_de.beam_search(m, "ACGT", beam_width, None, None, None, None, None)
            for m in matrices
        ]
        consensus = ref_sa.simple_assembly(frags)
        seq = ref_sa.index2base(np.argmax(consensus, axis=0))
    return seq[::-1]


def test_global_mode_parity_no_lm(shared_params, signals):
    sigs = [signals[0][:2500], signals[1][:3000]]
    expected = [
        _reference_pipeline(s, shared_params, "global") for s in sigs
    ]
    bc = Basecaller(shared_params, options=BasecallOptions(read_batch=2))
    got = bc.basecall_signals(sigs)
    assert got == expected
    assert all(len(s) > 10 for s in got)


def test_global_mode_parity_with_lm(shared_params, signals):
    rng = np.random.default_rng(7)
    model_dict = random_kmer_model(rng, context_len=11, n_contexts=3000,
                                   concentration=0.2)
    lm = build_dense_tables(model_dict, 11)
    sigs = [signals[0][:2500]]
    # thresholds chosen so the gate actually fires on init-weight outputs
    expected = [
        _reference_pipeline(
            s, shared_params, "global", lm=_DenseDictView(lm),
            s_thr=0.1, r_thr=1.38, ctx_len=11,
        )
        for s in sigs
    ]
    bc = Basecaller(
        shared_params,
        lm=lm,
        options=BasecallOptions(sig_threshold=0.1, rna_threshold=1.38),
    )
    got = bc.basecall_signals(sigs)
    assert got == expected


def test_chunk_mode_parity(shared_params, signals):
    sigs = [signals[0][:1500]]
    expected = [
        _reference_pipeline(s, shared_params, "chunk") for s in sigs
    ]
    bc = Basecaller(
        shared_params, options=BasecallOptions(decode_type="chunk")
    )
    got = bc.basecall_signals(sigs)
    assert got == expected


@pytest.mark.slow
def test_chunk_fused_matches_windows(shared_params, signals):
    """The fused streaming chunk program (one full-read forward +
    zero-history head fix-up + in-scan decode + label compaction) decodes
    the same strings as the materialised windows path."""
    sigs = [signals[0][:3000], signals[1][:1100], signals[2][:4000]]
    outs = {}
    for prep in ("windows", "fused"):
        bc = Basecaller(
            shared_params,
            options=BasecallOptions(
                decode_type="chunk", chunk_prep=prep, read_batch=3,
                bucket_quantum=1024,
            ),
        )
        outs[prep] = bc.basecall_signals(sigs)
    assert outs["fused"] == outs["windows"]


def test_chunk_fused_overflow_raises(shared_params, signals):
    """A chunk_max_lab smaller than a window's emission count fails
    loudly instead of silently truncating the fragment."""
    import pytest

    bc = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", chunk_prep="fused", read_batch=1,
            bucket_quantum=1024, chunk_max_lab=2,
        ),
    )
    with pytest.raises(RuntimeError, match="chunk_max_lab"):
        bc.basecall_signals([signals[0][:1500]])


def test_skip_bad_reads(shared_params):
    """Constant signal (MAD=0) is skipped like the reference driver."""
    good = np.random.default_rng(0).integers(200, 800, 2000).astype(np.int16)
    flat = np.full(2000, 500, np.int16)
    bc = Basecaller(shared_params, options=BasecallOptions())
    out = bc.basecall_signals([good, flat])
    assert out[0] is not None
    assert out[1] is None


def test_directory_to_fasta(shared_params, signals, tmp_path, reads_fast5_path):
    """Full driver path on truncated signals: fasta written with read ids."""
    from radian_tpu.io.fast5 import Fast5Read
    from radian_tpu.io.fasta import read_fasta

    reads = [
        Fast5Read(read_id=f"id-{i}", signal=s[:2000])
        for i, s in enumerate(signals[:2])
    ]
    bc = Basecaller(shared_params, options=BasecallOptions(read_batch=2))
    n = bc.basecall_directory(None, tmp_path, verbose=False, reads=reads)
    assert n == 2
    out = read_fasta(tmp_path / "reads-0.fasta")
    assert set(out) == {"id-0", "id-1"}
    assert all(set(v) <= set("ACGT") and v for v in out.values())


@pytest.mark.slow
def test_lm_layout_autopick(rng):
    """Basecaller picks packed tables only under the measured ~2 MB
    crossover (NOTES round 3): a small sparse LM packs, a 200k-context
    LM stays dense."""
    import jax

    from radian_tpu.lm import build_dense_tables, random_kmer_model
    from radian_tpu.models import build_model, init_params
    from radian_tpu.pipeline import Basecaller, BasecallOptions

    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))

    small = build_dense_tables(
        random_kmer_model(rng, context_len=11, n_contexts=2_000,
                          concentration=0.2), 11)
    bc = Basecaller(params, lm=small,
                    options=BasecallOptions(context_len=11))
    assert bc._lm_packed
    assert bc._lm_t2.shape == (2_001, 5)  # uniform row + real rows

    big = build_dense_tables(
        random_kmer_model(rng, context_len=11, n_contexts=200_000,
                          concentration=0.2), 11)
    bc = Basecaller(params, lm=big,
                    options=BasecallOptions(context_len=11))
    assert not bc._lm_packed


@pytest.mark.slow
def test_global_parity_beam_width_8(shared_params, signals):
    """beam_width 8 == the Pallas kernel's WSUB boundary; exercises the
    selection/merge logic at full sublane occupancy (VERDICT r3 task 8)."""
    sigs = [signals[0][:2000]]
    expected = [
        _reference_pipeline(s, shared_params, "global", beam_width=8)
        for s in sigs
    ]
    bc = Basecaller(
        shared_params, options=BasecallOptions(read_batch=1, beam_width=8)
    )
    got = bc.basecall_signals(sigs)
    assert got == expected


@pytest.mark.slow
def test_chunk_parity_beam_width_8(shared_params, signals):
    sigs = [signals[0][:1500]]
    expected = [
        _reference_pipeline(s, shared_params, "chunk", beam_width=8)
        for s in sigs
    ]
    bc = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", read_batch=1, beam_width=8
        ),
    )
    got = bc.basecall_signals(sigs)
    assert got == expected


@pytest.mark.parametrize("ctx_len", [1, 12])
def test_global_parity_lm_ctx_edge(shared_params, signals, ctx_len):
    """LM context-length edges: 1 (minimum context) and 12 (one past the
    reference default; 4^12 contexts stress the base-4 packing)."""
    rng = np.random.default_rng(11 + ctx_len)
    model_dict = random_kmer_model(
        rng, context_len=ctx_len, n_contexts=min(4 ** ctx_len, 2000),
        concentration=0.2,
    )
    lm = build_dense_tables(model_dict, ctx_len)
    sigs = [signals[0][:1200]]
    expected = [
        _reference_pipeline(
            s, shared_params, "global", lm=_DenseDictView(lm),
            s_thr=0.1, r_thr=1.38, ctx_len=ctx_len,
        )
        for s in sigs
    ]
    bc = Basecaller(
        shared_params,
        lm=lm,
        options=BasecallOptions(
            sig_threshold=0.1, rna_threshold=1.38, context_len=ctx_len,
            read_batch=1,
        ),
    )
    got = bc.basecall_signals(sigs)
    assert got == expected


@pytest.mark.slow
def test_global_parity_lm_packed_and_dense(shared_params, signals,
                                           monkeypatch):
    """The packed-LM auto-pick is exercised e2e: the 3000-context LM
    packs under the threshold (packed path), and forcing the threshold
    to 0 runs the dense path — both must match the oracle exactly."""
    import radian_tpu.pipeline as pl

    rng = np.random.default_rng(7)
    model_dict = random_kmer_model(rng, context_len=11, n_contexts=3000,
                                   concentration=0.2)
    lm = build_dense_tables(model_dict, 11)
    sigs = [signals[0][:1200]]
    expected = [
        _reference_pipeline(
            s, shared_params, "global", lm=_DenseDictView(lm),
            s_thr=0.1, r_thr=1.38, ctx_len=11,
        )
        for s in sigs
    ]
    opts = BasecallOptions(sig_threshold=0.1, rna_threshold=1.38,
                           read_batch=1)
    bc = Basecaller(shared_params, lm=lm, options=opts)
    assert bc._lm_packed, "3000-context LM should auto-pick packed"
    assert bc.basecall_signals(sigs) == expected

    monkeypatch.setattr(pl, "PACKED_LM_MAX_BYTES", 0)
    bc_dense = Basecaller(shared_params, lm=lm, options=opts)
    assert not bc_dense._lm_packed
    assert bc_dense.basecall_signals(sigs) == expected


@pytest.mark.slow
def test_chunk_fullprobs_mode(shared_params, signals):
    """'fullprobs' (corrected, non-parity) chunk mode: window probs come
    from the full-read pass — runs end-to-end and emits base strings."""
    sigs = [signals[0][:3000], signals[1][:1100]]
    bc = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", chunk_prep="fullprobs", read_batch=2,
            bucket_quantum=1024,
        ),
    )
    assert bc.use_chunk_fused
    out = bc.basecall_signals(sigs)
    assert all(s and set(s) <= set("ACGT") for s in out)


@pytest.mark.slow
def test_lm_table_dtype_auto(rng):
    """'auto' stores LM tables bf16 only when the forward is bf16;
    explicit overrides win (the decoder promotes rows to f32 either
    way — see the 955-reads/s round-4 measurement in NOTES)."""
    import jax.numpy as jnp

    lm = build_dense_tables(
        random_kmer_model(rng, context_len=11, n_contexts=200_000,
                          concentration=0.2), 11)
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(0))

    bc = Basecaller(params, lm=lm, options=BasecallOptions())
    assert bc._lm_t1.dtype == jnp.float32  # f32 compute -> f32 tables

    bc = Basecaller(params, lm=lm, compute_dtype=jnp.bfloat16,
                    options=BasecallOptions())
    assert bc._lm_t1.dtype == jnp.bfloat16

    bc = Basecaller(params, lm=lm, compute_dtype=jnp.bfloat16,
                    options=BasecallOptions(lm_table_dtype="float32"))
    assert bc._lm_t1.dtype == jnp.float32


def test_auto_backend_beam_width_guard(shared_params, monkeypatch):
    """auto backend picks the Pallas kernel only when the beam fits its
    WSUB=8 sublane tile; wider beams fall back to the XLA scan instead
    of crashing (VERDICT r4 weakness 3)."""
    import radian_tpu.pipeline as pl

    monkeypatch.setattr(pl.jax, "default_backend", lambda: "tpu")
    bc = Basecaller(shared_params, options=BasecallOptions(beam_width=8))
    assert bc.use_pallas
    for width in (9, 16):
        bc = Basecaller(
            shared_params, options=BasecallOptions(beam_width=width)
        )
        assert not bc.use_pallas, f"width {width} must fall back to XLA"


@pytest.mark.parametrize("beam_width", [9, 16])
def test_chunk_parity_wide_beam(shared_params, signals, beam_width):
    """Widths past the Pallas WSUB boundary stay string-identical to the
    reference via the XLA scan backend (any width)."""
    sigs = [signals[0][:1500]]
    expected = [
        _reference_pipeline(s, shared_params, "chunk",
                            beam_width=beam_width)
        for s in sigs
    ]
    bc = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", read_batch=1, beam_width=beam_width
        ),
    )
    assert bc.basecall_signals(sigs) == expected


def test_chunk_overflow_uses_effective_cap(shared_params):
    """chunk_max_lab=6 packs to an effective 4-slot cap (multiple of 4);
    a window emitting 5 labels was silently truncated on device, so the
    overflow check must compare against the EFFECTIVE cap (ADVICE r4)."""
    bc = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", chunk_prep="fused", chunk_max_lab=6
        ),
    )
    pending = (
        "chunk", [0], 1, np.array([1.0]),
        np.zeros((1, 2, 2), np.uint8), np.array([2]),
        np.array([[5, 3]], np.int32),
    )
    with pytest.raises(RuntimeError, match="effective"):
        bc._collect_batch(pending, {})


@pytest.mark.slow
def test_chunk_tiled_crop_matches_global(shared_params, signals):
    """Tiled center-crop ('fullprobs' + chunk_crop): kept spans partition
    the read and all windows decode the same full-read probs, so the
    concatenated output closely tracks the global full-read decode even
    with noisy random-weight probs (with trained weights the two match
    in median identity — bench_data/trained/accuracy_chunk_crop.json).
    A single-window read IS the global decode: exact equality."""
    import difflib

    sigs = [signals[0][:4000], signals[1][:2500], signals[0][:900]]
    bc_g = Basecaller(
        shared_params, options=BasecallOptions(read_batch=3,
                                               bucket_quantum=1024)
    )
    bc_t = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", chunk_prep="fullprobs", chunk_crop=True,
            read_batch=3, bucket_quantum=1024,
        ),
    )
    assert bc_t.chunk_tiled
    glob = bc_g.basecall_signals(sigs)
    tiled = bc_t.basecall_signals(sigs)
    for g, t in zip(glob[:2], tiled[:2]):
        sim = difflib.SequenceMatcher(None, g, t).ratio()
        assert sim > 0.85, f"similarity {sim:.3f}"
    assert tiled[2] == glob[2]  # single window == global decode


def test_chunk_crop_off_keeps_consensus_path(shared_params, signals):
    """chunk_crop=False falls back to the overlapped-fragments consensus
    stitch (the previous fullprobs behavior)."""
    bc = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", chunk_prep="fullprobs",
            chunk_crop=False, read_batch=1, bucket_quantum=1024,
        ),
    )
    assert not bc.chunk_tiled
    out = bc.basecall_signals([signals[0][:2000]])
    assert out[0] and set(out[0]) <= set("ACGT")


def test_tiled_crop_spans_partition_exactly():
    """Pure-python mirror of the _chunk_fused tiled-crop geometry
    (same formulas): for every (read_len, stride) the kept spans must
    partition [0, len) exactly — no gap, no overlap — including the
    tail-window clip and single-window reads."""
    rf = 253
    for window, step in ((1024, 128), (512, 64), (2048, 256),
                         (1024, 256)):
      for stride in (1, 2, 4):
        off = window - (stride + 1) * step
        if off < rf - 1:
            continue  # constructor would clamp the stride down
        for ln in (200, 900, 1023, 1024, 1025, 1151, 1152, 1153,
                   2047, 2048, 2049, 4001, 5120, 13327):
            n_full = max((ln - window) // step + 1, 0)
            tail_start = n_full * step
            n_dec = (n_full + stride - 1) // stride + 1
            spans = []
            for d in range(n_dec):
                start = min(d * stride * step, tail_start)
                lens = (ln - tail_start) if d == n_dec - 1 else window
                lo = 0 if d == 0 else off
                if d == n_dec - 1:
                    hi = lens
                else:
                    hi = min(off + stride * step,
                             tail_start + off - start)
                spans.append((start + lo, start + hi))
            covered = []
            for a, b in spans:
                covered.extend(range(a, b))
            assert covered == list(range(ln)), (
                f"stride {stride} len {ln}: spans {spans}"
            )


def test_chunk_tiled_crop_fast(shared_params, signals):
    """Fast-gate coverage of the tiled crop: a sub-window read's tiled
    decode IS the global decode (exact), and a small multi-window read
    tracks it closely."""
    import difflib

    sigs = [signals[0][:900], signals[1][:2500]]
    bc_g = Basecaller(
        shared_params, options=BasecallOptions(read_batch=2,
                                               bucket_quantum=1024)
    )
    bc_t = Basecaller(
        shared_params,
        options=BasecallOptions(
            decode_type="chunk", chunk_prep="fullprobs", chunk_crop=True,
            read_batch=2, bucket_quantum=1024,
        ),
    )
    glob = bc_g.basecall_signals(sigs)
    tiled = bc_t.basecall_signals(sigs)
    assert tiled[0] == glob[0]
    sim = difflib.SequenceMatcher(None, glob[1], tiled[1]).ratio()
    assert sim > 0.85, f"similarity {sim:.3f}"


@pytest.mark.slow
def test_chunk_tiled_lm_matches_global_lm(shared_params, signals, rng):
    """LM-fused tiled chunk (chunk_lm): a sub-window read decodes
    IDENTICALLY to global+LM (same probs, same gated fusion); a
    multi-window read tracks it closely.  chunk_lm without lm= or
    without the tiled crop raises."""
    import difflib

    from radian_tpu.lm import build_dense_tables, random_kmer_model

    lm = build_dense_tables(
        random_kmer_model(rng, context_len=4, concentration=0.3), 4
    )
    sigs = [signals[0][:900], signals[1][:2500]]
    bc_g = Basecaller(
        shared_params, lm=lm,
        options=BasecallOptions(read_batch=2, bucket_quantum=1024,
                                context_len=4),
    )
    bc_t = Basecaller(
        shared_params, lm=lm,
        options=BasecallOptions(
            decode_type="chunk", chunk_prep="fullprobs", chunk_crop=True,
            chunk_lm=True, context_len=4, read_batch=2,
            bucket_quantum=1024,
        ),
    )
    glob = bc_g.basecall_signals(sigs)
    tiled = bc_t.basecall_signals(sigs)
    assert tiled[0] == glob[0]  # single window == global+LM decode
    sim = difflib.SequenceMatcher(None, glob[1], tiled[1]).ratio()
    assert sim > 0.85, f"similarity {sim:.3f}"

    with pytest.raises(ValueError, match="chunk_lm"):
        Basecaller(
            shared_params,  # no lm
            options=BasecallOptions(
                decode_type="chunk", chunk_prep="fullprobs",
                chunk_lm=True,
            ),
        )
    with pytest.raises(ValueError, match="chunk_lm"):
        Basecaller(
            shared_params, lm=lm,
            options=BasecallOptions(
                decode_type="chunk", chunk_prep="fullprobs",
                chunk_crop=False, chunk_lm=True, context_len=4,
            ),
        )
