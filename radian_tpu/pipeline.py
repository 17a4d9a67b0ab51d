"""End-to-end basecalling pipeline.

Replaces the reference driver loop (reference radian/basecall.py:64-141)
with a TPU-resident pipeline: reads are grouped into length buckets and
batched, and one jitted program per bucket runs

  device: MAD-normalise → window → sig2seq model → (global) matrix
          assembly → full-read CTC+LM beam search
  host:   fast5 ingest, bucketing, (chunk mode) fragment consensus,
          fasta output

so the only per-read host↔device traffic is the raw signal in and the
backtraced label string out.  Decode semantics (global vs chunk, LM
gating, fasta orientation, 1000-reads-per-file rollover, skip-read on
bad signal) match the reference driver exactly.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from radian_tpu.config import DotDict, default_config
from radian_tpu.io.fast5 import Fast5Read, iter_fast5_dir
from radian_tpu.io.fasta import FastaWriter
from radian_tpu.lm.kmer import KmerLM, load_kmer_json
from radian_tpu.models.checkpoint import load_params_npz
from radian_tpu.models.sig2seq import SigToSeq, build_model, init_params
from radian_tpu.ops.assembly import assemble_matrices
from radian_tpu.ops.beam_search import (
    beam_search_batch,
    labels_to_seq,
    pack_labels,
    pack_labels2,
    rows_to_seqs,
    unpack_labels,
    unpack_labels2,
)
from radian_tpu.ops.consensus import assemble_fragments
from radian_tpu.ops.preprocess import (
    bucket_length,
    mad_normalise,
    max_windows_for,
    preprocess_read,
    preprocess_read_strips,
)


# Widest beam the Pallas kernel's sublane tile holds (== beam_pallas.WSUB;
# kept as a literal so CPU-only hosts never import the pallas module).
PALLAS_MAX_BEAM = 8

# Shared host thread pool for the chunk-mode stitch (the native consensus
# call releases the GIL, so threads genuinely parallelise it).
_STITCH_POOL = None


def _stitch_pool():
    global _STITCH_POOL
    if _STITCH_POOL is None:
        import concurrent.futures
        import os as _os

        _STITCH_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=min(8, _os.cpu_count() or 1),
            thread_name_prefix="radian-stitch",
        )
    return _STITCH_POOL


# Packed-vs-dense LM layout crossover (bytes of the packed working set).
# Backed by the 4×5-cell production-decoder sweep in
# scripts/exp_packed_crossover.py (bench_data/packed_crossover.json,
# N ∈ {64,128,256,512} × packed {1.4, 2.0, 3.2, 5.0} MB vs dense 84 MB):
# packed wins at ≤2.0 MB at EVERY batch size (e.g. N=256: 23.8-24.7 vs
# 34.8 dense µs/step; N=512: 32-41 vs 70), is borderline at 3.2 MB
# (wins at N≥128, loses at N=64), and loses at 5.0 MB — so 3 MB is a
# batch-size-robust conservative cut.  Override per run with
# BasecallOptions.packed_lm_max_bytes.
PACKED_LM_MAX_BYTES = 3_000_000


def _packed_lm_bound_bytes(lm: KmerLM) -> int:
    """Cheap upper bound on ``lm.compressed()``'s packed size, WITHOUT
    building it — ``compressed()`` on a mask-less full-size table runs an
    ``np.unique`` row-sort over all 4^ctx × 5 rows (seconds) just to
    discover the result is over-threshold.

    l1 is always ``ceil(R/32) × 8`` bytes; vals is ``(n_real+1) × 20``.
    With ``real_mask`` the bound is exact; without it the worst case
    (every row distinct, e.g. an analytic Markov table) is assumed.
    """
    r = lm.n_contexts
    l1_bytes = -(-r // 32) * 8
    n_real = int(lm.real_mask.sum()) if lm.real_mask is not None else r
    return l1_bytes + (n_real + 1) * 20


@dataclasses.dataclass(frozen=True)
class BasecallOptions:
    """Decode options (defaults = reference basecall.py:19-37 CLI defaults)."""

    chunk_len: int = 1024
    step_size: int = 128
    outlier_clip: float = 4.0
    beam_width: int = 6
    decode_type: str = "global"  # 'global' | 'chunk'
    sig_threshold: float = 0.5
    rna_threshold: float = 0.5
    context_len: int = 11
    assembly_mode: str = "first"  # reference parity; 'mean' = corrected
    read_batch: int = 8  # reads decoded concurrently (global mode)
    bucket_quantum: int = 4096
    # Optional fixed bucket ladder: read lengths round up to the smallest
    # entry, capping the number of compiled programs regardless of the
    # read-length distribution (reads longer than the top entry fall back
    # to quantum rounding).  With a ladder set, Basecaller.warmup()
    # pre-compiles every bucket program (into the on-disk JAX compile
    # cache when JAX_COMPILATION_CACHE_DIR is set) so fresh processes
    # skip compilation entirely.
    bucket_lengths: tuple[int, ...] | None = None
    reads_per_fasta: int = 1000
    # 'auto' = pallas kernel for no-LM decodes on TPU, XLA scan otherwise
    decode_backend: str = "auto"  # 'auto' | 'xla' | 'pallas'
    # chunk-mode consensus: 'reference' = host difflib (parity),
    # 'device' = jitted offset-correlation stitcher
    consensus: str = "reference"
    # global+'first' forward: 'fullread' runs ONE causal TCN pass over the
    # whole normalised read — the "first"-assembled matrix row at timestep
    # t IS the model's causal output at absolute position t (see
    # ops/preprocess.py: strip_signal), so windowing is skipped entirely
    # (T conv sample-steps vs ~3T for 'strips' and 8T for 'windows');
    # 'strips' computes each window's kept step-wide output slab
    # (+ receptive-field warm-up context); 'windows' is the full-window
    # path (required for mode='mean' and chunk decode, where it always
    # applies).  All three produce the same values up to float order.
    prep_mode: str = "auto"  # 'auto' | 'fullread' | 'strips' | 'windows'
    # chunk-mode execution: 'fused' streams window slabs through one
    # full-read forward + per-window head fix-up + in-scan decode with
    # on-device label compaction (see _chunk_fused) — no [N, W, T, 5]
    # probs tensor, so read_batch 256 fits; 'windows' is the original
    # materialised path.  'auto' = fused when the geometry allows.
    # 'fullprobs' is the CORRECTED (non-parity) variant: window probs
    # are sliced straight from the full-read pass, so every window sees
    # its true left context instead of the reference's zero history —
    # no head fix-up forward (1× FLOPs) and measurably better fragments
    # (the zero-history heads cost ~4 identity points, NOTES round 4).
    chunk_prep: str = "auto"  # 'auto' | 'fused' | 'fullprobs' | 'windows'
    chunk_slab: int = 4  # windows decoded per scan step in the fused path
    # per-window emission cap for the fused path's label compaction;
    # overflow raises on the host (never silent).  Random weights can
    # emit ~0.45 labels/step (437 observed in tests), so the default
    # stays at chunk_len/2; trained weights emit ~1 base per ~12+
    # samples — tune down (e.g. 128) for less device→host traffic.
    chunk_max_lab: int = 512
    # tiled center-cropped decoding for the corrected 'fullprobs' mode:
    # each decoded window keeps only its center emission span
    # [off, off + stride*step) with off = window - (stride+1)*step
    # (maximal decode warm-up, >= RF-1; one step of right margin), so
    # kept spans PARTITION the read
    # and the stitch is plain concatenation — no consensus-displacement
    # estimation (which is ambiguous on repetitive sequence) and no CTC
    # decode boundary artifacts (every kept emission has >= RF-1 decode
    # warm-up left and >= window-off-step margin right; in fullprobs
    # mode all windows decode the same full-read probs, so warm decodes
    # agree).  First/last windows keep their read edges.  Ignored by
    # the parity modes ('fused'/'windows').
    chunk_crop: bool = True
    # decode stride for the tiled crop: decode every K-th window with a
    # K*step-wide kept span (same exact partition, ~K x less beam-search
    # work).  Clamped down automatically to keep >= RF-1 warm-up and
    # >= step right margin inside the window.  Measured (round 5): 1 ->
    # 545, 2 -> 917, 4 -> 898 reads/s on the chunk bench; stride 2 keeps
    # 640 samples of warm-up (seam-robust even on near-uniform
    # random-weight probs, where stride 4's 384 shows seam divergence),
    # so 2 is the default.
    chunk_crop_stride: int = 2
    # fuse the gated k-mer LM inside the tiled chunk decode (requires
    # lm= and the tiled crop): the low-latency serving counterpart of
    # global+LM — windows decode in parallel (1024-step scans, 29-40 ms
    # warm single-read latency) while fusion contexts at kept positions
    # are the true read contexts (>= 16 bases of decode warm-up >
    # ctx_len 11).  Gather traffic grows with window count, so bulk
    # throughput users should keep this off and use global mode.
    chunk_lm: bool = False
    # packed-LM layout cut in bytes (None = module PACKED_LM_MAX_BYTES,
    # measured batch-size-robust; see scripts/exp_packed_crossover.py)
    packed_lm_max_bytes: int | None = None
    # LM table storage dtype: the decoder's per-step gather cost tracks
    # the table's random-access span, so bf16 storage (42 MB vs 84 MB
    # dense) cuts the LM decode step 36.2 → 26.7 µs at N=256 (measured
    # round 4).  'auto' = bfloat16 when the forward runs in bfloat16
    # (production), float32 otherwise (exact reference parity).  Fusion
    # math still runs in f32 on the gathered rows.
    lm_table_dtype: str = "auto"  # 'auto' | 'float32' | 'bfloat16'


def _prep_and_model(
    params, signals, lengths, *, model: SigToSeq, opts: BasecallOptions,
    max_windows: int,
):
    """[N, L] padded signals → per-window probs [N, max_w, chunk, 5]."""

    def one(sig, n):
        return preprocess_read(
            sig, n, opts.chunk_len, opts.step_size, max_windows,
            opts.outlier_clip,
        )

    windows, n_wins, pad_ends, mads = jax.vmap(one)(signals, lengths)
    n, w, t = windows.shape
    probs = model.apply(
        {"params": params}, windows.reshape(n * w, t, 1), probs=True
    ).reshape(n, w, t, -1)
    return probs, n_wins, pad_ends, mads


def _first_renorm_trim(mats, n_wins, pad_ends, *, window: int, step: int):
    """Reference "first"-assembly post-pass on an ``[N, T, 5]`` matrix.

    Rows covered by >1 window are L1-renormalised
    (reference radian/matrix_assembly.py:46-53) and rows past the read end
    are zeroed (the tail window's padding is trimmed first, reference
    basecall.py:96).  Returns ``(mats, t_reads)``.
    """
    out_len = mats.shape[1]
    t = jnp.arange(out_len, dtype=jnp.int32)[None, :]
    nw = n_wins[:, None]
    t_reads = (n_wins - 1) * step + window - pad_ends
    i0 = jnp.clip((t - window) // step + 1, 0, nw - 1)
    i_hi = jnp.minimum(t // step, nw - 1)
    count = i_hi - i0 + 1
    ssum = mats.sum(-1, keepdims=True)
    mats = jnp.where((count[..., None] > 1) & (ssum > 0), mats / ssum, mats)
    mats = jnp.where((t < t_reads[:, None])[..., None], mats, 0.0)
    return mats, t_reads


def _prep_model_assemble_fullread(
    params, signals, lengths, *, model: SigToSeq, opts: BasecallOptions,
):
    """[N, L] padded signals → "first"-assembled matrices [N, L, 5].

    The fastest global-mode forward: ONE causal TCN pass over the whole
    normalised read.  Valid by the same receptive-field argument as the
    strip path (ops/preprocess.py: strip_signal): every row the "first"
    assembly keeps is the model's causal output at absolute position t
    with >= rf-1 samples of in-window history (or window 0's zero
    history, which coincides with the read's own start), so window
    boundaries never influence a kept row — the full-read conv computes
    exactly the same values with no redundancy (T conv sample-steps
    instead of ~3T strips / 8T windows).
    """
    o = opts
    window, step = o.chunk_len, o.step_size

    def one(sig, n):
        return mad_normalise(sig, n, outlier_clip=o.outlier_clip)

    norm, mads = jax.vmap(one)(signals, lengths)
    probs = model.apply({"params": params}, norm[..., None], probs=True)
    # reference window accounting (preprocess.py:4-22) for trim/renorm
    n_full = jnp.maximum((lengths - window) // step + 1, 0)
    n_wins = n_full + 1
    pad_ends = window - (lengths - n_full * step)
    mats, t_reads = _first_renorm_trim(
        probs, n_wins, pad_ends, window=window, step=step
    )
    return mats, t_reads, mads


def _prep_model_assemble_strips(
    params, signals, lengths, *, model: SigToSeq, opts: BasecallOptions,
    ctx: int, n_strips: int,
):
    """[N, L] padded signals → "first"-assembled matrices [N, L, 5].

    The fast global-mode forward: the model runs on uniform
    ``[ctx+step]``-sample strips and only each strip's last ``step``
    outputs are kept — exactly the rows "first" assembly would select
    from full overlapped windows (see ops/preprocess.py: strip_signal),
    at ~window/(ctx+step) of the conv FLOPs.
    """
    o = opts
    window, step = o.chunk_len, o.step_size

    def one(sig, n):
        return preprocess_read_strips(
            sig, n, window, step, ctx, n_strips, o.outlier_clip
        )

    strips, n_wins, pad_ends, mads = jax.vmap(one)(signals, lengths)
    n, s, l = strips.shape
    probs = model.apply(
        {"params": params}, strips.reshape(n * s, l, 1), probs=True
    )[:, ctx:, :]
    c = probs.shape[-1]
    mats = probs.reshape(n, s * step, c)
    mats, t_reads = _first_renorm_trim(
        mats, n_wins, pad_ends, window=window, step=step
    )
    return mats, t_reads, mads


def _lm_kwargs(lm_t1, lm_t2, lm_packed: bool) -> dict:
    """Route the two replicated LM arrays to the right decoder kwargs:
    (probs, entropy) dense tables, or (l1, vals) packed sparse tables
    (``KmerLM.compressed()``, bit-identical values, ~20x smaller
    random-access span)."""
    if lm_packed:
        return {"lm_l1": lm_t1, "lm_vals": lm_t2}
    return {"lm_probs": lm_t1, "lm_ent": lm_t2}


def _compact_pack2(rev: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Sort-compact scattered emissions to the front, then 2-bit pack.

    One ``lax.sort`` with the label embedded in the key's low bits
    (t·8+label keeps emission order; sentinel 2^30 for copy steps);
    ``cap`` bounds the kept emissions (callers must verify ``n_lab <=
    cap`` on the host — the pipeline raises on overflow).  Emission
    ORDER is preserved, so rendering the compacted row gives the same
    string as the scattered one.  Cuts the device→host label fetch 4×
    vs nibble-packing the full row (T/8 vs T/2 bytes at cap=T/2).
    """
    t_io = jnp.arange(rev.shape[1], dtype=jnp.int32)[None, :]
    key = jnp.where(rev >= 0, t_io * 8 + rev, jnp.int32(2 ** 30))
    skey = jax.lax.sort(key, dimension=1)[:, :cap]
    comp = jnp.where(skey < 2 ** 30, skey % 8, -1)
    return pack_labels2(comp)


def _decode_assembled(
    mats, t_reads, lm_t1, lm_t2,
    *, opts: BasecallOptions, lm_enabled: bool, lm_packed: bool = False,
    use_pallas: bool = False,
):
    if use_pallas and not lm_enabled:
        from radian_tpu.ops.beam_pallas import beam_search_pallas

        rev, n_lab, _ = beam_search_pallas(
            mats, t_reads, beam_width=opts.beam_width
        )
    else:
        rev, n_lab, _ = beam_search_batch(
            mats,
            t_reads,
            beam_width=opts.beam_width,
            s_threshold=opts.sig_threshold,
            r_threshold=opts.rna_threshold,
            ctx_len=opts.context_len,
            lm_enabled=lm_enabled,
            **_lm_kwargs(lm_t1, lm_t2, lm_packed),
        )
    # nibble-pack the full row: a T-wide lax.sort compaction costs more
    # than the fetch it saves at global T (measured: 955 → 593 reads/s)
    return pack_labels(rev), n_lab


def _assemble_and_decode(
    probs, n_wins, pad_ends, lm_t1, lm_t2,
    *, opts: BasecallOptions, out_len: int, lm_enabled: bool,
    lm_packed: bool = False, use_pallas: bool = False,
):
    def one(p, nw, pe):
        return assemble_matrices(
            p, nw, pe, step=opts.step_size, window=opts.chunk_len,
            out_len=out_len, mode=opts.assembly_mode,
        )

    mats, t_reads = jax.vmap(one)(probs, n_wins, pad_ends)
    if use_pallas and not lm_enabled:
        from radian_tpu.ops.beam_pallas import beam_search_pallas

        rev, n_lab, _ = beam_search_pallas(
            mats, t_reads, beam_width=opts.beam_width
        )
    else:
        rev, n_lab, _ = beam_search_batch(
            mats,
            t_reads,
            beam_width=opts.beam_width,
            s_threshold=opts.sig_threshold,
            r_threshold=opts.rna_threshold,
            ctx_len=opts.context_len,
            lm_enabled=lm_enabled,
            **_lm_kwargs(lm_t1, lm_t2, lm_packed),
        )
    return pack_labels(rev), n_lab, t_reads


def _chunk_fused(params, signals, lengths, lm_t1, lm_t2, *,
                 model: SigToSeq, opts: BasecallOptions, max_windows: int,
                 head: int, slab: int, max_lab: int, use_pallas: bool,
                 crop_off: int = 0, crop_stride: int = 1,
                 lm_enabled: bool = False, lm_packed: bool = False):
    """Fused streaming chunk-mode program (reference basecall.py:111-123
    semantics, TPU-first execution).

    Round-3 chunk mode materialised the full ``[N, W, T, 5]`` per-window
    probs tensor (150 MB at N=64), capping ``read_batch`` at 64 and
    paying the 8× windowed-forward redundancy (stride 128 puts every
    sample in 8 windows).  This program instead:

    1. runs ONE causal full-read forward over the normalised signal
       (zero-extended by ``chunk_len`` so tail-window padding exists in
       the full-read view too), and
    2. streams window slabs through a cheap ``head``-sample zero-history
       fix-up forward + per-window decode + on-device label compaction
       via ``lax.scan``, so only ``[N, W, max_lab/2]`` packed labels
       persist.

    Causality argument: the TCN is causal with receptive field RF, so a
    window's output at in-window position p >= RF-1 is the full-read
    output at absolute position start+p — identical input history
    (same equivalence the global 'fullread' path rests on, NOTES round
    2).  Only positions p < head (RF-1 rounded up to the 128 tile) need
    the per-window forward: window FLOPs drop from 8× to ~1x + W·head/L
    ≈ 3× the read's samples.

    Per-window label counts must fit ``max_lab`` (the compaction keeps
    the first ``max_lab`` emissions); the caller checks ``n_lab`` and
    fails loudly on overflow (measured max on the random-weights bench
    workload: 285 labels per 1024-sample window).
    """
    o = opts
    window, step = o.chunk_len, o.step_size
    n, sig_len = signals.shape
    # a window cannot emit more than its timestep count; clamp the
    # compaction width (multiple of 4 for the 2-bit packing)
    max_lab = min(max_lab - max_lab % 4, window - window % 4)
    # 'fullprobs' (head == 0): corrected mode — windows take their probs
    # straight from the full-read pass (true left context, no
    # zero-history fix-up forward)
    full_ctx = head == 0

    def norm_one(sig, ln):
        return mad_normalise(sig, ln, outlier_clip=o.outlier_clip)

    norm, mads = jax.vmap(norm_one)(signals, lengths)  # [N, L]
    n_full = jnp.maximum((lengths - window) // step + 1, 0)
    n_wins = (n_full + 1).astype(jnp.int32)
    tail_start = (n_full * step).astype(jnp.int32)
    pad_ends = (window - (lengths - tail_start)).astype(jnp.int32)

    ext = jnp.pad(norm, ((0, 0), (0, window)))
    probs_full = model.apply(
        {"params": params}, ext[..., None], probs=True
    )  # [N, L+window, 5]
    if model.compute_dtype == jnp.bfloat16:
        # the tail gather re-reads this array ~6x (once per covering
        # window); bf16 storage halves that HBM traffic (−1.3 ms/read
        # measured at the worst bucket).  Only when the forward already
        # ran in bf16 — f32 compute keeps f32 probs (exact parity mode).
        probs_full = probs_full.astype(jnp.bfloat16)

    # strided tiled decoding (crop mode): decode only every
    # ``crop_stride``-th window plus the tail window — each decoded
    # window keeps a ``stride*step``-wide center span, so the kept
    # spans still partition the read while the beam-search work drops
    # ``stride``x.  stride == 1 (all parity modes) reproduces the
    # original every-window geometry exactly.
    stride = crop_stride if crop_off > 0 else 1
    n_dec = ((n_full + stride - 1) // stride + 1).astype(jnp.int32)
    max_dec = -((max_windows - 1) // -stride) + 1
    n_slabs = -(-max_dec // slab)
    w_iota = jnp.arange(slab, dtype=jnp.int32)
    head_iota = jnp.arange(head, dtype=jnp.int32)
    tail_iota = jnp.arange(head, window, dtype=jnp.int32)

    def slab_step(_, s):
        w_idx = s * slab + w_iota  # [slab] decoded-window indices
        starts = jnp.minimum(
            w_idx[None, :] * (stride * step), tail_start[:, None]
        )  # [N, slab]
        # tails (or, in 'fullprobs' mode, whole windows) from the
        # full-read probs at absolute positions
        tidx = (starts[..., None] + tail_iota).reshape(n, -1)
        tail_probs = jnp.take_along_axis(
            probs_full, tidx[..., None], axis=1
        ).reshape(n, slab, window - head, -1)
        if full_ctx:
            probs = tail_probs.reshape(n * slab, window, -1)
            probs = probs.astype(jnp.float32)
        else:
            # zero-history heads: window content [0, head) (norm is
            # already zero past `length`, and starts+head-1 < L always)
            hidx = starts[..., None] + head_iota  # [N, slab, head]
            strips = jnp.take_along_axis(
                norm, jnp.minimum(hidx, sig_len - 1).reshape(n, -1),
                axis=1,
            ).reshape(n, slab, head)
            head_probs = model.apply(
                {"params": params}, strips.reshape(n * slab, head, 1),
                probs=True,
            ).reshape(n, slab, head, -1)
            probs = jnp.concatenate(
                [head_probs.astype(tail_probs.dtype), tail_probs], axis=2
            ).reshape(n * slab, window, -1).astype(jnp.float32)
        lens = jnp.where(
            w_idx[None, :] == n_dec[:, None] - 1,
            window - pad_ends[:, None], window,
        )
        lens = jnp.where(w_idx[None, :] < n_dec[:, None], lens, 0)
        if use_pallas:
            from radian_tpu.ops.beam_pallas import beam_search_pallas

            rev, n_lab, _ = beam_search_pallas(
                probs, lens.reshape(-1), beam_width=o.beam_width
            )
        elif lm_enabled:
            # LM-fused tiled decode (chunk_lm): entropy-gated 12-mer
            # fusion inside each window's beam search — the kept center
            # spans have >= 640 samples (~16 bases > ctx_len 11) of
            # decode warm-up, so fusion contexts at kept positions are
            # the true read contexts.  Gather-heavy (W*N lanes/step):
            # intended for the low-latency serving path, not bulk
            # throughput.
            rev, n_lab, _ = beam_search_batch(
                probs, lens.reshape(-1), beam_width=o.beam_width,
                s_threshold=o.sig_threshold,
                r_threshold=o.rna_threshold,
                ctx_len=o.context_len, lm_enabled=True,
                **_lm_kwargs(lm_t1, lm_t2, lm_packed),
            )
        else:
            rev, n_lab, _ = beam_search_batch(
                probs, lens.reshape(-1), beam_width=o.beam_width,
                lm_enabled=False,
            )
        if crop_off > 0:
            # center-cropped TILED decoding (corrected 'fullprobs' mode
            # only): decoded window d keeps emissions in its center
            # span [off, off + stride*step) — in absolute coordinates
            # consecutive spans are contiguous, so the kept spans
            # PARTITION the read and the host stitch is plain
            # concatenation (no consensus-displacement ambiguity).
            # Every kept emission has >= off (>= RF-1) decode warm-up
            # on its left and >= step margin to the right truncation
            # edge; in fullprobs mode all windows decode the SAME
            # full-read probs, so decodes agree wherever both are warm.
            # First window keeps its left edge, last (tail) its right
            # edge — those are the read's edges; the window BEFORE the
            # tail clips its span at the tail span's absolute start
            # (tail_start + off) so the partition stays exact.  rev
            # index k is the REVERSE scan step, so its timestep is
            # window-1-k.
            t_true = (window - 1
                      - jnp.arange(window, dtype=jnp.int32))[None, :]
            is_first = (w_idx == 0)[None, :]  # [1, slab]
            is_last = w_idx[None, :] == n_dec[:, None] - 1  # [N, slab]
            lo = jnp.where(is_first, 0, crop_off)  # [1|N, slab]
            hi = jnp.where(
                is_last, lens,
                jnp.minimum(crop_off + stride * step,
                            tail_start[:, None] + crop_off - starts),
            )  # [N, slab]
            lo = jnp.broadcast_to(lo, (n, slab)).reshape(-1, 1)
            hi = hi.reshape(-1, 1)
            keep = (t_true >= lo) & (t_true < hi)
            rev = jnp.where(keep, rev, -1)
            n_lab = (rev >= 0).sum(axis=1)
        return None, (
            _compact_pack2(rev, max_lab).reshape(n, slab, max_lab // 4),
            n_lab.reshape(n, slab).astype(jnp.int32),
        )

    _, (packed, n_lab) = jax.lax.scan(
        slab_step, None, jnp.arange(n_slabs, dtype=jnp.int32)
    )
    packed = jnp.moveaxis(packed, 0, 1).reshape(n, n_slabs * slab, -1)
    n_lab = jnp.moveaxis(n_lab, 0, 1).reshape(n, n_slabs * slab)
    # n_dec == n_wins when stride == 1 (every parity mode); the host
    # stitch consumes however many windows were actually decoded
    return packed, n_lab, n_dec, mads


def _decode_windows(probs, n_wins, pad_ends, *, opts: BasecallOptions,
                    use_pallas: bool = False):
    """Chunk mode: per-window beam search, no LM (reference
    basecall.py:111-121); the tail window's padding is trimmed first
    (basecall.py:96)."""
    n, w, t, c = probs.shape
    win_idx = jnp.arange(w)[None, :]
    lens = jnp.where(
        win_idx == n_wins[:, None] - 1,
        opts.chunk_len - pad_ends[:, None],
        opts.chunk_len,
    )
    lens = jnp.where(win_idx < n_wins[:, None], lens, 0)
    if use_pallas:
        from radian_tpu.ops.beam_pallas import beam_search_pallas

        rev, n_lab, _ = beam_search_pallas(
            probs.reshape(n * w, t, c), lens.reshape(-1),
            beam_width=opts.beam_width,
        )
    else:
        rev, n_lab, _ = beam_search_batch(
            probs.reshape(n * w, t, c),
            lens.reshape(-1),
            beam_width=opts.beam_width,
            lm_enabled=False,
        )
    return pack_labels(rev).reshape(n, w, t // 2), n_lab.reshape(n, w)


class Basecaller:
    """Bucketed, batched TPU basecaller.

    Pass ``mesh`` (a ``jax.sharding.Mesh`` with a ``data`` axis, e.g.
    from ``radian_tpu.parallel.make_mesh``) to shard each read batch over
    multiple chips in ONE process: every device program is wrapped in
    ``jax.shard_map`` over the ``data`` axis with parameters and LM
    tables replicated — reads are independent, so the decode requires no
    cross-chip collectives and scales linearly over ICI-connected chips.
    ``read_batch`` must be divisible by the mesh's ``data`` size.
    (Multi-HOST scale-out — separate processes with per-host fasta
    shards — lives in ``radian_tpu.parallel.distributed``.)
    """

    def __init__(
        self,
        params,
        config: DotDict | None = None,
        lm: KmerLM | None = None,
        options: BasecallOptions | None = None,
        compute_dtype=jnp.float32,
        mesh=None,
    ):
        self.config = config if config is not None else default_config()
        self.options = options or BasecallOptions()
        self.model = build_model(self.config, compute_dtype=compute_dtype)
        self.params = params
        self.lm = lm
        o = self.options
        self.mesh = mesh
        if mesh is not None:
            if "data" not in mesh.axis_names:
                raise ValueError("inference mesh needs a 'data' axis")
            if o.read_batch % mesh.shape["data"] != 0:
                raise ValueError(
                    f"read_batch {o.read_batch} must be divisible by the "
                    f"mesh data axis ({mesh.shape['data']})"
                )
        if lm is not None and lm.context_len != o.context_len:
            raise ValueError(
                f"LM context_len {lm.context_len} != options.context_len "
                f"{o.context_len}"
            )
        # Prefer the packed sparse representation only when the packed
        # working set is small enough to win: the decoder's dense-table
        # gather is span-latency-bound (scripts/exp_lm_tablesize: 67 MB
        # ~ +14 us/step, tiny ~ +4 at N=256), but the packed path pays
        # TWO chained gathers' fixed mechanics (~3.5 us each).  Measured
        # step times vs the 24.6 us dense floor: 1.4 MB packed 13.4,
        # 2.0 MB 16.1, 5.0 MB 29.9 — crossover ~ 4 MB; PACKED_LM_MAX_BYTES
        # picks packed under that with margin (~110k real contexts).
        self._lm_packed = False
        packed_cut = (o.packed_lm_max_bytes if o.packed_lm_max_bytes
                      is not None else PACKED_LM_MAX_BYTES)
        if o.lm_table_dtype == "auto":
            table_dtype = (jnp.bfloat16
                           if compute_dtype == jnp.bfloat16
                           else jnp.float32)
        else:
            table_dtype = jnp.dtype(o.lm_table_dtype)
        if lm is not None and _packed_lm_bound_bytes(lm) < packed_cut:
            l1, vals = lm.compressed()
            if l1.nbytes + vals.nbytes < packed_cut:
                self._lm_packed = True
                self._lm_t1 = jnp.asarray(l1)  # int32 bitmap+rank
                self._lm_t2 = jnp.asarray(vals).astype(table_dtype)
        if not self._lm_packed:
            if lm is not None:
                self._lm_t1 = jnp.asarray(lm.probs).astype(table_dtype)
                self._lm_t2 = jnp.asarray(lm.entropy).astype(table_dtype)
            else:
                self._lm_t1 = jnp.ones((1, 4), jnp.float32)
                self._lm_t2 = jnp.zeros((1,), jnp.float32)
        if o.decode_backend == "pallas":
            use_pallas = True
        elif o.decode_backend == "xla":
            use_pallas = False
        else:
            # auto: kernel path needs a real TPU backend AND a beam that
            # fits the kernel's sublane tile (WSUB=8); wider beams fall
            # back to the XLA scan, which handles any width
            use_pallas = (jax.default_backend() == "tpu"
                          and o.beam_width <= PALLAS_MAX_BEAM)
        self.use_pallas = use_pallas
        self._prep = self._device_fn(
            functools.partial(_prep_and_model, model=self.model, opts=o),
            in_specs=(P(), P("data"), P("data")),
            static_argnames=("max_windows",),
        )
        # Fast global-mode forwards ('fullread' preferred, then 'strips'):
        # valid whenever windows tile on the step grid and a window holds
        # a full receptive field of history before its kept slab
        # (defaults: 1024-128 >= 253-1).
        m = self.model
        rf = 1 + 2 * (m.kernel_size - 1) * m.nb_stacks * sum(m.dilations)
        strip_len = -(-(rf - 1 + o.step_size) // 128) * 128
        self._strip_ctx = strip_len - o.step_size
        fast_ok = (
            o.decode_type == "global"
            and o.assembly_mode == "first"
            and o.chunk_len % o.step_size == 0
            and o.chunk_len - o.step_size >= self._strip_ctx
        )
        self.use_fullread = o.prep_mode in ("auto", "fullread") and fast_ok
        self.use_strips = o.prep_mode == "strips" and fast_ok
        if o.prep_mode in ("strips", "fullread") and not fast_ok:
            raise ValueError(
                f"prep_mode={o.prep_mode!r} requires global decode, "
                "'first' assembly, step | window, and window-step >= ctx "
                f"({self._strip_ctx})"
            )
        self._prep_strips = self._device_fn(
            functools.partial(
                _prep_model_assemble_strips, model=self.model, opts=o,
                ctx=self._strip_ctx,
            ),
            in_specs=(P(), P("data"), P("data")),
            static_argnames=("n_strips",),
        )
        self._prep_fullread = self._device_fn(
            functools.partial(
                _prep_model_assemble_fullread, model=self.model, opts=o,
            ),
            in_specs=(P(), P("data"), P("data")),
        )
        self._decode_assembled = self._device_fn(
            functools.partial(
                _decode_assembled, opts=o, lm_enabled=lm is not None,
                lm_packed=self._lm_packed, use_pallas=use_pallas,
            ),
            in_specs=(P("data"), P("data"), P(), P()),
        )
        self._global_decode = self._device_fn(
            functools.partial(
                _assemble_and_decode, opts=o, lm_enabled=lm is not None,
                lm_packed=self._lm_packed, use_pallas=use_pallas,
            ),
            in_specs=(P("data"), P("data"), P("data"), P(), P()),
            static_argnames=("out_len",),
        )
        self._chunk_decode = self._device_fn(
            functools.partial(_decode_windows, opts=o,
                              use_pallas=use_pallas),
            in_specs=(P("data"), P("data"), P("data")),
        )
        # fused chunk path: head = zero-history fix-up length (>= RF-1,
        # rounded up to the 128 lane tile); requires it to fit the window
        chunk_head = (0 if o.chunk_prep == "fullprobs"
                      else -(-(rf - 1) // 128) * 128)
        self.use_chunk_fused = (
            o.decode_type == "chunk"
            and o.chunk_prep in ("auto", "fused", "fullprobs")
            and chunk_head < o.chunk_len
            and o.chunk_max_lab % 2 == 0
        )
        if o.chunk_prep in ("fused", "fullprobs") and \
                not self.use_chunk_fused:
            raise ValueError(
                f"chunk_prep={o.chunk_prep!r} needs head {chunk_head} < "
                f"chunk_len {o.chunk_len} and an even chunk_max_lab"
            )
        # tiled center-crop geometry for the corrected 'fullprobs' mode:
        # pick the largest feasible decode stride <= chunk_crop_stride —
        # each decoded window keeps a stride*step center span, needing
        # >= RF-1 warm-up on the left and >= step truncation margin on
        # the right, all inside the window
        crop_off = crop_stride = None
        if o.chunk_prep == "fullprobs" and o.chunk_crop:
            for k in range(o.chunk_crop_stride, 0, -1):
                # maximise decode warm-up: keep exactly one step of
                # right truncation margin (a mistimed edge emission
                # moves ~one dwell, far less than a step)
                off_k = o.chunk_len - (k + 1) * o.step_size
                if off_k >= rf - 1:
                    crop_off, crop_stride = off_k, k
                    break
        self.chunk_tiled = crop_off is not None
        self.chunk_lm = bool(o.chunk_lm)
        if self.chunk_lm and not (self.chunk_tiled and lm is not None):
            raise ValueError(
                "chunk_lm needs lm= and the tiled crop "
                "(chunk_prep='fullprobs', chunk_crop=True)"
            )
        self._chunk_fused_prog = self._device_fn(
            functools.partial(
                _chunk_fused, model=self.model, opts=o, head=chunk_head,
                slab=o.chunk_slab, max_lab=o.chunk_max_lab,
                # the Pallas kernel is no-LM; LM-fused tiled decode uses
                # the XLA scan
                use_pallas=use_pallas and not self.chunk_lm,
                crop_off=crop_off if self.chunk_tiled else 0,
                crop_stride=crop_stride if self.chunk_tiled else 1,
                lm_enabled=self.chunk_lm, lm_packed=self._lm_packed,
            ),
            in_specs=(P(), P("data"), P("data"), P(), P()),
            static_argnames=("max_windows",),
        )

    def _device_fn(self, fn, *, in_specs, static_argnames=()):
        """Wrap a device program: plain jit, or jit(shard_map) on a mesh.

        Reads are independent, so every program shards its batch inputs
        over the ``data`` axis with no collectives (``out_specs`` is
        uniformly ``P('data')`` — all outputs are batch-leading).
        ``shard_map`` has no static-argument support, so static kwargs
        are bound per distinct value (cached) before mapping.
        """
        if self.mesh is None:
            return jax.jit(fn, static_argnames=static_argnames)
        mesh = self.mesh
        cache: dict = {}

        def call(*args, **statics):
            key = tuple(sorted(statics.items()))
            if key not in cache:
                bound = functools.partial(fn, **statics) if statics else fn
                # check_vma off: scan carries are initialised from
                # constants (unvarying) and become data-varying after one
                # step, which the strict VMA check rejects
                cache[key] = jax.jit(jax.shard_map(
                    bound, mesh=mesh, in_specs=in_specs,
                    out_specs=P("data"), check_vma=False,
                ))
            return cache[key](*args)

        return call

    # -- host orchestration ----------------------------------------------

    def _bucket(self, length: int) -> int:
        """Bucket for a read length: smallest ladder entry ≥ length when a
        ladder is configured (quantum rounding for overflow), else plain
        quantum rounding."""
        o = self.options
        if o.bucket_lengths:
            for b in sorted(o.bucket_lengths):
                if length <= b:
                    return b
        return bucket_length(length, o.bucket_quantum)

    def warmup(self, lengths: Sequence[int] | None = None) -> float:
        """Pre-compile the bucket programs; returns elapsed seconds.

        ``lengths`` defaults to the configured ``bucket_lengths`` ladder.
        Each distinct bucket gets one synthetic single-read batch run
        (same static shapes as production batches), so with
        ``JAX_COMPILATION_CACHE_DIR`` set the compiled executables land
        in the persistent cache and later processes start instantly
        (see scripts/prewarm.py).
        """
        if lengths is None:
            if not self.options.bucket_lengths:
                raise ValueError(
                    "warmup() needs `lengths` or options.bucket_lengths"
                )
            lengths = self.options.bucket_lengths
        t0 = time.perf_counter()
        for b in sorted({self._bucket(n) for n in lengths}):
            sig = np.zeros(b, np.int16)
            sig[::2] = 100  # non-zero MAD so the read isn't skipped
            self.basecall_signals([sig])
        return time.perf_counter() - t0

    def basecall_signals(
        self, signals: Sequence[np.ndarray]
    ) -> list[str | None]:
        """Basecall raw int16 signals → 5'→3' sequences (None = skipped)."""
        o = self.options
        results: list[str | None] = [None] * len(signals)
        order = sorted(range(len(signals)), key=lambda i: len(signals[i]))
        batches: list[tuple[list[int], int]] = []
        batch: list[int] = []
        cur_bucket = None
        for i in order:
            b = self._bucket(len(signals[i]))
            if batch and (b != cur_bucket or len(batch) == o.read_batch):
                batches.append((batch, cur_bucket))
                batch = []
            cur_bucket = b
            batch.append(i)
        if batch:
            batches.append((batch, cur_bucket))
        # two-deep dispatch pipeline: batch k+1's upload + device programs
        # are enqueued (JAX dispatch is async) before batch k's outputs are
        # fetched, so host<->device transfers overlap device compute
        inflight: list = []
        for idxs, b in batches:
            inflight.append(self._dispatch_batch(idxs, b, signals))
            if len(inflight) >= 2:
                self._collect_batch(inflight.pop(0), results)
        for pend in inflight:
            self._collect_batch(pend, results)
        return results

    def _run_batch(self, idxs, bucket, signals, results):
        self._collect_batch(
            self._dispatch_batch(idxs, bucket, signals), results
        )

    def _dispatch_batch(self, idxs, bucket, signals):
        """Upload one padded batch and enqueue its device programs.

        Returns a pending record; fetch host results with
        ``_collect_batch``.  Raw int16 signals are shipped as int16 (the
        device casts) — half the f32 bytes over the host link.
        """
        o = self.options
        # pad the batch to a fixed size so each bucket compiles exactly one
        # program; filler rows replicate the first read and are discarded
        n = o.read_batch
        real = len(idxs)
        dtypes = {np.asarray(signals[i]).dtype for i in idxs}
        host_dtype = np.int16 if dtypes == {np.dtype(np.int16)} else \
            np.float32
        padded = np.zeros((n, bucket), host_dtype)
        lengths = np.zeros(n, np.int32)
        for j in range(n):
            sig = signals[idxs[j]] if j < real else signals[idxs[0]]
            padded[j, : len(sig)] = sig
            lengths[j] = len(sig)
        if (self.use_fullread or self.use_strips) and \
                o.decode_type == "global":
            if self.use_fullread:
                mats, t_reads, mads = self._prep_fullread(
                    self.params, jnp.asarray(padded), jnp.asarray(lengths)
                )
            else:
                mats, t_reads, mads = self._prep_strips(
                    self.params, jnp.asarray(padded), jnp.asarray(lengths),
                    n_strips=bucket // o.step_size,
                )
            rev, n_lab = self._decode_assembled(
                mats, t_reads, self._lm_t1, self._lm_t2
            )
            return self._start_host_copies(
                ("global", idxs, real, mads, rev, None, n_lab))

        max_w = max_windows_for(bucket, o.chunk_len, o.step_size)
        if o.decode_type == "chunk" and self.use_chunk_fused:
            rev, n_lab, n_wins, mads = self._chunk_fused_prog(
                self.params, jnp.asarray(padded), jnp.asarray(lengths),
                self._lm_t1, self._lm_t2, max_windows=max_w,
            )
            return self._start_host_copies(
                ("chunk", idxs, real, mads, rev, n_wins, n_lab))
        probs, n_wins, pad_ends, mads = self._prep(
            self.params, jnp.asarray(padded), jnp.asarray(lengths),
            max_windows=max_w,
        )
        if o.decode_type == "global":
            rev, n_lab, t_reads = self._global_decode(
                probs, n_wins, pad_ends,
                self._lm_t1, self._lm_t2, out_len=bucket,
            )
            return self._start_host_copies(
                ("global", idxs, real, mads, rev, None, n_lab))
        rev, n_lab = self._chunk_decode(probs, n_wins, pad_ends)
        return self._start_host_copies(
            ("chunk", idxs, real, mads, rev, n_wins, None))

    @staticmethod
    def _start_host_copies(record):
        """Kick off async device→host copies for a dispatch record's
        outputs: the transfer streams while the NEXT batch computes, so
        ``_collect_batch``'s ``np.asarray`` finds the bytes already on
        the host (the label fetch is a visible slice of chunk-mode
        runtime over a remote-device link)."""
        for a in record:
            if hasattr(a, "copy_to_host_async"):
                try:
                    a.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass  # backend without async host copies
                # anything else (real transfer/runtime errors) propagates
                # here, at dispatch, with context — not at the later
                # np.asarray
        return record

    def _collect_batch(self, pending, results):
        o = self.options
        mode, idxs, real, mads, rev, n_wins, n_lab = pending
        mads = np.asarray(mads)
        bad = ~np.isfinite(mads) | (mads == 0)
        packed = np.asarray(rev)  # packed labels, uint8
        if mode == "global":
            rev = unpack_labels(packed)
            for j, i in enumerate(idxs[:real]):
                if not bad[j]:
                    results[i] = labels_to_seq(rev[j])  # already 5'→3'
            return
        n_wins = np.asarray(n_wins)
        if n_lab is not None:
            # fused path: labels were compacted on device to the
            # EFFECTIVE cap (chunk_max_lab and chunk_len each rounded
            # down to a multiple of 4 for the 2-bit packing — the same
            # clamp _chunk_fused applies) — an overflowing window would
            # have been truncated silently, so fail loudly instead
            eff_cap = min(o.chunk_max_lab - o.chunk_max_lab % 4,
                          o.chunk_len - o.chunk_len % 4)
            n_lab = np.asarray(n_lab)
            win_valid = np.arange(n_lab.shape[1])[None, :] < n_wins[:, None]
            row_ok = (np.arange(n_lab.shape[0]) < real) & ~bad
            over = (n_lab > eff_cap) & win_valid & row_ok[:, None]
            if over.any():
                raise RuntimeError(
                    f"chunk window emitted {int(n_lab[over].max())} labels "
                    f"> the effective compaction cap {eff_cap} "
                    f"(chunk_max_lab {o.chunk_max_lab} rounded to a "
                    "multiple of 4); raise BasecallOptions.chunk_max_lab"
                )
        def stitch_one(j):
            w = int(n_wins[j])
            if n_lab is None:
                # materialised 'windows' path: nibble-packed scattered
                # labels over the full window T
                frags = rows_to_seqs(unpack_labels(packed[j, :w]))
            else:
                if self.chunk_tiled:
                    # tiled center-crop: kept spans partition the read,
                    # so the stitch is plain concatenation (no
                    # consensus-displacement estimation)
                    frags = rows_to_seqs(
                        unpack_labels2(packed[j, :w], n_lab[j, :w])
                    )
                    return "".join(frags)[::-1]
                if o.consensus == "reference":
                    # fused path + native stitcher: fragments + consensus
                    # in one C++ call from the 2-bit-packed rows (GIL
                    # released during the call, so the thread pool below
                    # really parallelises)
                    from radian_tpu.ops.consensus import (
                        assemble_read_packed2,
                    )

                    seq = assemble_read_packed2(
                        packed[j, :w], n_lab[j, :w]
                    )
                    if seq is not None:
                        return seq[::-1]
                frags = rows_to_seqs(
                    unpack_labels2(packed[j, :w], n_lab[j, :w])
                )
            if o.consensus == "device":
                from radian_tpu.ops.consensus_device import (
                    assemble_fragments_device,
                )

                seq = assemble_fragments_device(frags)
            else:
                seq = assemble_fragments(frags)
            return seq[::-1]  # 5'→3' like the reference driver

        todo = [(j, i) for j, i in enumerate(idxs[:real]) if not bad[j]]
        if len(todo) > 3:
            for (j, i), seq in zip(
                todo, _stitch_pool().map(stitch_one, [j for j, _ in todo])
            ):
                results[i] = seq
        else:
            for j, i in todo:
                results[i] = stitch_one(j)

    def basecall_stream(
        self,
        reads: Iterable[Fast5Read],
        writer: FastaWriter,
        verbose: bool = True,
    ) -> tuple[int, int]:
        """Streaming basecall: bounded memory, fasta flushed in read order.

        Reads are consumed incrementally from ``reads`` (fast5 ingest
        overlaps device compute via the iterator), grouped into
        per-bucket batches, dispatched when full, and written out as the
        in-order prefix completes — the scalable replacement for the
        reference's read-at-a-time loop (reference basecall.py:70-131).
        """
        o = self.options
        pending: dict[int, list[tuple[int, np.ndarray]]] = {}
        results: dict[int, str | None] = {}
        ids: dict[int, str] = {}
        next_flush = 0
        n_written = 0
        n_total = 0

        inflight: list = []  # (pending_record, idx_list) dispatch pipeline

        def collect_one():
            nonlocal n_written, next_flush
            rec, idx_list = inflight.pop(0)
            out: dict[int, str | None] = {}
            self._collect_batch(rec, out)
            for i in idx_list:
                results[i] = out.get(i)
            while next_flush in results:
                seq = results.pop(next_flush)
                if seq is None:
                    if verbose:
                        print(f"{ids[next_flush]} signal issue, "
                              "skipping this read.")
                else:
                    writer.write(ids[next_flush], seq)
                    n_written += 1
                ids.pop(next_flush, None)
                next_flush += 1

        def run(bucket, items):
            idx_list = [i for i, _ in items]
            sigs = {i: s for i, s in items}
            inflight.append(
                (self._dispatch_batch(idx_list, bucket, sigs), idx_list)
            )
            if len(inflight) >= 2:
                collect_one()

        for idx, read in enumerate(reads):
            n_total += 1
            ids[idx] = read.read_id
            b = self._bucket(len(read.signal))
            pending.setdefault(b, []).append((idx, read.signal))
            if len(pending[b]) == o.read_batch:
                run(b, pending.pop(b))
        for b in sorted(pending):
            run(b, pending[b])
        while inflight:
            collect_one()
        return n_written, n_total

    def basecall_directory(
        self,
        fast5_dir: str | Path,
        fasta_dir: str | Path,
        verbose: bool = True,
        reads: Iterable[Fast5Read] | None = None,
        streaming: bool = False,
    ) -> int:
        """Basecall every read under ``fast5_dir`` into fasta shards."""
        o = self.options
        if reads is None:
            reads = iter_fast5_dir(fast5_dir)
        t0 = time.time()
        if streaming:
            with FastaWriter(fasta_dir, o.reads_per_fasta) as w:
                n_written, n_total = self.basecall_stream(reads, w, verbose)
        else:
            reads = list(reads)
            n_total = len(reads)
            seqs = self.basecall_signals([r.signal for r in reads])
            n_written = 0
            with FastaWriter(fasta_dir, o.reads_per_fasta) as w:
                for read, seq in zip(reads, seqs):
                    if seq is None:
                        if verbose:
                            print(f"{read.read_id} signal issue, "
                                  "skipping this read.")
                        continue
                    w.write(read.read_id, seq)
                    n_written += 1
        if verbose:
            dt = time.time() - t0
            print(
                f"Basecalled {n_written}/{n_total} reads in {dt:.2f}s "
                f"({n_written / dt:.2f} reads/s)"
            )
        return n_written


def load_basecaller(
    checkpoint: str | Path | None = None,
    config_path: str | Path | None = None,
    rna_model: str | Path | None = None,
    options: BasecallOptions | None = None,
    seed: int = 0,
    compute_dtype=jnp.float32,
    mesh=None,
) -> Basecaller:
    """Build a Basecaller from file paths (None checkpoint → seeded init)."""
    if config_path is None:
        config = default_config()
    else:
        from radian_tpu.config import get_config

        config = get_config(config_path)
    model = build_model(config, compute_dtype=compute_dtype)
    if checkpoint is None:
        params = init_params(model, jax.random.PRNGKey(seed))
    elif str(checkpoint).endswith(".h5"):
        from radian_tpu.models.keras_import import load_keras_h5

        params = load_keras_h5(checkpoint, config)
    else:
        params = load_params_npz(checkpoint)
    opts = options or BasecallOptions()
    lm = None
    if rna_model is not None and str(rna_model) != "None":
        lm = load_kmer_json(rna_model, opts.context_len)
    return Basecaller(params, config, lm, opts, compute_dtype, mesh=mesh)
