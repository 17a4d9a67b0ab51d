"""Pallas TPU kernel for CTC prefix beam search (no-LM path).

The XLA ``lax.scan`` decoder (radian_tpu/ops/beam_search.py) pays a fixed
per-timestep while-loop overhead regardless of batch size.  This kernel
runs the whole time loop *inside* one Pallas program: beam state lives in
loop carries (vector registers), the probability matrix streams through a
double-buffered HBM→VMEM pipeline with *static* buffer slots (the chunk
loop is unrolled in pairs), and the inner loop processes ``UNROLL``
timesteps per iteration with one block load of log-probs and one block
store of backpointers — so a step costs VPU cycles, not loop dispatches
or dynamically-indexed VMEM round-trips.

Layout: reads on the 128 lanes, beams on sublanes — every per-beam
quantity is an ``[8, 128]`` f32/int32 tile, so all cross-beam work
(merge detection, top-k pruning, parent gathers) becomes masked
sublane reductions.  Per grid program: one block of 128 reads.

Semantics are identical to ``beam_search_batch`` with ``lm_enabled=False``
(which itself is string-parity-tested against the reference decoder,
reference radian/decode.py): COPY/EXTEND candidates, logaddexp prefix
merges detected by dual 32-bit rolling hashes, insertion-order tie
breaking (candidate slot ``5·beam + {0 copy, 1+c extend}``; an extend
absorbs a merged copy iff its slot precedes it, i.e. iff ``b2 > b1``),
beam_width-wide pruning.  The kernel emits packed backpointers
``parent·8 + (append+1)`` per (t, beam, read); a small XLA reverse scan
recovers the 5'→3' label string exactly like the scan decoder.

The LM-fused path stays on the XLA decoder: the 12-mer table (67 MB)
lives in HBM and its per-beam gathers are XLA's gather, which cannot be
expressed efficiently as per-lane VMEM indexing in a kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radian_tpu.ops.beam_search import backtrace_batch

LANES = 128
WSUB = 8  # beam-state sublanes (beam_width <= 8)
CHUNK = 256  # timesteps per HBM->VMEM transfer
UNROLL = 2  # timesteps per inner-loop iteration (Mosaic
            # compile time grows superlinearly with body size)
# python scalars (weak-typed literals): jnp constants would be captured
# as pallas kernel inputs
NEG = -1e30
NEG_HALF = -1e29
# knockout value for already-selected candidate slots: must sit strictly
# below every junk score (junk ≈ NEG + log p < NEG, so NEG won't do)
KNOCKED = -3.0e38
_P1 = int(np.uint32(2654435761).view(np.int32))  # wraps to int32
_P2 = int(np.uint32(2246822519).view(np.int32))
_BIG_I = 2**30


def _row(x, r):
    """Static sublane row ``r`` of an [W, L] tile, kept 2D as [1, L]."""
    return x[r : r + 1, :]


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    return mx + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _beam_step(state, lp, active, w_iota, beam_width):
    """One decode timestep on carried state; returns (state', bp row)."""
    pr_b, pr_nb, pr_t, last, length, h1, h2 = state
    blank_lp = _row(lp, 4)
    valid = pr_t > NEG_HALF

    # COPY candidates
    sel = jnp.where(
        last == 0, _row(lp, 0),
        jnp.where(last == 1, _row(lp, 1),
                  jnp.where(last == 2, _row(lp, 2), _row(lp, 3))),
    )
    pr_nb_c = jnp.where(length > 0, pr_nb + sel, NEG)
    pr_b_c = pr_t + blank_lp
    pr_t_c = _logaddexp(pr_b_c, pr_nb_c)

    # EXTEND candidates + extension hashes, one set per base
    ext = []
    h1e = []
    h2e = []
    for cbase in range(4):
        base_lp = jnp.where(last == cbase, pr_b, pr_t)
        ext.append(base_lp + _row(lp, cbase))
        h1e.append(h1 * _P1 + jnp.int32(cbase + 1))
        h2e.append(h2 * _P2 + jnp.int32(cbase + 1))

    # merge detection EXTEND(b1, c) vs COPY(b2); extend absorbs
    # iff b2 > b1 (slot 5b1+1+c < 5b2)
    # killed-flags are int32 0/1: Mosaic can't select i1 vectors
    copy_extra = jnp.full((WSUB, LANES), NEG)
    copy_killed = jnp.zeros((WSUB, LANES), jnp.int32)
    ext_nb_in = [jnp.full((WSUB, LANES), NEG) for _ in range(4)]
    ext_pb_in = [jnp.full((WSUB, LANES), NEG) for _ in range(4)]
    ext_pt_in = [jnp.full((WSUB, LANES), NEG) for _ in range(4)]
    ext_killed = [jnp.zeros((WSUB, LANES), jnp.int32) for _ in range(4)]

    for b2 in range(beam_width):
        h1_b2 = _row(h1, b2)
        h2_b2 = _row(h2, b2)
        len_b2 = _row(length, b2)
        val_b2 = _row(valid, b2)
        nb_c_b2 = _row(pr_nb_c, b2)
        pb_c_b2 = _row(pr_b_c, b2)
        pt_c_b2 = _row(pr_t_c, b2)
        for cbase in range(4):
            m = (
                valid & val_b2
                & (len_b2 == length + 1)
                & (h1_b2 == h1e[cbase])
                & (h2_b2 == h2e[cbase])
            )  # [W, L] over b1
            ext_wins = w_iota < b2
            contrib = jnp.max(
                jnp.where(m & ~ext_wins, ext[cbase], NEG),
                axis=0, keepdims=True,
            )
            copy_extra = jnp.where(
                w_iota == b2, jnp.maximum(copy_extra, contrib), copy_extra
            )
            killed_b2 = jnp.max(
                jnp.where(m & ext_wins, 1, 0), axis=0, keepdims=True
            )
            copy_killed = jnp.where(
                w_iota == b2, jnp.maximum(copy_killed, killed_b2), copy_killed
            )
            absorb = m & ext_wins
            ext_nb_in[cbase] = jnp.where(absorb, nb_c_b2, ext_nb_in[cbase])
            ext_pb_in[cbase] = jnp.where(absorb, pb_c_b2, ext_pb_in[cbase])
            ext_pt_in[cbase] = jnp.where(absorb, pt_c_b2, ext_pt_in[cbase])
            ext_killed[cbase] = jnp.maximum(
                ext_killed[cbase], jnp.where(m & ~ext_wins, 1, 0)
            )

    # merged candidate columns: col 0 = copy, col 1+c = extend c
    cand_pb = [jnp.where(copy_killed > 0, NEG, pr_b_c)]
    cand_nb = [jnp.where(copy_killed > 0, NEG,
                         _logaddexp(pr_nb_c, copy_extra))]
    cand_pt = [jnp.where(copy_killed > 0, NEG,
                         _logaddexp(pr_t_c, copy_extra))]
    for cbase in range(4):
        cand_pb.append(ext_pb_in[cbase])
        cand_nb.append(
            jnp.where(ext_killed[cbase] > 0, NEG,
                      _logaddexp(ext[cbase], ext_nb_in[cbase]))
        )
        cand_pt.append(
            jnp.where(ext_killed[cbase] > 0, NEG,
                      _logaddexp(ext[cbase], ext_pt_in[cbase]))
        )
    # dead beam rows (w >= beam_width) must never be picked
    dead = w_iota >= beam_width
    scores = [jnp.where(dead, NEG, s) for s in cand_pt]

    # iterative top-(beam_width) selection; build the new state
    new_pr_b = jnp.full((WSUB, LANES), NEG)
    new_pr_nb = jnp.full((WSUB, LANES), NEG)
    new_pr_t = jnp.full((WSUB, LANES), NEG)
    new_last = jnp.full((WSUB, LANES), -1, jnp.int32)
    new_len = jnp.zeros((WSUB, LANES), jnp.int32)
    new_h1 = jnp.ones((WSUB, LANES), jnp.int32)
    new_h2 = jnp.ones((WSUB, LANES), jnp.int32)
    bp = w_iota * 8  # identity backpointers (parent=w, append=-1)

    for k in range(beam_width):
        col_best = [jnp.max(s, axis=0, keepdims=True) for s in scores]
        m_all = col_best[0]
        for cb in col_best[1:]:
            m_all = jnp.maximum(m_all, cb)
        # smallest slot 5w+col achieving the max
        s_star = jnp.full((1, LANES), _BIG_I)
        for col in range(5):
            cand_slot = jnp.min(
                jnp.where(scores[col] >= m_all, 5 * w_iota + col, _BIG_I),
                axis=0, keepdims=True,
            )
            s_star = jnp.minimum(s_star, cand_slot)
        parent = s_star // 5  # [1, L]
        col_star = s_star - parent * 5

        is_par = w_iota == parent  # [W, L]; exactly one row true

        def pick(cols):
            # exactly-one-hot extraction: sum over the masked rows
            v = jnp.zeros((1, LANES), jnp.float32)
            for col in range(5):
                vc = jnp.sum(
                    jnp.where(is_par, cols[col], 0.0), axis=0, keepdims=True
                )
                v = jnp.where(col_star == col, vc, v)
            return v

        v_pb = pick(cand_pb)
        v_nb = pick(cand_nb)
        v_pt = pick(cand_pt)

        def parent_row(x):
            zero = jnp.zeros((1, 1), x.dtype)
            return jnp.sum(jnp.where(is_par, x, zero), axis=0, keepdims=True)

        p_last = parent_row(last)
        p_len = parent_row(length)
        p_h1 = parent_row(h1)
        p_h2 = parent_row(h2)

        append = col_star - 1  # -1 = copy, else base index
        is_ext = append >= 0
        r_last = jnp.where(is_ext, append, p_last)
        r_len = p_len + jnp.where(is_ext, 1, 0)
        r_h1 = jnp.where(is_ext, p_h1 * _P1 + (append + 1), p_h1)
        r_h2 = jnp.where(is_ext, p_h2 * _P2 + (append + 1), p_h2)

        row_k = w_iota == k
        new_pr_b = jnp.where(row_k, v_pb, new_pr_b)
        new_pr_nb = jnp.where(row_k, v_nb, new_pr_nb)
        new_pr_t = jnp.where(row_k, v_pt, new_pr_t)
        new_last = jnp.where(row_k, r_last, new_last)
        new_len = jnp.where(row_k, r_len, new_len)
        new_h1 = jnp.where(row_k, r_h1, new_h1)
        new_h2 = jnp.where(row_k, r_h2, new_h2)
        bp = jnp.where(row_k, parent * 8 + (append + 1), bp)

        # knock the selected slot out of the candidate pool
        for col in range(5):
            scores[col] = jnp.where(
                is_par & (col_star == col), KNOCKED, scores[col]
            )

    # masked (padded) steps leave everything untouched
    new_state = (
        jnp.where(active, new_pr_b, pr_b),
        jnp.where(active, new_pr_nb, pr_nb),
        jnp.where(active, new_pr_t, pr_t),
        jnp.where(active, new_last, last),
        jnp.where(active, new_len, length),
        jnp.where(active, new_h1, h1),
        jnp.where(active, new_h2, h2),
    )
    return new_state, jnp.where(active, bp, w_iota * 8)


def _kernel(len_ref, logm_hbm, bp_hbm, score_ref, nlab_ref,
            inbuf, bpbuf, in_sems, out_sems, *, beam_width, n_chunks,
            unroll):
    i = pl.program_id(0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (WSUB, LANES), 0)
    read_len = len_ref[:]  # [1, LANES] int32

    zero_row = w_iota == 0
    state0 = (
        jnp.where(zero_row, 0.0, NEG),
        jnp.full((WSUB, LANES), NEG),
        jnp.where(zero_row, 0.0, NEG),
        jnp.full((WSUB, LANES), -1, jnp.int32),
        jnp.zeros((WSUB, LANES), jnp.int32),
        jnp.ones((WSUB, LANES), jnp.int32),
        jnp.ones((WSUB, LANES), jnp.int32),
    )

    def in_dma(slot, chunk):
        return pltpu.make_async_copy(
            logm_hbm.at[pl.ds(chunk * CHUNK, CHUNK), :,
                        pl.ds(i * LANES, LANES)],
            inbuf.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, chunk):
        return pltpu.make_async_copy(
            bpbuf.at[slot],
            bp_hbm.at[pl.ds(chunk * CHUNK, CHUNK), :,
                      pl.ds(i * LANES, LANES)],
            out_sems.at[slot],
        )

    in_dma(0, 0).start()

    def process_chunk(slot: int, c, state):
        """slot is a static python int: buffer indexing stays static."""
        in_dma(slot, c).wait()

        # the bp buffer slot is free once the flush from chunk c-2 landed
        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        def j_body(j, st):
            lp_blk = inbuf[slot, pl.ds(j * unroll, unroll)]  # [U, 8, L]
            bps = []
            for u in range(unroll):
                t_global = c * CHUNK + j * unroll + u
                active = t_global < read_len
                st, bp = _beam_step(st, lp_blk[u], active, w_iota, beam_width)
                bps.append(bp)
            bpbuf[slot, pl.ds(j * unroll, unroll)] = jnp.stack(bps)
            return st

        state = jax.lax.fori_loop(0, CHUNK // unroll, j_body, state)
        out_dma(slot, c).start()
        return state

    def pair_body(cp, state):
        c0 = cp * 2

        @pl.when(c0 + 1 < n_chunks)
        def _():
            in_dma(1, c0 + 1).start()

        state = process_chunk(0, c0, state)

        @pl.when(c0 + 2 < n_chunks)
        def _():
            in_dma(0, c0 + 2).start()

        state = process_chunk(1, c0 + 1, state)
        return state

    assert n_chunks % 2 == 0, "wrapper pads T to a 2*CHUNK multiple"
    state = jax.lax.fori_loop(0, n_chunks // 2, pair_body, state0)

    # drain the last two output flushes (n_chunks is static)
    if n_chunks >= 2:
        out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
    out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    score_ref[:] = state[2]
    nlab_ref[:] = state[4]


@functools.partial(
    jax.jit, static_argnames=("beam_width", "interpret", "unroll")
)
def beam_search_pallas(mats, lengths, *, beam_width: int = 6,
                       interpret: bool = False, unroll: int = UNROLL):
    """Pallas-kernel beam search over ``[N, T, 5]`` probability matrices.

    Returns ``(rev_labels [N, T], n_labels [N], best_logp [N])`` with the
    same semantics as ``beam_search_batch(..., lm_enabled=False)``.
    ``N`` is padded to a multiple of 128 internally, ``T`` to a multiple
    of 512 (two DMA chunks).
    """
    if beam_width > WSUB:
        raise ValueError(f"beam_width {beam_width} > {WSUB}")
    n, t, c5 = mats.shape
    n_pad = -n % LANES
    t_pad = -t % (2 * CHUNK)
    mats = jnp.pad(mats.astype(jnp.float32), ((0, n_pad), (0, t_pad), (0, 0)))
    lengths = jnp.pad(lengths.astype(jnp.int32), (0, n_pad))
    np_, tp = n + n_pad, t + t_pad
    n_chunks = tp // CHUNK

    logm = jnp.log(jnp.transpose(mats, (1, 2, 0)))  # [T, 5, N]
    # pad the class dim to the sublane tile (8) so HBM DMA slices align
    logm = jnp.pad(logm, ((0, 0), (0, 3), (0, 0)), constant_values=NEG)

    kernel = functools.partial(
        _kernel, beam_width=beam_width, n_chunks=n_chunks, unroll=unroll
    )
    bp, score, nlab = pl.pallas_call(
        kernel,
        grid=(np_ // LANES,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((WSUB, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WSUB, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, WSUB, np_), jnp.int32),
            jax.ShapeDtypeStruct((WSUB, np_), jnp.float32),
            jax.ShapeDtypeStruct((WSUB, np_), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, 8, LANES), jnp.float32),
            pltpu.VMEM((2, CHUNK, WSUB, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lengths[None, :], logm)

    # backtrace on the XLA side; the kernel's packed [T, W, N] emission is
    # exactly backtrace_batch's batch-minor input format
    rev = backtrace_batch(bp[:t])  # [t, N]
    return rev.T[:n], nlab[0, :n], score[0, :n]
