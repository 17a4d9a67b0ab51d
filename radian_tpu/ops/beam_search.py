"""CTC prefix beam search with 12-mer LM fusion, as a jitted lax.scan.

Re-derivation of the reference decoder's semantics (reference
radian/decode.py:100-211) in a fixed-shape, vectorised form that compiles
to a single XLA while-loop on TPU over a batch of reads/chunks:

Reference semantics preserved exactly:
- Per timestep, each surviving beam spawns one COPY candidate (labeling
  unchanged; blank path always from raw ``mat[t, blank]``, repeat path
  from the possibly-LM-fused base distribution using the *previous*
  context, i.e. ``labeling[-(ctx+1):-1]``, gated on ``len >= ctx+1``) and
  four EXTEND candidates (fused with the full last-``ctx`` context, gated
  on ``len >= ctx``; a repeated base may only extend blank-ending paths).
- LM fusion gate: fuse only if LM entropy < ``r_threshold`` AND
  normalised non-blank signal entropy > ``s_threshold``
  (reference decode.py:79-96); the fused base distribution is
  ``((lm + s4/Σs4)/2)·Σs4`` (reference decode.py:52-64).
- Candidates with equal labelings merge via logaddexp.  Because beams
  hold distinct labelings, the only possible merge is EXTEND(b1, c) with
  COPY(b2) where ``labeling_b2 == labeling_b1 + (c,)``; equality is
  detected by length + two independent 32-bit rolling hashes over the
  full prefix (collision odds ~2^-64 per pair; validated against the
  reference oracle in tests).
- Per-step pruning keeps the ``beam_width`` best candidates by total
  log-probability.  The reference instead carries all candidates and
  top-``W``-selects at the *next* step — equivalent, since only the top
  ``W`` of the candidate set are ever consulted again, and the final
  answer is the overall argmax.
- Tie order mirrors the reference's insertion-order-stable sort: the
  candidate array is laid out in reference insertion order
  (``copy(0), extend(0, A..T), copy(1), ...`` ⇒ slot ``5·beam + col``
  with the copy in column 0) and merged mass is carried by the earlier
  slot; selection picks the smallest slot among score ties.

Instead of materialising labelings in the scan state, the scan emits
per-step packed backpointers ``parent·8 + (append+1)`` and a second,
reversed scan walks the best beam back — emitting bases in reversed
order, which is exactly the 5'→3' orientation the fasta output wants
(reference basecall.py:129 reverses the decoded string).

TPU layout: everything is **batch-minor** — state arrays are ``[W, N]``
(or ``[5, W, N]``) with the read batch N on the minor axis, NOT a vmap
over a leading batch axis.  The VPU operates on (8 sublanes × 128 lanes)
tiles tiled over the two minor dims; a vmapped ``[N, W]`` state puts
W≈6 on the lane axis, wasting ~95% of every tile and inflating the HBM
bytes of every fusion boundary by the same factor.  With N minor, all
per-beam work (merge detection ``[4, W, W, N]``, candidate scoring
``[5, W, N]``, pruning) packs the lanes densely — the same layout the
Pallas kernel (ops/beam_pallas.py) uses, here expressed as plain XLA so
the dynamic LM table gather stays available.

Dead-slot bookkeeping uses a large *finite* sentinel ``NEG = -1e30``
rather than ``-inf`` so the iterative max-then-min-slot top-k (which
knocks selected slots down to ``KNOCKED < NEG + log p``) stays totally
ordered.  Live-path log-probs are bit-identical to the -inf formulation:
``logaddexp(x, NEG)`` rounds to ``x`` exactly in f32 for any reachable
``x`` (≫ -1e29), and junk values stay below ``NEG_HALF`` so ``valid``
never misfires — the same scheme the Pallas kernel uses, string-parity
validated against the pure-python reference oracle.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# measurement-only: see the gather site in _step (scripts/exp_gate_clamp).
# Changes decode RESULTS process-wide; never enable in production — the
# loud warning below makes an accidentally-inherited env var visible.
_GATE_CLAMP_PROBE = os.environ.get("RADIAN_GATE_CLAMP_PROBE") == "1"
if _GATE_CLAMP_PROBE:
    import warnings

    warnings.warn(
        "RADIAN_GATE_CLAMP_PROBE=1: beam-search LM gathers are clamped "
        "for traffic measurement — decode results are WRONG. Unset the "
        "env var for any real run.",
        RuntimeWarning,
        stacklevel=2,
    )

N_BASES = 4
BLANK = 4
NEG = -1.0e30  # finite "impossible" log-prob (see module docstring)
NEG_HALF = -1.0e29  # validity threshold: junk ≈ NEG + log p < this
SCORE_FLOOR = -1.0e38  # selection clamp: true -inf scores (log of an
# exact-zero probability) tie here, picked in slot order like top_k
KNOCKED = -3.0e38  # strictly below every floored score
_H1_MULT = np.uint32(2654435761)
_H2_MULT = np.uint32(2246822519)


class BeamState(NamedTuple):
    """Carried beam state; every array is batch-minor (``N`` last)."""

    pr_b: jnp.ndarray  # [W, N] log P(paths ending in blank)
    pr_nb: jnp.ndarray  # [W, N] log P(paths ending in non-blank)
    pr_t: jnp.ndarray  # [W, N] log P(total)
    last: jnp.ndarray  # [W, N] last emitted base, -1 if empty labeling
    length: jnp.ndarray  # [W, N] labeling length
    ctx_full: jnp.ndarray  # [W, N] last ctx_len labels, packed base-4
    ctx_prev: jnp.ndarray  # [W, N] last ctx_len labels of labeling[:-1]
    h1: jnp.ndarray  # [W, N] rolling hash 1 of full labeling
    h2: jnp.ndarray  # [W, N] rolling hash 2
    valid: jnp.ndarray  # [W, N] slot holds a live beam
    # cached LM table rows for ctx_full / ctx_prev ([5, W, N]: 4 next-base
    # probs + entropy): contexts only change on extension, so carrying the
    # rows means one HBM gather per step instead of 2·W·N rows' worth
    lm_full: jnp.ndarray
    lm_prev: jnp.ndarray


def _init_state(beam_width: int, n: int, lm_enabled: bool = True) -> BeamState:
    w = beam_width
    # without the LM the row caches are never consulted: carry 1-element
    # dummies so the scan state doesn't haul dead [5,4,W,N] buffers
    lw, ln = (w, n) if lm_enabled else (1, 1)
    slot0 = jnp.arange(w)[:, None] == 0  # [W, 1] broadcasts over N
    neg = jnp.full((w, n), NEG, jnp.float32)
    zero = jnp.zeros((w, n), jnp.int32)
    return BeamState(
        pr_b=jnp.where(slot0, 0.0, neg),
        pr_nb=neg,
        pr_t=jnp.where(slot0, 0.0, neg),
        last=jnp.full((w, n), -1, jnp.int32),
        length=zero,
        ctx_full=zero,
        ctx_prev=zero,
        h1=jnp.ones((w, n), jnp.uint32),
        h2=jnp.ones((w, n), jnp.uint32),
        valid=jnp.broadcast_to(slot0, (w, n)),
        lm_full=jnp.zeros((N_BASES + 1, lw, ln), jnp.float32),
        lm_prev=jnp.zeros((N_BASES + 1, lw, ln), jnp.float32),
    )


def signal_entropies(mat: jnp.ndarray) -> jnp.ndarray:
    """Entropy of the L1-normalised non-blank distribution per timestep.

    Matches reference decode.py:134-138 (``entropy(normalise(mat[t][:-1]))``
    with zero-sum rows left unnormalised, zero probs contributing nothing).
    """
    base = mat[..., :N_BASES]
    s = base.sum(-1, keepdims=True)
    p = jnp.where(s > 0, base / s, base)
    terms = jnp.where(p > 0, p * jnp.log(p), 0.0)
    return -terms.sum(-1)


def _entropies_tn(mats_tn: jnp.ndarray) -> jnp.ndarray:
    """``signal_entropies`` on the transposed ``[T, 5, N]`` layout."""
    base = mats_tn[:, :N_BASES, :]
    s = base.sum(1, keepdims=True)
    p = jnp.where(s > 0, base / s, base)
    terms = jnp.where(p > 0, p * jnp.log(p), 0.0)
    return -terms.sum(1, keepdims=True)  # [T, 1, N]


def _fused_dist(m4, s_base, s_sum, r_dist, r_ent, s_ent, len_ok, s_thr, r_thr):
    """LM fusion (reference decode.py:52-64,79-96): gated average of LM and
    renormalised signal base distribution, rescaled by non-blank mass.

    Shapes: m4/s_base [4, N], s_sum/s_ent [1, N], r_dist [4, W, N],
    r_ent/len_ok [W, N] → [4, W, N].
    """
    fused = (r_dist + s_base[:, None, :]) * 0.5 * s_sum[:, None, :]
    gate = len_ok & (r_ent < r_thr) & (s_ent > s_thr)
    return jnp.where(gate[None], fused, m4[:, None, :])


def _step(state: BeamState, xs, *, beam_width, lm_table, ctx_mod,
          s_thr, r_thr, ctx_len, lm_enabled):
    m5, s_ent, active = xs  # [5, N], [1, N], [1, N]
    w = beam_width
    m4 = m5[:N_BASES]  # [4, N]
    blank_lp = jnp.log(m5[BLANK : BLANK + 1])  # [1, N]
    cvec = jnp.arange(N_BASES, dtype=jnp.int32)[:, None, None]  # [4,1,1]
    w_col = jnp.arange(w, dtype=jnp.int32)[:, None]  # [W, 1]

    if lm_enabled:
        s_sum = m4.sum(0, keepdims=True)
        s_base = jnp.where(s_sum > 0, m4 / s_sum, 0.0)
        # cached rows: the LM table was last consulted when each beam's
        # context last changed (its latest extension)
        rows_c, rows_e = state.lm_prev, state.lm_full  # [5, W, N]
        dist_c = _fused_dist(
            m4, s_base, s_sum, rows_c[:N_BASES], rows_c[N_BASES],
            s_ent, state.length >= ctx_len + 1, s_thr, r_thr,
        )
        dist_e = _fused_dist(
            m4, s_base, s_sum, rows_e[:N_BASES], rows_e[N_BASES],
            s_ent, state.length >= ctx_len, s_thr, r_thr,
        )
        log_dist_c = jnp.log(dist_c)  # [4, W, N]
        log_dist_e = jnp.log(dist_e)
    else:
        log_dist_c = log_dist_e = jnp.log(m4)[:, None, :]  # [4, 1, N]

    # COPY candidates (one per beam).
    sel_last = jnp.sum(
        jnp.where(state.last[None] == cvec, log_dist_c, 0.0), axis=0
    )  # log_dist_c[last[w]]; rows with last == -1 are masked out below
    pr_nb_c = jnp.where(state.length > 0, state.pr_nb + sel_last, NEG)
    pr_b_c = state.pr_t + blank_lp
    pr_t_c = jnp.logaddexp(pr_b_c, pr_nb_c)  # [W, N]

    # EXTEND candidates (four per beam).
    repeat = state.last[None] == cvec  # [4, W, N]
    base_lp = jnp.where(repeat, state.pr_b[None], state.pr_t[None])
    pr_nb_e = base_lp + log_dist_e  # [4, W, N]

    # Merge detection: EXTEND(b1, c) vs COPY(b2), axes [c, b1, b2, N].
    cu = (cvec + 1).astype(jnp.uint32)
    h1_ext = state.h1[None] * _H1_MULT + cu  # [4, W, N]
    h2_ext = state.h2[None] * _H2_MULT + cu
    match = (
        state.valid[None, :, None, :]
        & state.valid[None, None, :, :]
        & (state.length[None, None] == state.length[None, :, None] + 1)
        & (state.h1[None, None] == h1_ext[:, :, None])
        & (state.h2[None, None] == h2_ext[:, :, None])
    )  # [4, W, W, N]
    ext_has_match = match.any(2)  # [4, W, N]

    # Insertion-order slot of each candidate (reference iterates
    # copy(b), extend(b, 0..3) per beam in rank order).  At most one b2
    # matches any (b1, c), so "the matched copy's slot is later" reduces
    # to an any() over the match mask.
    slot_ext = 5 * w_col[None] + 1 + cvec  # [4, W, 1]
    slot_copy_b2 = 5 * jnp.arange(w, dtype=jnp.int32)[None, None, :, None]
    ext_wins = (match & (slot_ext[:, :, None] < slot_copy_b2)).any(2)

    # Contribution of merged extends into each copy slot.
    contrib = jnp.where(
        match & ~ext_wins[:, :, None], pr_nb_e[:, :, None], NEG
    )
    copy_extra = contrib.max(axis=(0, 1))  # [W, N]; ≤1 contributor per copy
    copy_killed = (match & ext_wins[:, :, None]).any(axis=(0, 1))  # [W, N]

    m_pr_nb_c = jnp.where(
        copy_killed, NEG, jnp.logaddexp(pr_nb_c, copy_extra)
    )
    m_pr_b_c = jnp.where(copy_killed, NEG, pr_b_c)
    m_pr_t_c = jnp.where(
        copy_killed, NEG, jnp.logaddexp(pr_t_c, copy_extra)
    )

    ext_killed = ext_has_match & ~ext_wins
    # value of the (unique) matched copy candidate, as a masked max
    copy_nb_in = jnp.where(match, pr_nb_c[None, None], NEG).max(2)
    copy_b_in = jnp.where(match, pr_b_c[None, None], NEG).max(2)
    copy_t_in = jnp.where(match, pr_t_c[None, None], NEG).max(2)
    absorb = ext_has_match & ext_wins
    m_pr_nb_e = jnp.where(
        ext_killed,
        NEG,
        jnp.where(absorb, jnp.logaddexp(pr_nb_e, copy_nb_in), pr_nb_e),
    )
    m_pr_b_e = jnp.where(absorb, copy_b_in, NEG)
    m_pr_t_e = jnp.where(
        ext_killed,
        NEG,
        jnp.where(absorb, jnp.logaddexp(copy_t_in, pr_nb_e), pr_nb_e),
    )

    # Candidate arrays [5, W, N] in insertion order: column 0 = copy(b),
    # column 1+c = extend(b, c); slot id = 5·b + column.
    cand_pr_b = jnp.concatenate([m_pr_b_c[None], m_pr_b_e], axis=0)
    cand_pr_nb = jnp.concatenate([m_pr_nb_c[None], m_pr_nb_e], axis=0)
    cand_pr_t = jnp.concatenate([m_pr_t_c[None], m_pr_t_e], axis=0)

    col_iota = jnp.arange(5, dtype=jnp.int32)[:, None, None]  # [5,1,1]
    slot = 5 * w_col[None] + col_iota  # [5, W, 1]
    big = jnp.int32(2**30)

    # Iterative top-(beam_width) selection: max score, then smallest slot
    # achieving it (== lax.top_k's earliest-index tie rule on the
    # insertion-order layout), then knock the slot out.  All ops stay
    # batch-minor; no [N, 30]-layout sort.
    scores = jnp.maximum(cand_pr_t, SCORE_FLOOR)
    rows_pb, rows_pnb, rows_pt = [], [], []
    rows_last, rows_len = [], []
    rows_ctxf, rows_ctxp = [], []
    rows_h1, rows_h2 = [], []
    rows_lmf, rows_lmp = [], []
    rows_bp, rows_isext = [], []
    for _ in range(w):
        m_all = scores.max(axis=(0, 1), keepdims=True)  # [1, 1, N]
        s_star = jnp.min(
            jnp.where(scores >= m_all, slot, big), axis=(0, 1)
        )  # [N]
        parent = s_star // 5  # [N]
        append = s_star - 5 * parent - 1  # [N]; -1 = copy
        is_ext = append >= 0

        is_sel = slot == s_star[None, None, :]  # [5, W, N]; exactly one
        is_par = w_col == parent[None, :]  # [W, N]; exactly one row

        def take(cand):
            return jnp.sum(jnp.where(is_sel, cand, 0.0), axis=(0, 1))

        def from_parent(x):
            # is_par [W, N] broadcasts against any [..., W, N] state array
            return jnp.sum(
                jnp.where(is_par, x, x.dtype.type(0)), axis=-2
            )

        p_ctx_full = from_parent(state.ctx_full)
        p_h1 = from_parent(state.h1)
        p_h2 = from_parent(state.h2)
        au = (append + 1).astype(jnp.uint32)

        rows_pb.append(take(cand_pr_b))
        rows_pnb.append(take(cand_pr_nb))
        rows_pt.append(take(cand_pr_t))
        rows_last.append(jnp.where(is_ext, append, from_parent(state.last)))
        rows_len.append(from_parent(state.length) + is_ext.astype(jnp.int32))
        rows_ctxf.append(jnp.where(
            is_ext, (p_ctx_full * N_BASES + append) % ctx_mod, p_ctx_full
        ))
        rows_ctxp.append(jnp.where(
            is_ext, p_ctx_full, from_parent(state.ctx_prev)
        ))
        rows_h1.append(jnp.where(is_ext, p_h1 * _H1_MULT + au, p_h1))
        rows_h2.append(jnp.where(is_ext, p_h2 * _H2_MULT + au, p_h2))
        if lm_enabled:
            rows_lmf.append(from_parent(state.lm_full))  # [5, N]
            rows_lmp.append(from_parent(state.lm_prev))
        rows_bp.append(parent * 8 + append + 1)
        rows_isext.append(is_ext)

        scores = jnp.where(is_sel, KNOCKED, scores)

    new_pr_t = jnp.stack(rows_pt)  # [W, N]
    new_last = jnp.stack(rows_last)
    new_ctx_full = jnp.stack(rows_ctxf)
    is_ext_all = jnp.stack(rows_isext)  # [W, N]

    if lm_enabled:
        # one W·N-row gather for the extended beams; copies inherit rows.
        # This is the single true gather kept per step.  Measured
        # (scripts/exp_gather_spec.py, TPU v5e): in-scan gather cost is
        # per-INDEX (~11 ns/row, superlinear beyond ~2k rows) and does
        # not overlap across steps even at dependency distance 2 — so
        # speculative 4-extension prefetch ([4,W,N] rows) is a 4× loss,
        # and W·N is the minimum index count the semantics admit.
        idx = jnp.where(is_ext_all, new_ctx_full, 0)
        if _GATE_CLAMP_PROBE:
            # measurement-only traffic probe (VERDICT r3 task 4): clamp
            # the gather to row 0 on lanes whose signal-entropy gate is
            # closed THIS step, approximating a gather-at-consult
            # restructure's traffic.  NOT exact (rows can be consulted
            # later) — never enable in production.
            idx = jnp.where(s_ent > jnp.float32(s_thr), idx, 0)
        if isinstance(lm_table, tuple):
            # packed sparse tables (KmerLM.compressed): two small-span
            # gathers replace one gather over the 84 MB dense table.
            # l1 (1 MB) yields presence bit + rank; real rows index the
            # compact vals table, absent rows share vals[0] (uniform).
            l1, vals = lm_table
            word_rank = l1[idx >> 5]  # [W, N, 2]
            word = jax.lax.bitcast_convert_type(
                word_rank[..., 0], jnp.uint32)
            rank = jax.lax.bitcast_convert_type(
                word_rank[..., 1], jnp.uint32)
            bitpos = (idx & 31).astype(jnp.uint32)
            below = word & ((jnp.uint32(1) << bitpos) - jnp.uint32(1))
            present = (word >> bitpos) & jnp.uint32(1)
            cidx = jnp.where(
                present == jnp.uint32(1),
                rank + jnp.uint32(1) + jax.lax.population_count(below),
                jnp.uint32(0),
            ).astype(jnp.int32)
            fresh = vals[cidx]  # [W, N, 5]
        else:
            fresh = lm_table[idx]  # [W, N, 5]
        fresh = jnp.moveaxis(fresh, -1, 0)  # [5, W, N]
        parent_full = jnp.stack(rows_lmf, axis=1)  # [5, W, N]
        new_lm_full = jnp.where(is_ext_all[None], fresh, parent_full)
        new_lm_prev = jnp.where(
            is_ext_all[None], parent_full, jnp.stack(rows_lmp, axis=1)
        )
    else:
        new_lm_full = state.lm_full
        new_lm_prev = state.lm_prev

    new = BeamState(
        pr_b=jnp.stack(rows_pb),
        pr_nb=jnp.stack(rows_pnb),
        pr_t=new_pr_t,
        last=new_last,
        length=jnp.stack(rows_len),
        ctx_full=new_ctx_full,
        ctx_prev=jnp.stack(rows_ctxp),
        h1=jnp.stack(rows_h1),
        h2=jnp.stack(rows_h2),
        valid=new_pr_t > NEG_HALF,
        lm_full=new_lm_full,
        lm_prev=new_lm_prev,
    )

    # Masked (padded) timesteps leave the state untouched and emit
    # identity backpointers (parent = own slot, append = -1).
    def keep(n_, o_):
        if n_ is o_:  # untouched component (e.g. LM dummies): don't let
            return o_  # the where broadcast its dummy shape up to [.., N]
        return jnp.where(active if n_.ndim == 2 else active[None], n_, o_)

    out_state = jax.tree.map(keep, new, state)
    ident_bp = w_col * 8
    bp = jnp.where(active, jnp.stack(rows_bp), ident_bp).astype(jnp.int8)
    return out_state, bp


def backtrace_batch(bp) -> jnp.ndarray:
    """Walk the best beam backward through packed backpointers.

    Args:
      bp: ``[T, W, N]`` int8/int32 packed ``parent·8 + (append+1)`` per
        (timestep, beam slot, read) — the main scan's emission format and
        the Pallas kernel's native output format.

    Returns:
      ``[T, N]`` int32 labels in reversed (5'→3') emission order: row 0 =
      last emitted base; ``-1`` marks copy steps (no emission).
    """
    t, w, n = bp.shape
    w_col = jnp.arange(w, dtype=jnp.int32)[:, None]

    def step(beam, bp_t):  # beam [1, N]; bp_t [W, N]
        onehot = w_col == beam  # exactly one row; avoids gathers
        sel = jnp.sum(
            jnp.where(onehot, bp_t.astype(jnp.int32), 0),
            axis=0, keepdims=True,
        )
        return sel // 8, sel % 8 - 1

    _, labels = jax.lax.scan(
        step, jnp.zeros((1, n), jnp.int32), bp, reverse=True, unroll=8
    )
    return labels[::-1, 0, :]  # [T, N]; index 0 = last emitted base


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "ctx_len", "lm_enabled", "unroll"),
)
def beam_search_batch(
    mats,
    lengths,
    *,
    beam_width: int = 6,
    lm_probs=None,
    lm_ent=None,
    lm_l1=None,
    lm_vals=None,
    s_threshold: float = 0.5,
    r_threshold: float = 0.5,
    ctx_len: int = 11,
    lm_enabled: bool = False,
    unroll: int = 4,
):
    """Batched beam search over ``[N, T, 5]`` probability matrices.

    Args:
      mats: ``[N, T, 5]`` per-timestep class probabilities (blank last).
      lengths: ``[N]`` true timestep counts (rows beyond are masked).
      lm_probs/lm_ent: dense LM tables (``KmerLM``) when ``lm_enabled``.
      lm_l1/lm_vals: packed sparse tables (``KmerLM.compressed()``);
        when given they replace the dense tables with bit-identical
        values and a much smaller random-access working set.

    Returns:
      ``(rev_labels [N, T] int32, n_labels [N] int32, best_logp [N] f32)``
      where ``rev_labels[i, :n_labels[i]]``... — labels are emitted
      last-first with ``-1`` holes at copy steps; callers use
      :func:`labels_to_seq` to render strings.
    """
    mats = mats.astype(jnp.float32)
    n, t, _ = mats.shape
    if lm_enabled and lm_l1 is not None:
        lm_table = (lm_l1, lm_vals)
    elif lm_enabled:
        lm_table = jnp.concatenate(
            [lm_probs, lm_ent[:, None]], axis=1
        )  # [4^ctx, 5]
    else:
        lm_table = jnp.ones((1, N_BASES + 1), jnp.float32)
    ctx_mod = N_BASES**ctx_len

    mats_tn = jnp.transpose(mats, (1, 2, 0))  # [T, 5, N] batch-minor
    s_ents = _entropies_tn(mats_tn)  # [T, 1, N]
    active = (
        jnp.arange(t, dtype=jnp.int32)[:, None] < lengths[None, :]
    )[:, None, :]  # [T, 1, N]

    step = functools.partial(
        _step,
        beam_width=beam_width,
        lm_table=lm_table,
        ctx_mod=ctx_mod,
        s_thr=jnp.float32(s_threshold if s_threshold is not None else 0.0),
        r_thr=jnp.float32(r_threshold if r_threshold is not None else 0.0),
        ctx_len=ctx_len,
        lm_enabled=lm_enabled,
    )

    final, bp = jax.lax.scan(
        step, _init_state(beam_width, n, lm_enabled),
        (mats_tn, s_ents, active), unroll=unroll,
    )
    rev = backtrace_batch(bp)  # [T, N]
    return rev.T, final.length[0], final.pr_t[0]


def pack_labels(rev: jnp.ndarray) -> jnp.ndarray:
    """Nibble-pack a device label array along its last axis (device side).

    Labels are in {-1, 0..3}; ``label+1`` fits 4 bits, so two labels
    share a byte — halving the device→host fetch (the tunnel transfer
    is a visible slice of chunk-mode runtime).  Last axis must be even.
    """
    if rev.shape[-1] % 2 != 0:
        raise ValueError(
            f"pack_labels needs an even last axis, got {rev.shape}: pad "
            "the decode timestep count (bucket/window T) to a multiple "
            "of 2 before packing"
        )
    v = (rev + 1).astype(jnp.uint8)
    return v[..., 0::2] | (v[..., 1::2] << 4)


def pack_labels2(comp: jnp.ndarray) -> jnp.ndarray:
    """2-bit-pack FRONT-COMPACTED labels along the last axis.

    ``comp`` holds labels in {0..3} up to each row's emission count and
    -1 padding after (the fused chunk path's compaction output); the
    count travels separately (``n_lab``), so the padding needs no
    sentinel and four labels share a byte — half the nibble packing's
    bytes.  Last axis must be a multiple of 4.
    """
    if comp.shape[-1] % 4 != 0:
        raise ValueError(
            f"pack_labels2 needs a multiple-of-4 last axis, got "
            f"{comp.shape}"
        )
    v = jnp.maximum(comp, 0).astype(jnp.uint8)
    return (v[..., 0::4] | (v[..., 1::4] << 2) | (v[..., 2::4] << 4)
            | (v[..., 3::4] << 6))


def unpack_labels2(packed: np.ndarray, n_lab: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`pack_labels2` → int8 labels with -1 pads.

    ``n_lab``: per-row emission counts (broadcast against
    ``packed.shape[:-1]``); positions ≥ count are restored to -1.
    """
    packed = np.asarray(packed)
    m = packed.shape[-1]
    out = np.empty((*packed.shape[:-1], m * 4), np.int8)
    out[..., 0::4] = (packed & 3).astype(np.int8)
    out[..., 1::4] = ((packed >> 2) & 3).astype(np.int8)
    out[..., 2::4] = ((packed >> 4) & 3).astype(np.int8)
    out[..., 3::4] = ((packed >> 6) & 3).astype(np.int8)
    idx = np.arange(m * 4)
    pad = idx >= np.asarray(n_lab)[..., None]
    out[pad] = -1
    return out


def unpack_labels(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse of :func:`pack_labels` → int8 labels."""
    packed = np.asarray(packed)
    out = np.empty((*packed.shape[:-1], packed.shape[-1] * 2), np.int8)
    out[..., 0::2] = (packed & 15).astype(np.int8) - 1
    out[..., 1::2] = (packed >> 4).astype(np.int8) - 1
    return out


def rows_to_seqs(rev_rows: np.ndarray, reverse: bool = True,
                 bases: str = "ACGT") -> list[str]:
    """Vectorised :func:`labels_to_seq` over a ``[n, T]`` label block.

    One numpy pass for all rows (chunk mode renders ~90 window fragments
    per read — a python-level per-row loop costs more than the decode).
    ``reverse=True`` yields decoder-order strings (the chunk-consensus
    input order, reference basecall.py:111-121).
    """
    arr = np.asarray(rev_rows)
    if reverse:
        arr = arr[:, ::-1]
    mask = arr >= 0
    counts = mask.sum(1)
    lut = np.frombuffer(bases.encode(), np.uint8)
    blob = lut[arr[mask]].tobytes()  # row-major: rows stay contiguous
    offs = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    return [blob[offs[k]:offs[k + 1]].decode() for k in range(len(counts))]


def labels_to_seq(rev_labels: np.ndarray, reverse: bool = False,
                  bases: str = "ACGT") -> str:
    """Render a backtraced label row into a base string.

    ``reverse=False`` keeps the emitted (reversed, 5'→3') orientation that
    the fasta output wants; ``reverse=True`` yields the decoder-order
    string matching reference ``beam_search``'s return value.
    """
    arr = np.asarray(rev_labels)
    labs = arr[arr >= 0]
    if reverse:
        labs = labs[::-1]
    lut = np.frombuffer(bases.encode(), np.uint8)
    return lut[labs].tobytes().decode()
