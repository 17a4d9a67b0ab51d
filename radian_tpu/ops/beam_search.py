"""CTC prefix beam search with 12-mer LM fusion, as a jitted lax.scan.

Re-derivation of the reference decoder's semantics (reference
radian/decode.py:100-211) in a fixed-shape, vectorised form that compiles
to a single XLA while-loop on TPU and vmaps over a batch of reads/chunks:

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
  (``copy(0), extend(0, A..T), copy(1), ...``) and merged mass is carried
  by the earlier slot; ``lax.top_k`` picks the earliest slot on ties.

Instead of materialising labelings in the scan state, the scan emits
per-step backpointers ``(parent beam, appended base | -1)`` and a second,
reversed scan walks the best beam back — emitting bases in reversed
order, which is exactly the 5'→3' orientation the fasta output wants
(reference basecall.py:129 reverses the decoded string).

TPU notes: beam state is a handful of ``[W]`` vectors (W≈6); a batch
dimension is vmapped outside so the VPU lanes see ``[N, W, ...]`` work.
LM lookups are two ``[N, W]`` gathers per step from the HBM-resident
``[4^11, 4]`` probability and ``[4^11]`` entropy tables.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

N_BASES = 4
BLANK = 4
NEG_INF = -jnp.inf
_H1_MULT = np.uint32(2654435761)
_H2_MULT = np.uint32(2246822519)


class BeamState(NamedTuple):
    pr_b: jnp.ndarray  # [W] log P(paths ending in blank)
    pr_nb: jnp.ndarray  # [W] log P(paths ending in non-blank)
    pr_t: jnp.ndarray  # [W] log P(total)
    last: jnp.ndarray  # [W] last emitted base, -1 if empty labeling
    length: jnp.ndarray  # [W] labeling length
    ctx_full: jnp.ndarray  # [W] last ctx_len labels, packed base-4
    ctx_prev: jnp.ndarray  # [W] last ctx_len labels of labeling[:-1]
    h1: jnp.ndarray  # [W] rolling hash 1 of full labeling
    h2: jnp.ndarray  # [W] rolling hash 2
    valid: jnp.ndarray  # [W] slot holds a live beam
    # cached LM table rows for ctx_full / ctx_prev ([W, 5] probs+entropy):
    # contexts only change on extension, so carrying the rows means one
    # W-row HBM gather per step (for the extended beams) instead of 2W
    lm_full: jnp.ndarray
    lm_prev: jnp.ndarray


def _init_state(beam_width: int) -> BeamState:
    w = beam_width
    neg = jnp.full((w,), NEG_INF, jnp.float32)
    return BeamState(
        pr_b=neg.at[0].set(0.0),
        pr_nb=neg,
        pr_t=neg.at[0].set(0.0),
        last=jnp.full((w,), -1, jnp.int32),
        length=jnp.zeros((w,), jnp.int32),
        ctx_full=jnp.zeros((w,), jnp.int32),
        ctx_prev=jnp.zeros((w,), jnp.int32),
        h1=jnp.ones((w,), jnp.uint32),
        h2=jnp.ones((w,), jnp.uint32),
        valid=jnp.zeros((w,), bool).at[0].set(True),
        lm_full=jnp.zeros((w, N_BASES + 1), jnp.float32),
        lm_prev=jnp.zeros((w, N_BASES + 1), jnp.float32),
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


def _fused_dist(m4, s_base, s_sum, r_dist, r_ent, s_ent, len_ok, s_thr, r_thr):
    """LM fusion (reference decode.py:52-64,79-96): gated average of LM and
    renormalised signal base distribution, rescaled by non-blank mass."""
    fused = (r_dist + s_base[None, :]) * 0.5 * s_sum
    gate = len_ok & (r_ent < r_thr) & (s_ent > s_thr)
    return jnp.where(gate[:, None], fused, m4[None, :])


def _step(state: BeamState, xs, *, beam_width, lm_table, ctx_mod,
          s_thr, r_thr, ctx_len, lm_enabled):
    m5, s_ent, active = xs
    w = beam_width
    m4 = m5[:N_BASES]
    blank_lp = jnp.log(m5[BLANK])

    if lm_enabled:
        s_sum = m4.sum()
        s_base = jnp.where(s_sum > 0, m4 / s_sum, 0.0)
        # cached rows: the LM table was last consulted when each beam's
        # context last changed (its latest extension)
        rows_c, rows_e = state.lm_prev, state.lm_full
        dist_c = _fused_dist(
            m4, s_base, s_sum, rows_c[:, :N_BASES], rows_c[:, N_BASES],
            s_ent, state.length >= ctx_len + 1, s_thr, r_thr,
        )
        dist_e = _fused_dist(
            m4, s_base, s_sum, rows_e[:, :N_BASES], rows_e[:, N_BASES],
            s_ent, state.length >= ctx_len, s_thr, r_thr,
        )
    else:
        dist_c = dist_e = jnp.broadcast_to(m4, (w, N_BASES))

    log_dist_c = jnp.log(dist_c)
    log_dist_e = jnp.log(dist_e)

    # NOTE on indexing style: every small gather in this step (indexing a
    # [W]- or [5W]-sized axis by a data-dependent index) is written as an
    # exact one-hot masked sum/max instead of `x[idx]`.  XLA lowers tiny
    # dynamic gathers inside a while loop to ~10-17 us serialized gather
    # fusions each — profiled at ~90% of decode wall time — while the
    # one-hot forms fuse into the surrounding elementwise work.  Masked
    # sums with exactly one selected element are bit-exact (adding zeros).
    cvec = jnp.arange(N_BASES, dtype=jnp.int32)

    # COPY candidates (one per beam).
    sel_last = jnp.sum(
        jnp.where(state.last[:, None] == cvec[None, :], log_dist_c, 0.0),
        axis=-1,
    )  # log_dist_c[w, last[w]]; rows with last == -1 are masked out below
    pr_nb_c = jnp.where(
        state.length > 0,
        state.pr_nb + sel_last,
        NEG_INF,
    )
    pr_b_c = state.pr_t + blank_lp
    pr_t_c = jnp.logaddexp(pr_b_c, pr_nb_c)

    # EXTEND candidates (four per beam).
    repeat = state.last[:, None] == cvec[None, :]
    base_lp = jnp.where(repeat, state.pr_b[:, None], state.pr_t[:, None])
    pr_nb_e = base_lp + log_dist_e  # [W, 4]

    # Merge detection: EXTEND(b1, c) vs COPY(b2).
    h1_ext = state.h1[:, None] * _H1_MULT + (cvec + 1).astype(jnp.uint32)
    h2_ext = state.h2[:, None] * _H2_MULT + (cvec + 1).astype(jnp.uint32)
    match = (
        state.valid[:, None, None]
        & state.valid[None, None, :]
        & (state.length[None, None, :] == state.length[:, None, None] + 1)
        & (state.h1[None, None, :] == h1_ext[:, :, None])
        & (state.h2[None, None, :] == h2_ext[:, :, None])
    )  # [b1, c, b2]
    ext_has_match = match.any(-1)  # [W, 4]

    # Insertion-order slot of each candidate (reference iterates
    # copy(b), extend(b, 0..3) per beam in rank order).  At most one b2
    # matches any (b1, c), so "the matched copy's slot is later" reduces
    # to an any() over the match mask.
    slot_copy = 5 * jnp.arange(w)  # [W]
    slot_ext = 5 * jnp.arange(w)[:, None] + 1 + cvec[None, :]  # [W, 4]
    ext_wins = (
        match & (slot_ext[:, :, None] < slot_copy[None, None, :])
    ).any(-1)  # earlier slot carries mass

    # Contribution of merged extends into each copy slot.
    contrib = jnp.where(
        match & ~ext_wins[:, :, None], pr_nb_e[:, :, None], NEG_INF
    )
    copy_extra = contrib.max(axis=(0, 1))  # [W]; ≤1 contributor per copy
    copy_killed = (match & ext_wins[:, :, None]).any(axis=(0, 1))  # [W]

    m_pr_nb_c = jnp.where(
        copy_killed, NEG_INF, jnp.logaddexp(pr_nb_c, copy_extra)
    )
    m_pr_b_c = jnp.where(copy_killed, NEG_INF, pr_b_c)
    m_pr_t_c = jnp.where(
        copy_killed, NEG_INF, jnp.logaddexp(pr_t_c, copy_extra)
    )

    ext_killed = ext_has_match & ~ext_wins
    # value of the (unique) matched copy candidate, as a masked max
    copy_nb_in = jnp.where(match, pr_nb_c[None, None, :], NEG_INF).max(-1)
    copy_b_in = jnp.where(match, pr_b_c[None, None, :], NEG_INF).max(-1)
    copy_t_in = jnp.where(match, pr_t_c[None, None, :], NEG_INF).max(-1)
    absorb = ext_has_match & ext_wins
    m_pr_nb_e = jnp.where(
        ext_killed,
        NEG_INF,
        jnp.where(absorb, jnp.logaddexp(pr_nb_e, copy_nb_in), pr_nb_e),
    )
    m_pr_b_e = jnp.where(absorb, copy_b_in, NEG_INF)
    m_pr_t_e = jnp.where(
        ext_killed,
        NEG_INF,
        jnp.where(absorb, jnp.logaddexp(copy_t_in, pr_nb_e), pr_nb_e),
    )

    # Candidate arrays in insertion order: slot 5b = copy(b), 5b+1+c =
    # ext(b, c) — i.e. rows of [W, 5] with the copy in column 0.
    def interleave(copy_vals, ext_vals, dtype=jnp.float32):
        return jnp.concatenate(
            [copy_vals.astype(dtype)[:, None], ext_vals.astype(dtype)], axis=1
        ).reshape(5 * w)

    cand_pr_b = interleave(m_pr_b_c, m_pr_b_e)
    cand_pr_nb = interleave(m_pr_nb_c, m_pr_nb_e)
    cand_pr_t = interleave(m_pr_t_c, m_pr_t_e)

    top_vals, top_idx = jax.lax.top_k(cand_pr_t, w)
    # slot layout 5b + col makes parent/append pure arithmetic
    parent = top_idx // 5
    append = top_idx % 5 - 1
    is_ext = append >= 0

    # one-hot extraction of the selected candidates / parent state rows
    sel30 = top_idx[:, None] == jnp.arange(5 * w)[None, :]  # [W, 5W]
    selw = parent[:, None] == jnp.arange(w)[None, :]  # [W, W]

    def take30(x):
        return jnp.sum(jnp.where(sel30, x[None, :], x.dtype.type(0)), -1)

    def from_parent(x):
        if x.ndim == 1:
            return jnp.sum(jnp.where(selw, x[None, :], x.dtype.type(0)), -1)
        return jnp.sum(
            jnp.where(selw[:, :, None], x[None, :, :], x.dtype.type(0)), 1
        )

    p_ctx_full = from_parent(state.ctx_full)
    new_ctx_full = jnp.where(
        is_ext, (p_ctx_full * N_BASES + append) % ctx_mod, p_ctx_full
    )
    if lm_enabled:
        # one W-row gather for the extended beams; copies inherit rows.
        # This is the single true gather kept per step (4^ctx-row table).
        fresh = lm_table[jnp.where(is_ext, new_ctx_full, 0)]
        parent_full = from_parent(state.lm_full)
        new_lm_full = jnp.where(is_ext[:, None], fresh, parent_full)
        new_lm_prev = jnp.where(
            is_ext[:, None], parent_full, from_parent(state.lm_prev)
        )
    else:
        new_lm_full = state.lm_full
        new_lm_prev = state.lm_prev

    p_h1 = from_parent(state.h1)
    p_h2 = from_parent(state.h2)
    new = BeamState(
        pr_b=take30(cand_pr_b),
        pr_nb=take30(cand_pr_nb),
        pr_t=top_vals,
        last=jnp.where(is_ext, append, from_parent(state.last)),
        length=from_parent(state.length) + is_ext.astype(jnp.int32),
        ctx_full=new_ctx_full,
        ctx_prev=jnp.where(is_ext, p_ctx_full, from_parent(state.ctx_prev)),
        h1=jnp.where(
            is_ext, p_h1 * _H1_MULT + (append + 1).astype(jnp.uint32), p_h1
        ),
        h2=jnp.where(
            is_ext, p_h2 * _H2_MULT + (append + 1).astype(jnp.uint32), p_h2
        ),
        valid=top_vals > NEG_INF,
        lm_full=new_lm_full,
        lm_prev=new_lm_prev,
    )

    # Masked (padded) timesteps leave the state untouched and emit
    # identity backpointers.
    ident_parent = jnp.arange(w, dtype=jnp.int32)
    ident_append = jnp.full((w,), -1, jnp.int32)
    out_state = jax.tree.map(
        lambda n, o: jnp.where(active, n, o), new, state
    )
    bp = (
        jnp.where(active, parent, ident_parent),
        jnp.where(active, append, ident_append),
    )
    return out_state, bp


def _backtrace(parents, appends):
    """Walk the best beam backward; emit bases in reversed (5'→3') order."""
    w = parents.shape[-1]
    wvec = jnp.arange(w, dtype=jnp.int32)

    def step(beam, xs):
        parent_t, append_t = xs
        onehot = beam == wvec  # scalar [W] one-hot; avoids gather ops
        label = jnp.sum(jnp.where(onehot, append_t, 0))
        return jnp.sum(jnp.where(onehot, parent_t, 0)), label

    _, rev_labels = jax.lax.scan(
        step, jnp.int32(0), (parents, appends), reverse=True
    )
    return rev_labels[::-1]  # index 0 = last emitted base


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

    Returns:
      ``(rev_labels [N, T] int32, n_labels [N] int32, best_logp [N] f32)``
      where ``rev_labels[i, :n_labels[i]]``... — labels are emitted
      last-first with ``-1`` holes at copy steps; callers use
      :func:`labels_to_seq` to render strings.
    """
    mats = mats.astype(jnp.float32)
    n, t, _ = mats.shape
    if lm_enabled:
        lm_table = jnp.concatenate(
            [lm_probs, lm_ent[:, None]], axis=1
        )  # [4^ctx, 5]
    else:
        lm_table = jnp.ones((1, N_BASES + 1), jnp.float32)
    ctx_mod = N_BASES**ctx_len
    s_ents = signal_entropies(mats)
    t_idx = jnp.arange(t)

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

    def one(mat, s_ent, length):
        active = t_idx < length
        final, (parents, appends) = jax.lax.scan(
            step, _init_state(beam_width), (mat, s_ent, active),
            unroll=unroll,
        )
        rev = _backtrace(parents, appends)
        return rev, final.length[0], final.pr_t[0]

    return jax.vmap(one)(mats, s_ents, lengths)


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
