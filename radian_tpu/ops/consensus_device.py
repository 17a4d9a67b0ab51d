"""Device-side chunk-mode consensus (offset-correlation).

The reference stitches per-window decoded fragments with difflib's
longest-matching-block heuristic on the host (reference
radian/sequence_assembly.py:19-48).  That control flow is host-shaped;
the TPU-native formulation used here exploits what the reference
ignores: consecutive windows are cut at a *fixed signal stride*, so the
displacement between fragment i-1 and fragment i is near
``len(frag) · step/window``.  For each consecutive pair we score every
candidate displacement in a bounded window by base-match count
(vectorised compare-and-sum on the VPU), take the best, cumulative-sum
the displacements into absolute positions, and scatter one-hot votes
into a ``[4, L]`` consensus matrix — a single jitted program, no
data-dependent shapes.

This is the ``consensus="device"`` pipeline mode; ``consensus="reference"``
(host difflib, exact reference behavior) remains the parity default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("max_disp", "out_len"))
def consensus_votes(frags, lens, *, max_disp: int, out_len: int):
    """Vote-matrix consensus of int-coded fragments.

    Args:
      frags: ``[F, L]`` int32 base indices (pad with -1).
      lens: ``[F]`` fragment lengths; zero-length fragments are skipped.
      max_disp: displacement search bound per pair (>= max fragment len).
      out_len: static consensus width bound.

    Returns:
      ``(votes [4, out_len] f32, total_len)``.
    """
    f, l = frags.shape
    pos_iota = jnp.arange(l)

    def pair_disp(prev, prev_len, cur, cur_len):
        """Best displacement of ``cur`` against ``prev`` by match count."""
        disps = jnp.arange(max_disp)

        def score(d):
            # cur[j] vs prev[d + j]
            idx = d + pos_iota
            ok = (idx < prev_len) & (pos_iota < cur_len)
            prev_at = prev[jnp.minimum(idx, l - 1)]
            return jnp.sum(jnp.where(ok & (prev_at == cur), 1, 0))

        scores = jax.vmap(score)(disps)
        return jnp.argmax(scores)  # ties -> smallest displacement

    disps = jax.vmap(
        lambda i: pair_disp(
            frags[jnp.maximum(i - 1, 0)], lens[jnp.maximum(i - 1, 0)],
            frags[i], lens[i],
        )
    )(jnp.arange(f))
    disps = disps.at[0].set(0)
    positions = jnp.cumsum(disps)

    votes = jnp.zeros((4, out_len), jnp.float32)
    flat_pos = (positions[:, None] + pos_iota[None, :]).reshape(-1)
    flat_base = frags.reshape(-1)
    valid = (pos_iota[None, :] < lens[:, None]).reshape(-1) & (flat_base >= 0)
    flat_pos = jnp.where(valid, flat_pos, out_len)  # OOB drops the vote
    votes = votes.at[
        jnp.clip(flat_base, 0, 3), flat_pos
    ].add(jnp.where(valid, 1.0, 0.0), mode="drop")
    total = jnp.max(
        jnp.where(lens > 0, positions + lens, 0)
    )
    return votes, jnp.minimum(total, out_len)


def assemble_fragments_device(fragments: list[str], max_disp: int = 256) -> str:
    """Host wrapper: strings in, consensus string out (decoder order)."""
    from radian_tpu.ops.consensus import BASES, _IDX

    frags = [f for f in fragments]
    if not frags:
        return ""
    f = len(frags)
    l = max(max(len(x) for x in frags), 1)
    arr = np.full((f, l), -1, np.int32)
    lens = np.zeros(f, np.int32)
    for i, s in enumerate(frags):
        arr[i, : len(s)] = [_IDX[b.upper()] for b in s]
        lens[i] = len(s)
    out_len = f * l + 1
    votes, total = consensus_votes(
        jnp.asarray(arr), jnp.asarray(lens),
        max_disp=min(max_disp, l + 1), out_len=out_len,
    )
    votes = np.asarray(votes)[:, : int(total)]
    if votes.shape[1] == 0:
        return ""
    return "".join(BASES[i] for i in np.argmax(votes, axis=0))
