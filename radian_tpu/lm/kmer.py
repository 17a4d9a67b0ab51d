"""12-mer mRNA language model tables.

The reference ships the LM as a JSON dict mapping an 11-base context
string to a 4-probability next-base distribution, loaded into a python
dict keyed by int tuples (reference radian/basecall.py:48-57) and
consulted per beam extension with a per-context entropy cache (reference
radian/decode.py:79-96).

On TPU the model becomes two dense HBM-resident arrays indexed by the
base-4-packed context:

- ``probs``   ``[4^context_len, 4]`` float32 next-base distributions
- ``entropy`` ``[4^context_len]``   float32 distribution entropies
  (precomputing the whole entropy table replaces the reference's lazily
  filled ``entr_cache``)

Contexts absent from a sparse JSON are densified to the uniform
distribution, whose entropy ``log 4 ≈ 1.386`` exceeds any sensible
``r_threshold`` (default 0.5), so the fusion gate rejects them — i.e. the
signal model runs un-fused exactly as if the context were unknown.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

N_BASES = 4
BASES = "ACGT"
_BASE_INDEX = {b: i for i, b in enumerate(BASES)}


def pack_context(context) -> int:
    """Pack a base-index tuple (or 'ACGT' string) big-endian in base 4."""
    v = 0
    for b in context:
        v = v * N_BASES + (_BASE_INDEX[b] if isinstance(b, str) else int(b))
    return v


@dataclasses.dataclass
class KmerLM:
    context_len: int
    probs: np.ndarray  # [4^context_len, 4] float32
    entropy: np.ndarray  # [4^context_len] float32

    @property
    def n_contexts(self) -> int:
        return self.probs.shape[0]


def _entropy_rows(probs: np.ndarray) -> np.ndarray:
    """Row entropies, zero-prob events contributing nothing
    (reference decode.py:73-76)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(probs > 0, probs * np.log(probs), 0.0)
    return (-terms.sum(axis=-1)).astype(np.float32)


def build_dense_tables(model: dict, context_len: int = 11) -> KmerLM:
    """Densify ``{context tuple/str: [p_A,p_C,p_G,p_T]}`` into HBM tables."""
    n = N_BASES**context_len
    probs = np.full((n, N_BASES), 1.0 / N_BASES, dtype=np.float32)
    for ctx, dist in model.items():
        if len(ctx) != context_len:
            raise ValueError(
                f"context {ctx!r} has length {len(ctx)}, expected {context_len}"
            )
        probs[pack_context(ctx)] = np.asarray(dist, dtype=np.float32)
    return KmerLM(context_len, probs, _entropy_rows(probs.astype(np.float64)))


def load_kmer_json(path: str | Path, context_len: int = 11) -> KmerLM:
    """Load the reference's JSON format (string contexts) into dense tables."""
    with open(path) as f:
        raw = json.load(f)
    model = {
        tuple(_BASE_INDEX[b] for b in ctx): dist for ctx, dist in raw.items()
    }
    return build_dense_tables(model, context_len)


def random_kmer_model(
    rng: np.random.Generator,
    context_len: int = 5,
    n_contexts: int | None = None,
    concentration: float = 0.3,
) -> dict:
    """Synthesize a sparse k-mer model dict (for tests and benchmarks).

    Low ``concentration`` yields peaked distributions (low entropy) so the
    fusion gate actually fires.
    """
    total = N_BASES**context_len
    if n_contexts is None or n_contexts >= total:
        idx = np.arange(total)
    else:
        idx = rng.choice(total, size=n_contexts, replace=False)
    model = {}
    for v in idx:
        ctx = tuple((v // N_BASES**p) % N_BASES for p in range(context_len - 1, -1, -1))
        model[ctx] = rng.dirichlet(np.full(N_BASES, concentration)).tolist()
    return model
