"""Device-side offset-correlation consensus."""

import numpy as np

from radian_tpu.ops.consensus_device import assemble_fragments_device


def _overlapping_fragments(rng, n, frag_len=40, stride=15):
    full = "".join(rng.choice(list("ACGT"), size=stride * n + frag_len))
    return (
        full,
        [full[i * stride : i * stride + frag_len] for i in range(n)],
        stride,
    )


def test_clean_fragments_reconstruct(rng):
    full, frags, stride = _overlapping_fragments(rng, 8)
    out = assemble_fragments_device(frags)
    expected_len = (len(frags) - 1) * stride + len(frags[-1])
    assert out == full[:expected_len]


def test_single_fragment():
    assert assemble_fragments_device(["ACGTAC"]) == "ACGTAC"
    assert assemble_fragments_device([]) == ""


def test_noisy_fragments_mostly_match(rng):
    full, frags, stride = _overlapping_fragments(rng, 10, frag_len=50,
                                                 stride=20)
    noisy = []
    for s in frags:
        cs = list(s)
        j = rng.integers(0, len(cs))
        cs[j] = "ACGT"[(("ACGT".index(cs[j])) + 1) % 4]
        noisy.append("".join(cs))
    out = assemble_fragments_device(noisy)
    expected_len = (len(frags) - 1) * stride + len(frags[-1])
    truth = full[:expected_len]
    matches = sum(a == b for a, b in zip(out, truth))
    assert matches / max(len(truth), 1) > 0.9


def test_negative_displacement_recovered(rng):
    """A fragment starting *before* its predecessor (negative
    displacement, which the difflib host path handles via truncation at
    column 0) must align correctly instead of being forced to d >= 0."""
    full = "".join(rng.choice(list("ACGT"), size=120))
    frags = [full[30:90], full[10:70], full[40:100]]  # disp -20 then +30
    out = assemble_fragments_device(frags, neg_disp=40)
    # fragment 2 realigns into [10, 70); consensus spans [30, 100) with
    # votes truncated below the first fragment's start
    assert full[30:100] in out or out in full
    matches = sum(a == b for a, b in zip(out, full[30:]))
    assert matches / len(out) > 0.95


def test_zero_overlap_falls_back_to_smallest_offset(rng):
    """Disjoint fragments (no matches at any displacement) tie at score
    0; the tie-break must pick d=0, not the most negative candidate."""
    a = "A" * 30
    b = "C" * 30
    out = assemble_fragments_device([a, b, a], neg_disp=20)
    assert len(out) == 30  # all fragments stacked at the same offset
