"""Banded global alignment vs the monolithic aligner.

With band >= len(seq2) the band covers the whole matrix and the
output must be BIT-IDENTICAL to the full DP (same path, stats,
score). With a narrow band on pairs whose indels stay small, the
optimal path remains in-band and the results must still match the
full DP exactly.
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.aligner import PairwiseAligner
from genomics_rs_tpu.models.banded import align_banded
from genomics_rs_tpu.sequence import Sequence

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


def _mutated_pair(rng, m, n_subs, n_indels, max_indel=3):
    """A pair whose alignment path stays near the diagonal."""
    base = list("ACGT"[c] for c in rng.integers(0, 4, m))
    other = list(base)
    for _ in range(n_subs):
        p = int(rng.integers(0, len(other)))
        other[p] = "ACGT"[int(rng.integers(0, 4))]
    for _ in range(n_indels):
        p = int(rng.integers(1, len(other) - max_indel - 1))
        ln = int(rng.integers(1, max_indel + 1))
        if rng.integers(0, 2):
            del other[p : p + ln]
        else:
            other[p:p] = ["ACGT"[int(rng.integers(0, 4))]] * ln
    a = "".join(base)
    b = "".join(other)
    if len(b) > len(a):
        b = b[: len(a)]
    return Sequence("s1", a), Sequence("s2", b)


def _assert_same(got, want, tag):
    assert got.score == want.score, tag
    assert got.alignment == want.alignment, tag
    assert (
        got.matches,
        got.mismatches,
        got.opening_gaps,
        got.gap_extensions,
    ) == (
        want.matches,
        want.mismatches,
        want.opening_gaps,
        want.gap_extensions,
    ), tag


def test_full_band_equals_monolithic():
    """band >= n: exact full-DP semantics, bit-identical output."""
    rng = np.random.default_rng(71)
    aligner = PairwiseAligner(SCORES, engine="scan")
    for trial in range(3):
        m = int(rng.integers(80, 400))
        n = int(rng.integers(40, m + 1))
        a = "".join("ACGT"[c] for c in rng.integers(0, 4, m))
        b = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
        s1, s2 = Sequence("s1", a), Sequence("s2", b)
        want = aligner.align(s1, s2)
        got = align_banded(s1, s2, SCORES, band=1024, interpret=True)
        _assert_same(got, want, (trial, m, n))


def test_narrow_band_similar_pair():
    """A 1024-wide band on near-diagonal paths matches the full DP."""
    rng = np.random.default_rng(73)
    aligner = PairwiseAligner(SCORES, engine="scan")
    for trial in range(2):
        s1, s2 = _mutated_pair(rng, 1400, n_subs=20, n_indels=6)
        want = aligner.align(s1, s2)
        got = align_banded(s1, s2, SCORES, band=1024, interpret=True)
        _assert_same(got, want, (trial,))


def test_identical_long_pair():
    a = "ACGT" * 600
    s = Sequence("s", a)
    got = align_banded(s, s, SCORES, band=1024, interpret=True)
    assert got.score == len(a)
    assert got.matches == len(a)
    assert got.opening_gaps == 0


def test_rejects_longer_second_sequence():
    s1 = Sequence("a", "ACGT" * 10)
    s2 = Sequence("b", "ACGT" * 20)
    with pytest.raises(ValueError, match="longer sequence first"):
        align_banded(s1, s2, SCORES, interpret=True)


def test_alt_scores_full_band():
    rng = np.random.default_rng(79)
    alt = Scores(s_match=2, s_mismatch=-3, g=-2, h=-4)
    aligner = PairwiseAligner(alt, engine="scan")
    s1, s2 = _mutated_pair(rng, 300, n_subs=12, n_indels=4)
    want = aligner.align(s1, s2)
    got = align_banded(s1, s2, alt, band=1024, interpret=True)
    _assert_same(got, want, "alt")
