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


def test_mosaic_banded_walker_matches_xla():
    """The Mosaic banded walker (interpret mode) chases the same path
    as the XLA while_loop walker, including buffer-fill resumes."""
    import jax.numpy as jnp

    from genomics_rs_tpu.ops.gotoh_banded import (
        _walk_banded_jit,
        _walk_banded_pallas,
        band_offset,
        gotoh_banded,
    )
    from genomics_rs_tpu.ops.traceback_pallas import unpack_moves

    rng = np.random.default_rng(17)
    m, n, V = 400, 380, 1024
    a = "".join(rng.choice(list("ACGT"), m))
    bl = list(a[:n])
    for _ in range(12):
        bl[int(rng.integers(0, n))] = str(rng.choice(list("ACGT")))
    b = "".join(bl)
    s1e = np.frombuffer(a.encode(), np.uint8)
    s2e = np.frombuffer(b.encode(), np.uint8)
    score, dirs = gotoh_banded(
        s1e, s2e, m, n, SCORES, V, interpret=True
    )

    rows = np.arange(0, m + 1, dtype=np.int64)
    offs = band_offset(rows, m, n, V)
    deltas_h = np.diff(offs).astype(np.int32)
    KW = np.asarray(dirs).shape[0]
    D = max(-(-(KW * 16) // 128), 4)
    dl = np.zeros(D * 128, np.int32)
    dl[: len(deltas_h)] = deltas_h
    want_moves, want_pos, want_done, want_oob = map(
        np.asarray,
        _walk_banded_jit(
            dirs, jnp.asarray(deltas_h), np.int32(offs[-1]),
            m=m, n=n, V=V, max_steps=8192,
        ),
    )
    assert bool(want_done) and not bool(want_oob)
    want = want_moves[: int(want_pos)]

    # Small cap forces at least one resume through the outer driver.
    chunks, i, j, off = [], m, n, int(offs[-1])
    for _ in range(64):
        words, pos, i_f, j_f, done, oob = map(
            np.asarray,
            _walk_banded_pallas(
                jnp.asarray(dirs), jnp.asarray(dl.reshape(D, 128)),
                np.int32(i), np.int32(j), np.int32(off),
                V=V, max_steps=256, interpret=True,
            ),
        )
        assert not bool(oob)
        chunks.append(unpack_moves(words, int(pos)))
        if bool(done):
            break
        i, j = int(i_f), int(j_f)
        off = int(offs[i])
    else:
        raise AssertionError("mosaic walker did not finish")
    got = np.concatenate(chunks)
    assert np.array_equal(got, want)


def test_mosaic_banded_walker_flags_out_of_band():
    """A corrupt bitmap that walks the head out of the band must set
    oob (the wrapper raises) — not spin: states outside [0, V) can
    never re-enter a DMA window, and the in-window bad check is
    suppressed for them (round-4 review). A regression here hangs
    this test visibly rather than passing silently."""
    import numpy as np

    from genomics_rs_tpu.ops.gotoh_banded import _walk_banded_pallas

    KW, V = 18, 256
    # Every packed code = INS (0b01 repeated): j decreases while off
    # stays, driving v = j - off - 1 negative within a few moves.
    dirs = np.full((KW, V), 0x55555555, np.int32)
    deltas2d = np.zeros((4, 128), np.int32)
    words, pos, i_f, j_f, done, oob = _walk_banded_pallas(
        dirs, deltas2d, np.int32(100), np.int32(50), np.int32(40),
        V=V, max_steps=1024, interpret=True,
    )
    assert bool(oob) and not bool(done)
