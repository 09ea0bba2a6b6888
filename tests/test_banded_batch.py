"""Tests for the batched banded kernel (``ops/gotoh_banded_batch``).

Oracles: the full-DP scan aligner when the band covers everything
(W >= N: banded == full DP by construction) and the single-pair
banded kernel at the same geometry. ``bench.py --smoke`` re-runs the
parities on hardware (``banded_batch`` rows).
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.aligner import PairwiseAligner
from genomics_rs_tpu.ops.gotoh_banded import gotoh_banded, walk_banded
from genomics_rs_tpu.ops.gotoh_banded_batch import (
    banded_align_batch,
    gotoh_banded_batch,
)
from genomics_rs_tpu.ops.traceback import classify_moves
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, Sequence

SC = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


def _similar_corpus(rng, B, L, muts=10, indel=True):
    base = rng.choice(list("ACGT"), L)
    seqs1, seqs2 = [], []
    for _ in range(B):
        b = base.copy()
        for _ in range(muts):
            b[rng.integers(0, len(b))] = rng.choice(list("ACGT"))
        if indel:
            b = np.delete(b, rng.integers(0, len(b) - 10))
        seqs1.append("".join(base))
        seqs2.append("".join(b))
    return seqs1, seqs2


def _encode(seqs1, seqs2, Lm, Ln):
    s1b = np.stack(
        [
            Sequence("a", s).encoded(pad_to=Lm, pad_value=PAD_S1)
            for s in seqs1
        ]
    )
    s2b = np.stack(
        [
            Sequence("b", s).encoded(pad_to=Ln, pad_value=PAD_S2)
            for s in seqs2
        ]
    )
    ms = np.array([len(s) for s in seqs1], np.int32)
    ns = np.array([len(s) for s in seqs2], np.int32)
    return s1b, s2b, ms, ns


class TestBandedBatch:
    def test_full_cover_matches_full_dp(self):
        # W >= N: band covers the whole table -> alignments (path +
        # stats + score) bit-identical to the scan aligner, for a
        # mixed-length batch spanning two 8-pair panes.
        rng = np.random.default_rng(51)
        seqs1, seqs2 = _similar_corpus(rng, 11, 300)
        s1b, s2b, ms, ns = _encode(seqs1, seqs2, 384, 384)
        res = banded_align_batch(
            s1b, s2b, ms, ns, SC, W=384, interpret=True
        )
        oracle = PairwiseAligner(SC, engine="scan")
        for k, (score, moves) in enumerate(res):
            a = Sequence("a", seqs1[k])
            b = Sequence("b", seqs2[k])
            ref = oracle.align(a, b)
            got = classify_moves(
                np.asarray(moves), int(ms[k]), int(ns[k]), score, a, b
            )
            assert got.score == ref.score
            assert got.alignment == ref.alignment
            assert (
                got.matches,
                got.mismatches,
                got.gap_extensions,
                got.opening_gaps,
            ) == (
                ref.matches,
                ref.mismatches,
                ref.gap_extensions,
                ref.opening_gaps,
            )

    def test_matches_single_pair_banded_same_geometry(self):
        # Uniform-length batch: the shared geometry equals each pair's
        # own, so the batched fill must match per-pair gotoh_banded
        # bit-for-bit (scores and walked moves) at a narrow band.
        rng = np.random.default_rng(53)
        seqs1, seqs2 = _similar_corpus(rng, 8, 1500, muts=30)
        # trim to exactly equal lengths
        L = min(min(len(s) for s in seqs1), min(len(s) for s in seqs2))
        seqs1 = [s[:L] for s in seqs1]
        seqs2 = [s[:L] for s in seqs2]
        Lp = -(-L // 128) * 128
        s1b, s2b, ms, ns = _encode(seqs1, seqs2, Lp, Lp)
        W = 1024  # single-pair kernel's minimum band width
        res = gotoh_banded_batch(
            s1b, s2b, ms, ns, SC, W=W, interpret=True
        )[0]
        for k in range(8):
            sp, dp = gotoh_banded(
                s1b[k], s2b[k], L, L, SC, V=W, interpret=True
            )
            assert int(np.asarray(res.score)[k]) == int(sp)
            mv_b = walk_banded(
                res.pair_dirs(k), L, L, W, geom=(res.M, res.N)
            )
            mv_s = walk_banded(dp, L, L, W)
            np.testing.assert_array_equal(mv_b, mv_s)

    def test_mixed_lengths_narrow_band(self):
        # Slightly different lengths under a narrow band: scores match
        # per-pair banded fills called with the SHARED geometry via
        # the full-DP equivalence on covered paths (check score only
        # vs full DP — these mutated pairs' optimal paths stay within
        # W/4 of the diagonal).
        rng = np.random.default_rng(57)
        seqs1, seqs2 = _similar_corpus(rng, 6, 400, muts=8)
        s1b, s2b, ms, ns = _encode(seqs1, seqs2, 512, 512)
        res = banded_align_batch(
            s1b, s2b, ms, ns, SC, W=256, interpret=True
        )
        oracle = PairwiseAligner(SC, engine="scan")
        for k, (score, moves) in enumerate(res):
            ref = oracle.align(
                Sequence("a", seqs1[k]), Sequence("b", seqs2[k])
            )
            assert score == ref.score, k

    def test_rejects_dissimilar_lengths(self):
        rng = np.random.default_rng(59)
        s1b, s2b, ms, ns = _encode(
            ["ACGT" * 100, "ACGT" * 100],
            ["ACGT" * 100, "ACGT" * 10],
            512,
            512,
        )
        with pytest.raises(ValueError, match="outside the shared band"):
            gotoh_banded_batch(s1b, s2b, ms, ns, SC, W=128, interpret=True)

    def test_kimura_scoring(self):
        rng = np.random.default_rng(61)
        kim = Scores(1, -2, -1, -5, s_transition=-1)
        seqs1, seqs2 = _similar_corpus(rng, 4, 200, muts=12, indel=False)
        s1b, s2b, ms, ns = _encode(seqs1, seqs2, 256, 256)
        res = banded_align_batch(
            s1b, s2b, ms, ns, kim, W=256, interpret=True
        )
        oracle = PairwiseAligner(kim, engine="scan")
        for k, (score, moves) in enumerate(res):
            ref = oracle.align(
                Sequence("a", seqs1[k]), Sequence("b", seqs2[k])
            )
            assert score == ref.score, k
