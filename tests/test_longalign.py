"""Checkpointed long-pair alignment vs the monolithic aligner.

The full path, stats and score must be BIT-IDENTICAL: the checkpoint
scheme refills blocks with exact boundary values, so every direction
code equals the monolithic fill's.
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.aligner import PairwiseAligner
from genomics_rs_tpu.models.longalign import align_checkpointed
from genomics_rs_tpu.sequence import Sequence

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


@pytest.mark.parametrize("is_local", [False, True])
def test_longalign_matches_aligner(is_local):
    rng = np.random.default_rng(47)
    aligner = PairwiseAligner(SCORES, is_local=is_local, engine="scan")
    for trial in range(4):
        m = int(rng.integers(10, 300))
        n = int(rng.integers(10, 300))
        # Correlated strings so paths have long matches and gaps.
        base = rng.choice(list("ACGT"), max(m, n) + 50)
        a = "".join(base[:m])
        bl = list(base[5 : n + 5])
        for _ in range(6):
            bl[int(rng.integers(0, n))] = str(rng.choice(list("ACGT")))
        b = "".join(bl)
        s1, s2 = Sequence("s1", a), Sequence("s2", b)

        want = aligner.align(s1, s2)
        got = align_checkpointed(
            s1, s2, SCORES, is_local=is_local, block_rows=64, interpret=True
        )
        assert got.score == want.score, (trial,)
        assert got.alignment == want.alignment, (trial,)
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
        ), (trial,)


def test_longalign_identical_strings():
    a = "ACGT" * 40
    s = Sequence("s", a)
    got = align_checkpointed(
        s, s, SCORES, is_local=False, block_rows=64, interpret=True
    )
    assert got.score == len(a)
    assert got.matches == len(a)


@pytest.mark.parametrize("is_local", [False, True])
def test_score_long_matches_oracle(is_local):
    from genomics_rs_tpu.models.longalign import score_long

    rng = np.random.default_rng(53)
    m, n = 210, 170
    a = "".join(rng.choice(list("ACGT"), m))
    b = "".join(rng.choice(list("ACGT"), n))
    s1, s2 = Sequence("s1", a), Sequence("s2", b)

    aligner = PairwiseAligner(SCORES, is_local=is_local, engine="scan")
    want = aligner.align(s1, s2)
    got = score_long(
        s1, s2, SCORES, is_local=is_local, block_rows=64, interpret=True
    )
    assert got[0] == want.score
    if is_local:
        # start cell must match too (reference last-row-major argmax)
        dirs_ref = aligner.align(s1, s2)
        # (score equality checked; start via the fill result)
        from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
        from genomics_rs_tpu.sequence import PAD_S1, PAD_S2

        s1e = s1.encoded(pad_to=256, pad_value=PAD_S1)
        s2e = s2.encoded(pad_to=256, pad_value=PAD_S2)
        ref = gotoh_fill_scan(s1e, s2e, m, n, SCORES, True)
        assert got[1] == int(ref.start_i)
        assert got[2] == int(ref.start_j)


@pytest.mark.parametrize("is_local", [False, True])
def test_windowed_backward_matches_aligner(is_local):
    """The windowed backward (stride-V column checkpoints + left
    boundary streams) is bit-identical to the monolithic aligner.

    block_rows=1023 gives V=1024; n ~ 2600 makes the walk enter
    windows with jc > 0, exercising captured-column left boundaries
    across multiple row blocks.
    """
    rng = np.random.default_rng(61)
    aligner = PairwiseAligner(SCORES, is_local=is_local, engine="scan")
    m, n = 2100, 2600
    base = rng.choice(list("ACGT"), max(m, n) + 50)
    a = "".join(base[:m])
    bl = list(base[7 : n + 7])
    for _ in range(20):
        bl[int(rng.integers(0, n))] = str(rng.choice(list("ACGT")))
    b = "".join(bl)
    s1, s2 = Sequence("s1", a), Sequence("s2", b)

    want = aligner.align(s1, s2)
    got = align_checkpointed(
        s1, s2, SCORES, is_local=is_local,
        block_rows=1023, interpret=True,
    )
    assert got.score == want.score
    assert got.alignment == want.alignment
    assert (
        got.matches, got.mismatches,
        got.opening_gaps, got.gap_extensions,
    ) == (
        want.matches, want.mismatches,
        want.opening_gaps, want.gap_extensions,
    )


def test_windowed_backward_left_exit():
    """A path with a horizontal run longer than the window stride
    must exit LEFT and resume in a wider window, bit-identically."""
    rng = np.random.default_rng(62)
    m, n = 300, 2600  # global path walks ~2300 columns in one block
    a = "".join(rng.choice(list("ACGT"), m))
    b = a[:150] + "".join(rng.choice(list("ACGT"), n - m)) + a[150:]
    s1, s2 = Sequence("s1", a), Sequence("s2", b)
    aligner = PairwiseAligner(SCORES, is_local=False, engine="scan")
    want = aligner.align(s1, s2)
    got = align_checkpointed(
        s1, s2, SCORES, is_local=False,
        block_rows=1023, interpret=True,
    )
    assert got.score == want.score
    assert got.alignment == want.alignment


def test_classify_moves_vectorized_matches_loop():
    """The vectorized classify_moves (round 4) is bit-identical to
    the per-move loop (which still serves the DEBUG trace path)."""
    import logging

    from genomics_rs_tpu.ops.traceback import classify_moves

    rng = np.random.default_rng(91)
    tlog = logging.getLogger("genomics_rs_tpu.ops.traceback")
    for trial in range(20):
        m, n = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        s1 = Sequence("a", "".join(rng.choice(list("ACGT"), m)))
        s2 = Sequence("b", "".join(rng.choice(list("ACGT"), n)))
        T = int(rng.integers(0, m + n + 5))
        codes = rng.integers(0, 3, T).astype(np.uint8)  # SUB/INS/DEL
        fast = classify_moves(codes, m, n, 7, s1, s2)
        old_level = tlog.level
        tlog.setLevel(logging.DEBUG)  # forces the loop path
        try:
            slow = classify_moves(codes, m, n, 7, s1, s2)
        finally:
            tlog.setLevel(old_level)
        assert fast.alignment == slow.alignment, trial
        assert (
            fast.matches, fast.mismatches,
            fast.opening_gaps, fast.gap_extensions,
        ) == (
            slow.matches, slow.mismatches,
            slow.opening_gaps, slow.gap_extensions,
        ), trial


def test_classify_moves_batch_matches_per_pair():
    """classify_moves_batch (round 5, one 2-D pass for B pairs) is
    bit-identical to per-pair classify_moves, padding included."""
    from genomics_rs_tpu.ops.traceback import (
        classify_moves,
        classify_moves_batch,
    )

    rng = np.random.default_rng(92)
    for trial in range(8):
        B = int(rng.integers(1, 12))
        T = int(rng.integers(1, 70))
        pairs = []
        moves = np.full((B, T), 255, np.uint8)
        counts = np.zeros(B, np.int64)
        si = np.zeros(B, np.int64)
        sj = np.zeros(B, np.int64)
        scores = rng.integers(-50, 50, B)
        for b in range(B):
            m, n = int(rng.integers(0, 40)), int(rng.integers(0, 40))
            pairs.append(
                (
                    Sequence("a", "".join(rng.choice(list("ACGT"), m))),
                    Sequence("b", "".join(rng.choice(list("ACGT"), n))),
                )
            )
            c = int(rng.integers(0, T + 1))
            counts[b] = c
            moves[b, :c] = rng.integers(0, 3, c).astype(np.uint8)
            si[b], sj[b] = m, n
        got = classify_moves_batch(moves, counts, si, sj, scores, pairs)
        for b, (a, s) in enumerate(pairs):
            want = classify_moves(
                moves[b, : int(counts[b])],
                int(si[b]),
                int(sj[b]),
                int(scores[b]),
                a,
                s,
            )
            assert got[b].alignment == want.alignment, (trial, b)
            assert (
                got[b].score,
                got[b].matches,
                got[b].mismatches,
                got[b].opening_gaps,
                got[b].gap_extensions,
            ) == (
                want.score,
                want.matches,
                want.mismatches,
                want.opening_gaps,
                want.gap_extensions,
            ), (trial, b)
