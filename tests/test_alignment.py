"""Global-alignment parity tests.

Assertion values are the hardware-independent ground truth from the
reference integration tests (``/root/reference/tests/test_alignment.rs``),
using its fixed scores {s_match=1, s_mismatch=-2, g=-2, h=-5} (note:
g differs from config.toml's -1).
"""

import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.aligner import PairwiseAligner
from genomics_rs_tpu.ops.traceback import AlignmentChoice as C
from genomics_rs_tpu.sequence import Sequence

TEST_SCORES = Scores(s_match=1, s_mismatch=-2, g=-2, h=-5)


def _align(a: str, b: str, is_local=False):
    aligner = PairwiseAligner(TEST_SCORES, is_local=is_local, engine="scan")
    return aligner.align(Sequence("s1", a), Sequence("s2", b))


def test_simple_matches():
    # test_alignment.rs:24-53
    r = _align("ACGT", "ACGT")
    assert r.score == 4
    assert r.matches == 4
    assert r.mismatches == 0
    assert r.opening_gaps == 0
    assert r.gap_extensions == 0
    assert r.alignment == [
        (C.MATCH, 4, 4),
        (C.MATCH, 3, 3),
        (C.MATCH, 2, 2),
        (C.MATCH, 1, 1),
    ]


def test_gaps():
    # test_alignment.rs:56-90
    r = _align("ACGT", "AGCGT")
    assert r.matches == 3
    assert r.mismatches == 1
    assert r.opening_gaps == 1
    assert r.gap_extensions == 0
    assert r.alignment == [
        (C.MATCH, 4, 5),
        (C.MATCH, 3, 4),
        (C.MATCH, 2, 3),
        (C.OPEN_INSERT, 1, 2),
        (C.MISMATCH, 1, 1),
    ]


def test_affine_gap():
    # test_alignment.rs:93-139
    r = _align("ACGGATAAAAAAAATC", "ACGGATAAAATC")
    assert r.matches == 12
    assert r.mismatches == 0
    assert r.opening_gaps == 1
    assert r.gap_extensions == 3
    assert r.alignment == [
        (C.MATCH, 16, 12),
        (C.MATCH, 15, 11),
        (C.MATCH, 14, 10),
        (C.MATCH, 13, 9),
        (C.MATCH, 12, 8),
        (C.MATCH, 11, 7),
        (C.OPEN_DELETE, 10, 6),
        (C.DELETE, 9, 6),
        (C.DELETE, 8, 6),
        (C.DELETE, 7, 6),
        (C.MATCH, 6, 6),
        (C.MATCH, 5, 5),
        (C.MATCH, 4, 4),
        (C.MATCH, 3, 3),
        (C.MATCH, 2, 2),
        (C.MATCH, 1, 1),
    ]


def test_local_simple():
    """Local alignment sanity: perfect substring should score its length.

    The reference never tests local mode; this encodes our reading of
    its semantics (zero-floor inside every predecessor max, last
    row-major argmax as the start cell).
    """
    r = _align("TTTACGTTTT", "ACGT", is_local=True)
    # The best local alignment is ACGT vs ACGT: score 4. Match counting
    # follows the reference's shifted is_match(i, j) classification
    # (SURVEY §2.4-5), so the final diagonal step reads past the end of
    # s2 and is classified a mismatch: 3 matches + 1 mismatch.
    assert r.score == 4
    assert r.matches + r.mismatches == 4
    assert [c for c, _, _ in r.alignment].count(C.MATCH) == r.matches


def test_global_vs_numpy_reference():
    """Cross-check the scan fill against a direct numpy DP on random strings."""
    import numpy as np

    rng = np.random.default_rng(0)
    for trial in range(4):
        m = int(rng.integers(1, 40))
        n = int(rng.integers(1, 40))
        a = "".join(rng.choice(list("ACGT"), m))
        b = "".join(rng.choice(list("ACGT"), n))
        got = _align(a, b)
        want = _numpy_gotoh_score(a, b, TEST_SCORES)
        assert got.score == want, (a, b)


def _numpy_gotoh_score(a: str, b: str, sc: Scores) -> int:
    """Straightforward row-major Gotoh fill (mirrors algo.rs:191-268)."""
    import numpy as np

    NEG = -(10**15)
    m, n = len(a), len(b)
    I = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    D = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    S = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    I[0, 0] = D[0, 0] = S[0, 0] = 0
    for i in range(1, m + 1):
        D[i, 0] = sc.h + i * sc.g
    for j in range(1, n + 1):
        I[0, j] = sc.h + j * sc.g
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            I[i, j] = max(
                I[i, j - 1] + sc.g,
                S[i, j - 1] + sc.h + sc.g,
                D[i, j - 1] + sc.h + sc.g,
            )
            D[i, j] = max(
                I[i - 1, j] + sc.h + sc.g,
                S[i - 1, j] + sc.h + sc.g,
                D[i - 1, j] + sc.g,
            )
            sub = sc.s_match if a[i - 1] == b[j - 1] else sc.s_mismatch
            S[i, j] = sub + max(I[i - 1, j - 1], S[i - 1, j - 1], D[i - 1, j - 1])
    return int(max(I[m, n], S[m, n], D[m, n]))
