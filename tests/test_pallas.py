"""Pallas wavefront kernel vs the lax.scan oracle (interpret mode).

The kernel must agree with the scan engine bit-for-bit: same scores,
same retrace start cell (including the reference's last-row-major
argmax tie-break) and — via the shared 2-bit code contract — the same
traceback path and stats.
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_pallas import gotoh_fill_pallas
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.traceback import traceback_host
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, Sequence

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)
TEST_SCORES = Scores(s_match=1, s_mismatch=-2, g=-2, h=-5)


def _encode(s: str, pad_to: int, pad_value: int) -> np.ndarray:
    return Sequence("x", s).encoded(pad_to=pad_to, pad_value=pad_value)


def _run_both(a: str, b: str, scores: Scores, is_local: bool):
    m, n = len(a), len(b)
    Lm = max(-(-m // 128) * 128, 128)
    Ln = max(-(-n // 128) * 128, 128)
    s1e = _encode(a, Lm, PAD_S1)
    s2e = _encode(b, Ln, PAD_S2)
    ref = gotoh_fill_scan(
        s1e, s2e, np.int32(m), np.int32(n), scores, is_local
    )
    got = gotoh_fill_pallas(
        s1e,
        s2e,
        np.int32(m),
        np.int32(n),
        scores,
        is_local,
        interpret=True,
    )
    return ref, got, (m, n)


def _traceback(res, a, b, is_local):
    return traceback_host(
        np.asarray(res.dirs),
        int(res.start_i),
        int(res.start_j),
        int(res.score),
        Sequence("s1", a),
        Sequence("s2", b),
        is_local,
    )


@pytest.mark.parametrize("is_local", [False, True])
def test_pallas_matches_scan_random(is_local):
    rng = np.random.default_rng(3)
    for trial in range(6):
        m = int(rng.integers(1, 200))
        n = int(rng.integers(1, 200))
        a = "".join(rng.choice(list("ACGT"), m))
        b = "".join(rng.choice(list("ACGT"), n))
        ref, got, _ = _run_both(a, b, SCORES, is_local)
        assert int(got.score) == int(ref.score), (trial, a, b)
        assert int(got.start_i) == int(ref.start_i), (trial, a, b)
        assert int(got.start_j) == int(ref.start_j), (trial, a, b)
        r1 = _traceback(ref, a, b, is_local)
        r2 = _traceback(got, a, b, is_local)
        assert r1.alignment == r2.alignment, (trial, a, b)
        assert (
            r1.matches,
            r1.mismatches,
            r1.opening_gaps,
            r1.gap_extensions,
        ) == (
            r2.matches,
            r2.mismatches,
            r2.opening_gaps,
            r2.gap_extensions,
        )


@pytest.mark.parametrize("is_local", [False, True])
def test_pallas_score_only(is_local):
    rng = np.random.default_rng(5)
    m, n = 150, 90
    a = "".join(rng.choice(list("ACGT"), m))
    b = "".join(rng.choice(list("ACGT"), n))
    Lm, Ln = 256, 128
    s1e = _encode(a, Lm, PAD_S1)
    s2e = _encode(b, Ln, PAD_S2)
    ref = gotoh_fill_scan(
        s1e, s2e, np.int32(m), np.int32(n), SCORES, is_local
    )
    got = gotoh_fill_pallas(
        s1e,
        s2e,
        np.int32(m),
        np.int32(n),
        SCORES,
        is_local,
        emit_dirs=False,
        interpret=True,
    )
    assert int(got.score) == int(ref.score)
    assert int(got.start_i) == int(ref.start_i)
    assert int(got.start_j) == int(ref.start_j)


def test_pallas_reference_goldens():
    """The three reference alignment cases through the pallas engine."""
    cases = [
        ("ACGT", "ACGT", 4),
        ("ACGT", "AGCGT", None),
        ("ACGGATAAAAAAAATC", "ACGGATAAAATC", None),
    ]
    for a, b, want_score in cases:
        ref, got, _ = _run_both(a, b, TEST_SCORES, False)
        assert int(got.score) == int(ref.score)
        if want_score is not None:
            assert int(got.score) == want_score
        r1 = _traceback(ref, a, b, False)
        r2 = _traceback(got, a, b, False)
        assert r1.alignment == r2.alignment


@pytest.mark.parametrize("is_local", [False, True])
def test_pallas_batch_scores(is_local):
    """Batched single-dispatch kernel vs the scan oracle."""
    from genomics_rs_tpu.ops.gotoh_pallas import gotoh_scores_pallas_batch

    rng = np.random.default_rng(13)
    B, Lm, Ln = 5, 256, 128
    ms = rng.integers(10, Lm + 1, B).astype(np.int32)
    ns = rng.integers(10, Ln + 1, B).astype(np.int32)
    s1b = np.full((B, Lm), PAD_S1, dtype=np.uint8)
    s2b = np.full((B, Ln), PAD_S2, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(B):
        s1b[i, : ms[i]] = bases[rng.integers(0, 4, ms[i])]
        s2b[i, : ns[i]] = bases[rng.integers(0, 4, ns[i])]

    sc, si, sj = gotoh_scores_pallas_batch(
        s1b, s2b, ms, ns, SCORES, is_local, interpret=True
    )
    for i in range(B):
        ref = gotoh_fill_scan(
            s1b[i], s2b[i], ms[i], ns[i], SCORES, is_local
        )
        assert int(sc[i]) == int(ref.score), i
        assert int(si[i]) == int(ref.start_i), i
        assert int(sj[i]) == int(ref.start_j), i


@pytest.mark.parametrize("is_local", [False, True])
def test_blocked_batch_scores(is_local):
    """Row-block pipelined batch kernel vs the scan oracle."""
    from genomics_rs_tpu.ops.gotoh_pallas import gotoh_scores_blocked

    rng = np.random.default_rng(77)
    B, Lm, Ln = 4, 300, 200
    ms = rng.integers(10, Lm + 1, B).astype(np.int32)
    ns = rng.integers(10, Ln + 1, B).astype(np.int32)
    s1b = np.full((B, Lm), PAD_S1, dtype=np.uint8)
    s2b = np.full((B, Ln), PAD_S2, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(B):
        s1b[i, : ms[i]] = bases[rng.integers(0, 4, ms[i])]
        s2b[i, : ns[i]] = bases[rng.integers(0, 4, ns[i])]

    sc, si, sj = gotoh_scores_blocked(
        s1b, s2b, ms, ns, SCORES, is_local, R=64, interpret=True
    )
    for i in range(B):
        ref = gotoh_fill_scan(
            s1b[i], s2b[i], ms[i], ns[i], SCORES, is_local
        )
        assert int(sc[i]) == int(ref.score), i
        # Local mode must produce the true reference start cell (last
        # row-major argmax), not placeholders — VERDICT r1 item 4.
        assert int(si[i]) == int(ref.start_i), i
        assert int(sj[i]) == int(ref.start_j), i
