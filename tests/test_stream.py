"""Streamed multi-segment batch kernel vs the lax.scan oracle.

The stream kernel concatenates every pair's columns into one
wavefront; these tests pin that the per-lane segment boundaries
reproduce the per-pair scores bit-for-bit, across mixed lengths
within a padded bucket, and that the wrapper falls back to the flat
batch kernel whenever the stream layout doesn't apply.
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.gotoh_stream import (
    _plan_stream,
    gotoh_scores_stream,
)
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, Sequence

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)
ALT_SCORES = Scores(s_match=2, s_mismatch=-3, g=-2, h=-4)


def _batch(rng, B, lo, hi, Lm, Ln):
    ms = rng.integers(lo, hi + 1, B).astype(np.int32)
    ns = rng.integers(lo, hi + 1, B).astype(np.int32)
    s1b = np.stack(
        [
            Sequence("a", "".join(rng.choice(list("ACGT"), m))).encoded(
                pad_to=Lm, pad_value=PAD_S1
            )
            for m in ms
        ]
    )
    s2b = np.stack(
        [
            Sequence("b", "".join(rng.choice(list("ACGT"), n))).encoded(
                pad_to=Ln, pad_value=PAD_S2
            )
            for n in ns
        ]
    )
    return s1b, s2b, ms, ns


def _oracle_scores(s1b, s2b, ms, ns, scores, is_local=False):
    out = []
    for i in range(len(ms)):
        res = gotoh_fill_scan(
            s1b[i],
            s2b[i],
            np.int32(ms[i]),
            np.int32(ns[i]),
            scores,
            is_local,
            emit_dirs=False,
        )
        out.append(int(res.score))
    return out


def _oracle_local(s1b, s2b, ms, ns, scores):
    """(score, start_i, start_j) triples from the scan oracle."""
    out = []
    for i in range(len(ms)):
        res = gotoh_fill_scan(
            s1b[i],
            s2b[i],
            np.int32(ms[i]),
            np.int32(ns[i]),
            scores,
            True,
            emit_dirs=False,
        )
        out.append((int(res.score), int(res.start_i), int(res.start_j)))
    return out


@pytest.mark.parametrize("scores", [SCORES, ALT_SCORES])
def test_stream_matches_scan(scores):
    rng = np.random.default_rng(7)
    B, Lm, Ln = 4, 256, 384
    s1b, s2b, ms, ns = _batch(rng, B, 130, Lm, Lm, Ln)
    want = _oracle_scores(s1b, s2b, ms, ns, scores)
    got, si, sj = gotoh_scores_stream(
        s1b, s2b, ms, ns, scores, interpret=True
    )
    assert [int(x) for x in np.asarray(got)] == want
    assert list(np.asarray(si)) == list(ms)
    assert list(np.asarray(sj)) == list(ns)


def test_stream_mixed_lengths_in_bucket():
    """Lengths spanning the pow2 bucket band (L/2, L]."""
    rng = np.random.default_rng(11)
    B, Lm, Ln = 5, 512, 512
    s1b, s2b, ms, ns = _batch(rng, B, 257, 512, Lm, Ln)
    want = _oracle_scores(s1b, s2b, ms, ns, SCORES)
    got, _, _ = gotoh_scores_stream(
        s1b, s2b, ms, ns, SCORES, interpret=True
    )
    assert [int(x) for x in np.asarray(got)] == want


def test_stream_identical_pairs_and_selfmatch():
    """Self-pairs (score = m) interleaved with distinct pairs."""
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), 200))
    other = "".join(rng.choice(list("ACGT"), 180))
    s1b = np.stack(
        [
            Sequence("a", seq).encoded(pad_to=256, pad_value=PAD_S1),
            Sequence("a", seq).encoded(pad_to=256, pad_value=PAD_S1),
            Sequence("a", other).encoded(pad_to=256, pad_value=PAD_S1),
        ]
    )
    s2b = np.stack(
        [
            Sequence("b", seq).encoded(pad_to=256, pad_value=PAD_S2),
            Sequence("b", other).encoded(pad_to=256, pad_value=PAD_S2),
            Sequence("b", other).encoded(pad_to=256, pad_value=PAD_S2),
        ]
    )
    ms = np.array([200, 200, 180], np.int32)
    ns = np.array([200, 180, 180], np.int32)
    want = _oracle_scores(s1b, s2b, ms, ns, SCORES)
    got, _, _ = gotoh_scores_stream(
        s1b, s2b, ms, ns, SCORES, interpret=True
    )
    assert want[0] == 200  # exact self-match sanity
    assert [int(x) for x in np.asarray(got)] == want


@pytest.mark.parametrize("scores", [SCORES, ALT_SCORES])
def test_stream_local_matches_scan(scores):
    """Local mode: per-segment keep-last argmax (score AND the exact
    reference start cell) vs the scan oracle."""
    rng = np.random.default_rng(19)
    B, Lm, Ln = 5, 256, 384
    s1b, s2b, ms, ns = _batch(rng, B, 130, Lm, Lm, Ln)
    want = _oracle_local(s1b, s2b, ms, ns, scores)
    got, si, sj = gotoh_scores_stream(
        s1b, s2b, ms, ns, scores, is_local=True, interpret=True
    )
    have = list(
        zip(
            (int(x) for x in np.asarray(got)),
            (int(x) for x in np.asarray(si)),
            (int(x) for x in np.asarray(sj)),
        )
    )
    assert have == want


def test_stream_local_no_match_and_selfmatch():
    """Degenerate local cases: a no-match pair (table max 0, argmax
    must be the last all-zero cell like the reference's keep-last
    scan) next to a perfect self-match."""
    seq = "ACGT" * 40
    s1b = np.stack(
        [
            Sequence("a", "A" * 120).encoded(pad_to=256, pad_value=PAD_S1),
            Sequence("a", seq).encoded(pad_to=256, pad_value=PAD_S1),
        ]
    )
    s2b = np.stack(
        [
            Sequence("b", "T" * 100).encoded(pad_to=256, pad_value=PAD_S2),
            Sequence("b", seq).encoded(pad_to=256, pad_value=PAD_S2),
        ]
    )
    ms = np.array([120, 160], np.int32)
    ns = np.array([100, 160], np.int32)
    want = _oracle_local(s1b, s2b, ms, ns, SCORES)
    got, si, sj = gotoh_scores_stream(
        s1b, s2b, ms, ns, SCORES, is_local=True, interpret=True
    )
    have = list(
        zip(
            (int(x) for x in np.asarray(got)),
            (int(x) for x in np.asarray(si)),
            (int(x) for x in np.asarray(sj)),
        )
    )
    assert want[1][0] == 160  # self-match sanity
    assert have == want


def test_stream_fallback_paths():
    """B=1 and probe collisions route to the flat kernel (and still
    produce oracle-exact results)."""
    rng = np.random.default_rng(5)
    s1b, s2b, ms, ns = _batch(rng, 2, 100, 150, 256, 256)

    # Single pair falls back.
    want1 = _oracle_scores(s1b[:1], s2b[:1], ms[:1], ns[:1], SCORES)
    got1, _, _ = gotoh_scores_stream(
        s1b[:1], s2b[:1], ms[:1], ns[:1], SCORES, interpret=True
    )
    assert [int(x) for x in np.asarray(got1)] == want1

    # Probe collision: a short pair after a full-length pair can land
    # its probe in the same chunk (needs Lm + Ln > segment stride);
    # the wrapper must detect this and fall back.
    from genomics_rs_tpu.ops.gotoh_stream import CHUNK

    Lm = Ln = 2048
    _, _, L1, _, _ = _plan_stream(Lm, Ln, 2)
    # Place pair 1's probe step (L1 + m1 + n1) at the start of pair
    # 0's probe chunk ((Lm + Ln) // CHUNK), whatever CHUNK/L1 the
    # kernel is configured with.
    tot1 = (Lm + Ln) // CHUNK * CHUNK - L1
    assert 2 <= tot1 <= Lm + Ln, (
        "test geometry no longer collides; adjust lengths"
    )
    msx = np.array([Lm, tot1 // 2], np.int32)
    nsx = np.array([Ln, tot1 - tot1 // 2], np.int32)
    probe_chunks = (
        msx.astype(np.int64) + nsx + np.arange(2) * L1
    ) // CHUNK
    assert len(np.unique(probe_chunks)) < 2, (
        "test geometry no longer collides; adjust lengths"
    )
    s1t, s2t, _, _ = _batch(rng, 2, 300, 2048, Lm, Ln)
    want2 = _oracle_scores(s1t, s2t, msx, nsx, SCORES)
    got2, _, _ = gotoh_scores_stream(
        s1t, s2t, msx, nsx, SCORES, interpret=True
    )
    assert [int(x) for x in np.asarray(got2)] == want2


def _mutated(rng, base, edits):
    b = list(base)
    for _ in range(edits):
        p = int(rng.integers(0, len(b)))
        op = int(rng.integers(0, 3))
        if op == 0:
            b[p] = rng.choice(list("ACGT"))
        elif op == 1 and len(b) > 2:
            del b[p]
        else:
            b.insert(p, rng.choice(list("ACGT")))
    return "".join(b)


def test_stream_dirs_walk_matches_scan():
    """The streamed dirs fill + per-segment device walk + classify
    pipeline must reproduce the scan engine's alignment exactly —
    score, path, stats — including boundary-heavy walks (long leading
    gaps up column 0 / along row 0) that read the seam-injected
    boundary codes."""
    from genomics_rs_tpu.models.aligner import PairwiseAligner
    from genomics_rs_tpu.ops.gotoh_stream import gotoh_stream_fill_dirs
    from genomics_rs_tpu.ops.traceback import classify_moves
    from genomics_rs_tpu.ops.traceback_device import device_walk

    rng = np.random.default_rng(23)
    base = "".join(rng.choice(list("ACGT"), 200))
    pairs = [
        (base, _mutated(rng, base, 6)),
        # Prefix deletion: the walk climbs column 0's boundary codes.
        (base, base[120:]),
        # Suffix insertion: the walk runs along row 0.
        (base[:60], base),
        (_mutated(rng, base, 20), _mutated(rng, base, 20)),
    ]
    Lm = Ln = 256
    s1b = np.stack(
        [
            Sequence("a", a).encoded(pad_to=Lm, pad_value=PAD_S1)
            for a, _ in pairs
        ]
    )
    s2b = np.stack(
        [
            Sequence("b", b).encoded(pad_to=Ln, pad_value=PAD_S2)
            for _, b in pairs
        ]
    )
    ms = np.array([len(a) for a, _ in pairs], np.int32)
    ns = np.array([len(b) for _, b in pairs], np.int32)
    res = gotoh_stream_fill_dirs(s1b, s2b, ms, ns, SCORES, interpret=True)
    assert res is not None
    scan = PairwiseAligner(SCORES, is_local=False, engine="scan")
    for t, (a, b) in enumerate(pairs):
        s1, s2 = Sequence("s1", a), Sequence("s2", b)
        want = scan.align(s1, s2)
        assert int(np.asarray(res.score)[t]) == want.score
        codes, i_f, j_f, done = device_walk(
            res.segment_dirs(t),
            np.int32(ms[t]),
            np.int32(ns[t]),
            np.int32(0),
            max_steps=1024,
            interpret=True,
        )
        assert bool(done) and (int(i_f), int(j_f)) == (0, 0)
        got = classify_moves(
            np.asarray(codes), int(ms[t]), int(ns[t]), want.score, s1, s2
        )
        assert got.alignment == want.alignment
        assert got.matches == want.matches
        assert got.mismatches == want.mismatches
        assert got.opening_gaps == want.opening_gaps
        assert got.gap_extensions == want.gap_extensions


def test_stream_dirs_inapplicable_returns_none():
    from genomics_rs_tpu.ops.gotoh_stream import gotoh_stream_fill_dirs

    rng = np.random.default_rng(5)
    s1b, s2b, ms, ns = _batch(rng, 2, 100, 150, 256, 256)
    assert (
        gotoh_stream_fill_dirs(s1b[:1], s2b[:1], ms[:1], ns[:1], SCORES)
        is None
    )
