"""Batched traceback walker + whole-batch classification parity.

``ops/traceback_batch.walk_batch`` must chase every read's direction
codes with exactly the per-pair host walker's semantics (reference
retrace movement rules, ``algo.rs:339-421``), for both code layouts
(diag-major scan cells and rows16 packed interior words with
synthesized boundary codes); ``classify_batch`` must reproduce
``classify_moves``'s stats/paths/quirks (``algo.rs:351-399``,
SURVEY §2.4-5) vectorized over the batch.
"""

import numpy as np
import pytest

import jax

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.reads import cigar
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.traceback import traceback_host
from genomics_rs_tpu.ops.traceback_batch import classify_batch, walk_batch
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, Sequence, round_up

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


def _random_pairs(rng, B, lo=3, hi=60):
    qs, rs = [], []
    for b in range(B):
        lq = int(rng.integers(lo, hi))
        lr = int(rng.integers(lo, hi))
        q = "".join(rng.choice(list("ACGT"), lq))
        r = "".join(rng.choice(list("ACGT"), lr))
        if b % 2:  # related pairs exercise long SUB runs
            r = (q[: max(1, lq // 2)] + r)[:lr]
        qs.append(Sequence(f"q{b}", q))
        rs.append(Sequence(f"r{b}", r))
    return qs, rs


def _scan_batch(qs, rs, is_local, align=8):
    L1 = round_up(max(len(s) for s in qs), align)
    L2 = round_up(max(len(s) for s in rs), align)
    s1b = np.stack([s.encoded(pad_to=L1, pad_value=PAD_S1) for s in qs])
    s2b = np.stack([s.encoded(pad_to=L2, pad_value=PAD_S2) for s in rs])
    ms = np.array([len(s) for s in qs], np.int32)
    ns = np.array([len(s) for s in rs], np.int32)

    def one(s1e, s2e, m, n):
        res = gotoh_fill_scan(s1e, s2e, m, n, SCORES, is_local)
        return res.dirs, res.score, res.start_i, res.start_j

    dirs, sc, si, sj = jax.vmap(one, (0, 0, 0, 0))(s1b, s2b, ms, ns)
    return L1, L2, dirs, sc, si, sj


def _pack_rows16(dirs_b, L1, L2):
    """Repack diag-major cells into rows16 words on host (test rig)."""
    B = dirs_b.shape[0]
    W = L2 // 16
    ii = np.arange(1, L1 + 1)[:, None]
    jj = np.arange(1, L2 + 1)[None, :]
    rows16 = np.zeros((B, L1, W), np.int64)
    shifts = (2 * np.arange(16))[None, :]
    for b in range(B):
        cell = dirs_b[b][ii + jj, ii].astype(np.int64)  # (L1, L2)
        for w in range(W):
            rows16[b, :, w] = (
                cell[:, w * 16 : (w + 1) * 16] << shifts
            ).sum(1)
    return rows16.astype(np.uint32).view(np.int32).reshape(B, L1, W)


@pytest.mark.parametrize("is_local", [False, True])
def test_walk_batch_diag_and_classify_parity(is_local):
    rng = np.random.default_rng(0)
    qs, rs = _random_pairs(rng, 16)
    L1, L2, dirs, sc, si, sj = _scan_batch(qs, rs, is_local)
    moves, counts, i_f, j_f, done = walk_batch(
        dirs, si, sj, SCORES, is_local, "diag", L1 + L2 + 1
    )
    assert bool(np.all(np.asarray(done)))
    aligned, cigs = classify_batch(
        np.asarray(moves),
        np.asarray(counts),
        np.asarray(si),
        np.asarray(sj),
        np.asarray(sc),
        qs,
        rs,
        with_paths=True,
    )
    for b in range(len(qs)):
        ref = traceback_host(
            np.asarray(dirs[b]),
            int(si[b]),
            int(sj[b]),
            int(sc[b]),
            qs[b],
            rs[b],
            is_local,
        )
        got = aligned[b]
        assert got.alignment == ref.alignment, b
        for f in (
            "score",
            "matches",
            "mismatches",
            "gap_extensions",
            "opening_gaps",
        ):
            assert getattr(got, f) == getattr(ref, f), (b, f)
        assert cigs[b] == cigar(ref), b


@pytest.mark.parametrize("is_local", [False, True])
def test_walk_batch_rows16_matches_diag(is_local):
    # rows16 stores interior cells only; boundary moves (row 0 / col
    # 0, including the local-mode stop when the boundary max clamps
    # to zero) are synthesized — must equal the stored-cell walk.
    rng = np.random.default_rng(1)
    qs, rs = _random_pairs(rng, 16)
    L1, L2, dirs, sc, si, sj = _scan_batch(qs, rs, is_local, align=16)
    rows16 = _pack_rows16(np.asarray(dirs), L1, L2)
    ref = walk_batch(dirs, si, sj, SCORES, is_local, "diag", L1 + L2 + 1)
    got = walk_batch(
        rows16, si, sj, SCORES, is_local, "rows16", L1 + L2 + 1
    )
    for name, a, b in zip(("moves", "counts", "i", "j", "done"), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_classify_batch_no_paths_keeps_stats():
    rng = np.random.default_rng(2)
    qs, rs = _random_pairs(rng, 6)
    L1, L2, dirs, sc, si, sj = _scan_batch(qs, rs, False)
    moves, counts, *_ = walk_batch(
        dirs, si, sj, SCORES, False, "diag", L1 + L2 + 1
    )
    full, cig_full = classify_batch(
        np.asarray(moves), np.asarray(counts), np.asarray(si),
        np.asarray(sj), np.asarray(sc), qs, rs, with_paths=True,
    )
    lean, cig_lean = classify_batch(
        np.asarray(moves), np.asarray(counts), np.asarray(si),
        np.asarray(sj), np.asarray(sc), qs, rs, with_paths=False,
    )
    assert cig_full == cig_lean
    for a, b in zip(full, lean):
        assert b.alignment == []
        assert (a.score, a.matches, a.mismatches, a.gap_extensions,
                a.opening_gaps) == (
            b.score,
            b.matches,
            b.mismatches,
            b.gap_extensions,
            b.opening_gaps,
        )
