"""Lean forward row-block kernel vs the general tile kernel.

The rowblock kernel is the score-only+bottom specialization used by
``score_long``'s rolling forward pass; these tests pin bit-identical
bottoms, (m, n) probes and local argmax against the tile kernel over
multi-block sweeps, and through ``score_long`` against the scan
oracle — including the garbage-lane window (non-final block with
``m - i0 < V``) that needs the ``iv <= R`` guard.
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_pallas import gotoh_tile_pallas
from genomics_rs_tpu.ops.gotoh_rowblock import gotoh_rowblock_pallas
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.gotoh_tile import (
    global_boundary_left,
    global_boundary_top,
)
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)
ALT_SCORES = Scores(s_match=2, s_mismatch=-3, g=-2, h=-4)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _sweep(R, m, n, Ln, scores, is_local, rng):
    """Run both kernels block-by-block; assert bottoms + results."""
    s1 = BASES[rng.integers(0, 4, m)]
    s2 = BASES[rng.integers(0, 4, n)]
    NB = -(-m // R)
    s1e = np.full(NB * R, PAD_S1, np.uint8)
    s1e[:m] = s1
    s2e = np.full(Ln, PAD_S2, np.uint8)
    s2e[:n] = s2

    top_t = top_r = global_boundary_top(0, Ln, scores)
    outs_t, outs_r = [], []
    for b in range(NB):
        i0 = b * R
        blk = s1e[i0 : i0 + R]
        rt = gotoh_tile_pallas(
            blk, s2e, top_t,
            global_boundary_left(i0, R, scores),
            np.int32(m), np.int32(n), np.int32(i0), np.int32(0),
            scores, is_local,
            emit_dirs=False, emit_bottom=True, interpret=True,
        )
        rr = gotoh_rowblock_pallas(
            blk, s2e, top_r, np.int32(m), np.int32(n), np.int32(i0),
            scores, is_local, interpret=True,
        )
        assert np.array_equal(
            np.asarray(rt.bottom), np.asarray(rr.bottom)
        ), (R, b, is_local)
        outs_t.append(
            (int(rt.score_at_mn), tuple(int(x) for x in rt.best))
        )
        outs_r.append(
            (int(rr.score_at_mn), tuple(int(x) for x in rr.best))
        )
        top_t, top_r = rt.bottom, rr.bottom
    if is_local:
        assert [b for _, b in outs_t] == [b for _, b in outs_r]
    assert [s for s, _ in outs_t] == [s for s, _ in outs_r]
    return outs_r


@pytest.mark.parametrize("scores", [SCORES, ALT_SCORES])
@pytest.mark.parametrize("is_local", [False, True])
def test_rowblock_matches_tile(scores, is_local):
    rng = np.random.default_rng(3)
    _sweep(1023, 2000, 1500, 1536, scores, is_local, rng)


@pytest.mark.parametrize("is_local", [False, True])
def test_rowblock_garbage_lane_window(is_local):
    """Non-final blocks with R < m - i0 < V: lanes beyond row R must
    not alias the probe lane or enter the local argmax."""
    rng = np.random.default_rng(9)
    # R=100 -> V=1024; block 0 has m - i0 = 500 in (R, V).
    _sweep(100, 500, 300, 384, SCORES, is_local, rng)


@pytest.mark.parametrize("is_local", [False, True])
def test_score_long_lean_matches_oracle(is_local):
    from genomics_rs_tpu.models.longalign import score_long
    from genomics_rs_tpu.sequence import Sequence

    rng = np.random.default_rng(17)
    m, n = 700, 600
    s1 = Sequence("a", "".join(rng.choice(list("ACGT"), m)))
    s2 = Sequence("b", "".join(rng.choice(list("ACGT"), n)))
    got = score_long(
        s1, s2, SCORES, is_local=is_local, block_rows=255, interpret=True
    )
    res = gotoh_fill_scan(
        s1.encoded(pad_to=704, pad_value=PAD_S1),
        s2.encoded(pad_to=640, pad_value=PAD_S2),
        np.int32(m), np.int32(n), SCORES, is_local, emit_dirs=False,
    )
    want = (int(res.score), int(res.start_i), int(res.start_j))
    assert tuple(int(x) for x in got) == want


# ---- round-4 windowed-traceback machinery ----


def test_emit_cols_checkpoints_match_tile_right():
    """Column checkpoints at stride V must equal the tile kernel's
    emitted right column of a tile truncated at that column."""
    rng = np.random.default_rng(11)
    R, m, n, Ln = 1023, 2000, 2300, 2304
    scores = SCORES
    s1 = BASES[rng.integers(0, 4, m)]
    s2 = BASES[rng.integers(0, 4, n)]
    NB = -(-m // R)
    s1e = np.full(NB * R, PAD_S1, np.uint8)
    s1e[:m] = s1
    s2e = np.full(Ln, PAD_S2, np.uint8)
    s2e[:n] = s2
    V = 1024  # round_up(R+1, 1024)

    top = global_boundary_top(0, Ln, scores)
    for b in range(NB):
        i0 = b * R
        blk = s1e[i0 : i0 + R]
        rr = gotoh_rowblock_pallas(
            blk, s2e, top, np.int32(m), np.int32(n), np.int32(i0),
            scores, False, emit_cols=True, interpret=True,
        )
        cols = np.asarray(rr.cols)  # (NC, 3, V)
        for c in range(cols.shape[0]):
            j = c * V
            if j == 0 or j > n:
                continue
            rt = gotoh_tile_pallas(
                blk, s2e[:j], top[:, : j + 1],
                global_boundary_left(i0, R, scores),
                np.int32(m), np.int32(n), np.int32(i0), np.int32(0),
                scores, False,
                emit_dirs=False, emit_bottom=False, emit_right=True,
                interpret=True,
            )
            right = np.asarray(rt.right)  # (3, R) rows 1..R
            # Lane 0 of a capture pane is junk (block top row comes
            # from the row checkpoints); compare rows 1..R.
            assert np.array_equal(cols[c, :, 1 : R + 1], right), (b, c)
        top = rr.bottom


def test_windowed_fill_dirs_match_full():
    """A left-windowed refill (left boundary = a captured column)
    reproduces the full refill's direction codes at every in-window
    cell, for both modes."""
    from genomics_rs_tpu.ops.gotoh_pallas import unpack_dirs

    rng = np.random.default_rng(12)
    R, m, n, Ln = 1023, 1023, 2300, 2304
    V = 1024
    for is_local in (False, True):
        scores = SCORES
        s1 = BASES[rng.integers(0, 4, m)]
        s2e = np.full(Ln, PAD_S2, np.uint8)
        s2e[:n] = BASES[rng.integers(0, 4, n)]
        top = np.asarray(global_boundary_top(0, Ln, scores))

        full = gotoh_rowblock_pallas(
            s1, s2e, top, np.int32(m), np.int32(n), np.int32(0),
            scores, is_local,
            emit_dirs=True, emit_bottom=False, emit_cols=True,
            interpret=True,
        )
        Kp_full = np.asarray(full.dirs).shape[0] * 16
        codes_full = np.asarray(unpack_dirs(full.dirs, Kp_full))

        jc = V  # window starts at the first interior checkpoint
        left = np.asarray(full.cols)[1, :, 1 : R + 1]  # (3, R)
        Bw = n - jc
        win = gotoh_rowblock_pallas(
            s1, s2e[jc : jc + Bw], top[:, jc : jc + Bw + 1],
            np.int32(m), np.int32(Bw), np.int32(0),
            scores, is_local,
            emit_dirs=True, emit_bottom=False, left=left,
            interpret=True,
        )
        Kp_win = np.asarray(win.dirs).shape[0] * 16
        codes_win = np.asarray(unpack_dirs(win.dirs, Kp_win))

        # Compare every true cell strictly inside the window
        # (rows 0..m, cols jc+1..n; the window's col-0 codes are
        # boundary-synthesized and never walked).
        for li in range(0, m + 1):
            for j in range(jc + 1, n + 1):
                cf = codes_full[li + j, li]
                cw = codes_win[li + (j - jc), li]
                assert cf == cw, (is_local, li, j, cf, cw)
