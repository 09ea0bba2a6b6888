"""Streamed-boundary Pallas tile kernel vs the oracles (interpret).

A full table is filled as stacked full-width row blocks: block 0 uses
the global boundary streams, block b uses block b-1's emitted bottom
row. Scores, local argmax, and bottom rows must match the scan tile
oracle and the full-table fill.
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_pallas import gotoh_tile_pallas
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.gotoh_tile import (
    global_boundary_left,
    global_boundary_top,
    tile_fill,
)
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, Sequence

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


def _enc(s, L, pv):
    return Sequence("x", s).encoded(pad_to=L, pad_value=pv)


@pytest.mark.parametrize("is_local", [False, True])
def test_tile_pallas_blocked_fill(is_local):
    rng = np.random.default_rng(41)
    m, n = 150, 101
    a = "".join(rng.choice(list("ACGT"), m))
    b = "".join(rng.choice(list("ACGT"), n))
    R = 64  # rows per block (static)
    Lm = 192  # 3 blocks
    Ln = 128
    s1e = _enc(a, Lm, PAD_S1)
    s2e = _enc(b, Ln, PAD_S2)

    top = np.asarray(global_boundary_top(0, Ln, SCORES))
    best = (-(2**31), 0, 0)
    at_mn = -(2**31)
    for blk in range(Lm // R):
        i0 = blk * R
        left = np.asarray(global_boundary_left(i0, R, SCORES))
        res = gotoh_tile_pallas(
            s1e[i0 : i0 + R],
            s2e,
            top,
            left,
            np.int32(m),
            np.int32(n),
            np.int32(i0),
            np.int32(0),
            SCORES,
            is_local,
            emit_dirs=False,
            emit_bottom=True,
            interpret=True,
        )
        # Cross-check this block against the scan tile oracle.
        oracle = tile_fill(
            s1e[i0 : i0 + R],
            s2e,
            top,
            left,
            SCORES,
            is_local,
            np.int32(i0),
            np.int32(0),
            np.int32(m),
            np.int32(n),
        )
        np.testing.assert_array_equal(
            np.asarray(res.bottom), np.asarray(oracle.bottom), f"blk {blk}"
        )
        assert int(res.score_at_mn) == int(oracle.at_mn), blk
        if is_local:  # best is only tracked in local mode
            assert tuple(int(x) for x in res.best) == tuple(
                int(x) for x in oracle.best
            ), blk

        at_mn = max(at_mn, int(res.score_at_mn))
        cand = tuple(int(x) for x in res.best)
        if (cand[0], cand[1], cand[2]) >= best:
            best = max(best, cand)
        top = np.asarray(res.bottom)

    ref = gotoh_fill_scan(
        s1e, s2e, np.int32(m), np.int32(n), SCORES, is_local
    )
    if is_local:
        assert best[0] == int(ref.score)
        assert best[1] == int(ref.start_i)
        assert best[2] == int(ref.start_j)
    else:
        assert at_mn == int(ref.score)


def test_tile_pallas_dirs_match_full_fill():
    """Per-block dirs agree with the full-table fill's dirs rows."""
    from genomics_rs_tpu.ops.gotoh_pallas import gotoh_fill_pallas

    rng = np.random.default_rng(43)
    m, n = 120, 90
    a = "".join(rng.choice(list("ACGT"), m))
    b = "".join(rng.choice(list("ACGT"), n))
    R, Lm, Ln = 64, 128, 128
    s1e = _enc(a, Lm, PAD_S1)
    s2e = _enc(b, Ln, PAD_S2)

    full = gotoh_fill_pallas(
        s1e, s2e, np.int32(m), np.int32(n), SCORES, False, interpret=True
    )
    fdirs = np.asarray(full.dirs)

    top = np.asarray(global_boundary_top(0, Ln, SCORES))
    for blk in range(2):
        i0 = blk * R
        left = np.asarray(global_boundary_left(i0, R, SCORES))
        res = gotoh_tile_pallas(
            s1e[i0 : i0 + R],
            s2e,
            top,
            left,
            np.int32(m),
            np.int32(n),
            np.int32(i0),
            np.int32(0),
            SCORES,
            False,
            emit_dirs=True,
            emit_bottom=True,
            interpret=True,
        )
        bdirs = np.asarray(res.dirs)  # packed int32 words

        def code_at(li, j):
            k = li + j
            return (bdirs[k // 16, li] >> (2 * (k % 16))) & 3

        # Interior cells of this block: rows i0+1..i0+R, cols 1..n.
        for i in range(i0 + 1, min(i0 + R, m) + 1):
            for j in range(1, n + 1):
                li = i - i0
                assert code_at(li, j) == fdirs[i + j, i], (blk, i, j)
        top = np.asarray(res.bottom)
