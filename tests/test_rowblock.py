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
