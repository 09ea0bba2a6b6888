"""Inter-sequence short-read kernel vs the scan oracle (interpret)."""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.gotoh_shortread import gotoh_scores_shortread
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


@pytest.mark.parametrize("is_local", [False, True])
def test_shortread_matches_scan(is_local):
    rng = np.random.default_rng(61)
    B, L1, L2 = 9, 48, 40
    ms = rng.integers(1, L1 + 1, B).astype(np.int32)
    ns = rng.integers(1, L2 + 1, B).astype(np.int32)
    s1b = np.full((B, L1), PAD_S1, dtype=np.uint8)
    s2b = np.full((B, L2), PAD_S2, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(B):
        s1b[i, : ms[i]] = bases[rng.integers(0, 4, ms[i])]
        s2b[i, : ns[i]] = bases[rng.integers(0, 4, ns[i])]

    sc, si, sj = gotoh_scores_shortread(
        s1b, s2b, ms, ns, SCORES, is_local, interpret=True
    )
    for i in range(B):
        ref = gotoh_fill_scan(
            s1b[i], s2b[i], ms[i], ns[i], SCORES, is_local
        )
        assert int(sc[i]) == int(ref.score), i
        assert int(si[i]) == int(ref.start_i), i
        assert int(sj[i]) == int(ref.start_j), i


def test_score_pairs_routing():
    """score_pairs auto-routes and all engines agree (CPU: scan)."""
    from genomics_rs_tpu.parallel.batch import score_pairs

    rng = np.random.default_rng(73)
    B, L = 5, 32
    ms = rng.integers(5, L + 1, B).astype(np.int32)
    ns = rng.integers(5, L + 1, B).astype(np.int32)
    s1b = np.full((B, L), PAD_S1, dtype=np.uint8)
    s2b = np.full((B, L), PAD_S2, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(B):
        s1b[i, : ms[i]] = bases[rng.integers(0, 4, ms[i])]
        s2b[i, : ns[i]] = bases[rng.integers(0, 4, ns[i])]

    sc_auto = score_pairs(s1b, s2b, ms, ns, SCORES, False, engine="auto")
    sc_scan = score_pairs(s1b, s2b, ms, ns, SCORES, False, engine="scan")
    np.testing.assert_array_equal(
        np.asarray(sc_auto[0]), np.asarray(sc_scan[0])
    )
