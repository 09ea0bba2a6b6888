"""Row-segmented mid-length batch kernel vs the scan oracle.

Interpret mode on CPU; the compiled kernel is gated on real hardware
by ``bench.py --smoke``.
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.gotoh_segmented import gotoh_scores_segmented

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


@pytest.mark.parametrize("is_local", [False, True])
@pytest.mark.parametrize(
    "B,Lm,Ln", [(5, 300, 200), (12, 700, 900), (3, 120, 50)]
)
def test_segmented_matches_oracle(is_local, B, Lm, Ln):
    rng = np.random.default_rng(B * Lm + Ln)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ms = rng.integers(2, Lm + 1, B).astype(np.int32)
    ns = rng.integers(2, Ln + 1, B).astype(np.int32)
    s1b = np.full((B, Lm), 0xFE, np.uint8)
    s2b = np.full((B, Ln), 0xFF, np.uint8)
    for i in range(B):
        s1b[i, : ms[i]] = bases[rng.integers(0, 4, ms[i])]
        s2b[i, : ns[i]] = bases[rng.integers(0, 4, ns[i])]

    sc, si, sj = gotoh_scores_segmented(
        s1b, s2b, ms, ns, SCORES, is_local, interpret=True
    )
    for i in range(B):
        ref = gotoh_fill_scan(s1b[i], s2b[i], ms[i], ns[i], SCORES, is_local)
        assert int(sc[i]) == int(ref.score), i
        assert int(si[i]) == int(ref.start_i), i
        assert int(sj[i]) == int(ref.start_j), i


def test_score_pairs_routes_segmented(monkeypatch):
    """auto routing picks the segmented engine for the mid band on
    TPU backends (simulated via monkeypatched backend probe)."""
    import genomics_rs_tpu.parallel.batch as batch

    picked = {}

    def fake_segmented(
        s1b, s2b, ms, ns, scores, is_local, interpret=False, **kwargs
    ):
        picked["engine"] = "segmented"
        import jax.numpy as jnp

        return jnp.zeros(len(ms)), jnp.zeros(len(ms)), jnp.zeros(len(ms))

    monkeypatch.setattr(
        "genomics_rs_tpu.ops.gotoh_segmented.gotoh_scores_segmented",
        fake_segmented,
    )
    monkeypatch.setattr(
        batch.jax, "default_backend", lambda: "tpu"
    )
    s1b = np.zeros((2, 512), np.uint8)
    s2b = np.zeros((2, 512), np.uint8)
    ms = np.array([500, 400], np.int32)
    ns = np.array([500, 400], np.int32)
    batch.score_pairs(s1b, s2b, ms, ns, SCORES, False, engine="auto")
    assert picked.get("engine") == "segmented"
