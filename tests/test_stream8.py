"""Row-stacked (8-stream) batch kernel vs the lax.scan oracle.

``gotoh_stream8`` runs eight independent multi-segment wavefronts, one
per sublane row, to amortize the per-diagonal latency floor across the
batch. These tests pin bit-exact per-pair scores (and local-mode start
cells with the reference keep-last tie-break, algo.rs:311-322) against
the scan oracle across mixed lengths, batch paddings, and both scoring
grids, plus the wrapper's fallback routes.
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.gotoh_stream8 import (
    _plan_stream8,
    gotoh_scores_stream8,
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


def _oracle(s1b, s2b, ms, ns, scores, is_local):
    out = []
    for i in range(len(ms)):
        r = gotoh_fill_scan(
            s1b[i],
            s2b[i],
            np.int32(ms[i]),
            np.int32(ns[i]),
            scores,
            is_local,
            emit_dirs=False,
        )
        out.append((int(r.score), int(r.start_i), int(r.start_j)))
    return out


def _check(s1b, s2b, ms, ns, scores, is_local):
    got = gotoh_scores_stream8(
        s1b, s2b, ms, ns, scores, is_local=is_local, interpret=True
    )
    want = _oracle(s1b, s2b, ms, ns, scores, is_local)
    have = list(
        zip(
            (int(x) for x in np.asarray(got[0])),
            (int(x) for x in np.asarray(got[1])),
            (int(x) for x in np.asarray(got[2])),
        )
    )
    if is_local:
        assert have == want
    else:
        assert [h[0] for h in have] == [w[0] for w in want]


@pytest.mark.parametrize("scores", [SCORES, ALT_SCORES])
@pytest.mark.parametrize("is_local", [False, True])
def test_stream8_multicycle(scores, is_local):
    """More than one 8-row cycle (B=20 -> Q=3), mixed tiny-to-full
    lengths so segment seams land mid-chunk on every row."""
    rng = np.random.default_rng(7)
    s1b, s2b, ms, ns = _batch(rng, 20, 3, 120, 120, 120)
    assert _plan_stream8(120, 120, 20)[2] == 3
    _check(s1b, s2b, ms, ns, scores, is_local)


@pytest.mark.parametrize("is_local", [False, True])
def test_stream8_exact_cycle_and_ragged(is_local):
    """B=8 (no batch padding) and B=9 (7 dummy segments)."""
    rng = np.random.default_rng(11)
    for B in (8, 9):
        s1b, s2b, ms, ns = _batch(rng, B, 10, 100, 100, 100)
        _check(s1b, s2b, ms, ns, SCORES, is_local)


@pytest.mark.parametrize("is_local", [False, True])
def test_stream8_asymmetric_pads(is_local):
    """Lm much smaller than Ln: C stays one lane tile while segments
    span several chunks."""
    rng = np.random.default_rng(13)
    s1b, s2b, ms, ns = _batch(rng, 10, 5, 60, 64, 700)
    _check(s1b, s2b, ms, ns, SCORES, is_local)


def test_stream8_local_no_match_and_selfmatch():
    """Degenerate local rows: an all-mismatch pair (max 0, keep-last
    all-zero cell) stacked with a perfect self-match."""
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
    want = _oracle(s1b, s2b, ms, ns, SCORES, True)
    assert want[1][0] == 160  # self-match sanity
    _check(s1b, s2b, ms, ns, SCORES, True)


@pytest.mark.parametrize("is_local", [False, True])
def test_stream8_window_overlap(is_local):
    """Pairs with m + n > L1: the tail anti-diagonals are computed
    after the next window's col-0 sweep has started (wrapped kmod).
    Regression for two bugs: local candidates in the wrap region were
    masked (jj went negative), and padding dummies' probes could share
    a (row, chunk) with a real pair's and win the chunk-end reduce."""
    from genomics_rs_tpu.ops.gotoh_stream8 import _plan_stream8

    rng = np.random.default_rng(42)
    B, Lm, Ln = 9, 1100, 1100
    _, L1, _, _, _ = _plan_stream8(Lm, Ln, B)
    s1b, s2b, ms, ns = _batch(rng, B, 990, Lm, Lm, Ln)
    assert int(np.max(ms + ns)) > L1  # overlap actually exercised
    _check(s1b, s2b, ms, ns, SCORES, is_local)


def test_score_pairs_routes_stream8(monkeypatch):
    """auto routing picks stream8 for the global-mode upper mid band
    (L > STREAM8_MIN_LEN, <= SEGMENTED_MAX_LEN) and keeps segmented
    for local mode at the same lengths."""
    import genomics_rs_tpu.parallel.batch as batch

    picked = {}

    def fake(name):
        def f(
            s1b, s2b, ms, ns, scores, is_local, interpret=False, **kw
        ):
            import jax.numpy as jnp

            picked["engine"] = name
            return (
                jnp.zeros(len(ms)),
                jnp.zeros(len(ms)),
                jnp.zeros(len(ms)),
            )

        return f

    monkeypatch.setattr(
        "genomics_rs_tpu.ops.gotoh_stream8.gotoh_scores_stream8",
        fake("stream8"),
    )
    monkeypatch.setattr(
        "genomics_rs_tpu.ops.gotoh_segmented.gotoh_scores_segmented",
        fake("segmented"),
    )
    monkeypatch.setattr(batch.jax, "default_backend", lambda: "tpu")
    s1b = np.zeros((2, 2048), np.uint8)
    s2b = np.zeros((2, 2048), np.uint8)
    ms = np.array([2000, 1800], np.int32)
    ns = np.array([2000, 1800], np.int32)
    batch.score_pairs(s1b, s2b, ms, ns, SCORES, False, engine="auto")
    assert picked.get("engine") == "stream8"
    batch.score_pairs(s1b, s2b, ms, ns, SCORES, True, engine="auto")
    assert picked.get("engine") == "segmented"


def test_stream8_fallback_single_pair():
    """B=1 routes to the segmented kernel and stays oracle-exact."""
    rng = np.random.default_rng(5)
    s1b, s2b, ms, ns = _batch(rng, 1, 100, 150, 256, 256)
    _check(s1b, s2b, ms, ns, SCORES, False)
    _check(s1b, s2b, ms, ns, SCORES, True)
