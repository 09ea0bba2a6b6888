"""End-to-end parity of the pallas aligner path vs the scan oracle.

The pallas engine fills with PACKED direction words and retraces with
the on-device walker (``ops/traceback_device.walk_block``) — no
per-cell table is ever materialised. These tests pin that whole
pipeline (fill -> packed words -> device walk -> classification)
against the scan engine's host traceback, which itself is pinned to
the reference integration tests (``tests/test_alignment.py``).
"""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.aligner import PairwiseAligner
from genomics_rs_tpu.sequence import Sequence

SCORES = Scores(s_match=1, s_mismatch=-2, g=-2, h=-5)


def _random_pair(rng, lo=40, hi=200):
    m = int(rng.integers(lo, hi))
    a = rng.choice(list("ACGT"), m)
    # Mutate a copy so the pair has indel/substitution structure.
    b = list(a)
    for _ in range(int(rng.integers(1, 8))):
        p = int(rng.integers(0, len(b)))
        op = int(rng.integers(0, 3))
        if op == 0:
            b[p] = rng.choice(list("ACGT"))
        elif op == 1 and len(b) > 2:
            del b[p]
        else:
            b.insert(p, rng.choice(list("ACGT")))
    return "".join(a), "".join(b)


def _assert_same(got, want):
    assert got.score == want.score
    assert got.alignment == want.alignment
    assert got.matches == want.matches
    assert got.mismatches == want.mismatches
    assert got.opening_gaps == want.opening_gaps
    assert got.gap_extensions == want.gap_extensions


@pytest.mark.parametrize("is_local", [False, True])
def test_pallas_packed_align_matches_scan(is_local):
    rng = np.random.default_rng(7)
    scan = PairwiseAligner(SCORES, is_local=is_local, engine="scan")
    pallas = PairwiseAligner(
        SCORES, is_local=is_local, engine="pallas", interpret=True
    )
    for trial in range(3):
        a, b = _random_pair(rng)
        s1, s2 = Sequence("s1", a), Sequence("s2", b)
        _assert_same(pallas.align(s1, s2), scan.align(s1, s2))


def test_pallas_packed_align_reference_case():
    """The reference affine-gap integration case through the packed path."""
    scan = PairwiseAligner(SCORES, engine="scan")
    pallas = PairwiseAligner(SCORES, engine="pallas", interpret=True)
    s1 = Sequence("s1", "ACGGATAAAAAAAATC")
    s2 = Sequence("s2", "ACGGATAAAATC")
    _assert_same(pallas.align(s1, s2), scan.align(s1, s2))


def test_align_batch_matches_per_pair():
    """align_batch (streamed dirs fill + per-segment walks) must be
    bit-identical to per-pair aligns, across mixed lengths and
    boundary-heavy pairs."""
    from genomics_rs_tpu.models.aligner import align_batch

    rng = np.random.default_rng(31)
    base = "".join(rng.choice(list("ACGT"), 180))
    pairs_s = [
        (base, base),
        (base, base[100:]),
        (base[:50], base),
    ]
    for _ in range(3):
        a, b = _random_pair(rng, 60, 190)
        pairs_s.append((a, b))
    pairs = [
        (Sequence("a", a), Sequence("b", b)) for a, b in pairs_s
    ]
    got = align_batch(
        pairs, SCORES, is_local=False, engine="pallas", interpret=True
    )
    scan = PairwiseAligner(SCORES, is_local=False, engine="scan")
    for (s1, s2), g in zip(pairs, got):
        _assert_same(g, scan.align(s1, s2))


def test_align_batch_local_matches_per_pair():
    """Local batches stream too: per-segment argmax start cells +
    dirs walks must reproduce the scan engine exactly (incl. a
    no-match pair whose walk STOPs immediately at a 0-max cell)."""
    from genomics_rs_tpu.models.aligner import align_batch

    rng = np.random.default_rng(41)
    base = "".join(rng.choice(list("ACGT"), 160))
    pairs_s = [(base, base[40:120])]
    for _ in range(3):
        pairs_s.append(_random_pair(rng, 60, 190))
    pairs_s.append(("A" * 80, "T" * 90))  # local no-match: score 0
    pairs = [
        (Sequence("a", a), Sequence("b", b)) for a, b in pairs_s
    ]
    got = align_batch(
        pairs, SCORES, is_local=True, engine="pallas", interpret=True
    )
    scan = PairwiseAligner(SCORES, is_local=True, engine="scan")
    for (s1, s2), g in zip(pairs, got):
        _assert_same(g, scan.align(s1, s2))


def test_align_batch_single_falls_back():
    from genomics_rs_tpu.models.aligner import align_batch

    rng = np.random.default_rng(37)
    a, b = _random_pair(rng, 60, 120)
    pairs = [(Sequence("a", a), Sequence("b", b))]
    for loc in (False, True):
        got = align_batch(
            pairs, SCORES, is_local=loc, engine="pallas", interpret=True
        )
        scan = PairwiseAligner(SCORES, is_local=loc, engine="scan")
        _assert_same(got[0], scan.align(*pairs[0]))


def test_align_batch_oversized_pairs_route_per_pair(monkeypatch):
    """A pair whose dirs bitmap alone busts the group budget must NOT
    reach the stream (whose wrapper has no size gate) — it routes to
    the per-pair aligner, which has the checkpointed fallback."""
    from genomics_rs_tpu.models import aligner as al

    calls = {"n": 0}

    def fake_align(self, a, b):
        calls["n"] += 1
        return "sentinel"

    monkeypatch.setattr(al.PairwiseAligner, "align", fake_align)

    def boom(*a, **k):
        raise AssertionError("stream path must not be reached")

    monkeypatch.setattr(al, "stream_walk_group", boom)
    big = Sequence("x", "A" * 100_000)
    out = al.align_batch(
        [(big, big), (big, big)], SCORES, engine="pallas"
    )
    assert out == ["sentinel", "sentinel"] and calls["n"] == 2


@pytest.mark.parametrize("is_local", [False, True])
def test_align_batch_long_pairs_one_dispatch_walk(is_local):
    """Pairs long enough for the one-dispatch walk_many path (segment
    word count >= the DMA window) must stay bit-identical to scan."""
    from genomics_rs_tpu.models.aligner import align_batch

    rng = np.random.default_rng(53)
    base = "".join(rng.choice(list("ACGT"), 380))
    pairs_s = [
        (base, _mutated_long(rng, base, 10)),
        (base, base[120:]),
        (_mutated_long(rng, base, 25), _mutated_long(rng, base, 25)),
    ]
    pairs = [
        (Sequence("a", a), Sequence("b", b)) for a, b in pairs_s
    ]
    got = align_batch(
        pairs, SCORES, is_local=is_local, engine="pallas",
        interpret=True,
    )
    scan = PairwiseAligner(SCORES, is_local=is_local, engine="scan")
    for (s1, s2), g in zip(pairs, got):
        _assert_same(g, scan.align(s1, s2))


def _mutated_long(rng, base, edits):
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


def test_stream_group_sizing_bounds_footprint():
    """Group sizing must count the stream's ACTUAL allocations: the
    L1-floored packed words and walk_many's rounded move buffers —
    short-pair buckets OOMed under the old cell-count estimate."""
    from genomics_rs_tpu.models.aligner import _stream_group_pairs
    from genomics_rs_tpu.ops.gotoh_stream import _plan_stream

    for Lm, Ln in ((512, 512), (2048, 2048), (30208, 30208)):
        ms = ((Lm + Ln + 1) + 8191) // 8192 * 8192
        g = _stream_group_pairs(Lm, Ln, ms)
        V, _, L1, _, _ = _plan_stream(Lm, Ln, 2)
        footprint = g * (L1 * V // 4 + (-(-ms // 16)) * 512)
        assert footprint <= (4 << 30) + (1 << 28), (Lm, g, footprint)
        assert g >= 2, (Lm, g)
    # chr12-scale single pairs bust the budget -> per-pair route.
    assert _stream_group_pairs(1078272, 1078272, 2162688) < 2
