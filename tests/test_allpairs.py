"""All-pairs DP score matrix driver (scan engine on the CPU mesh)."""

import numpy as np
import pytest

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.aligner import PairwiseAligner
from genomics_rs_tpu.parallel.allpairs import allpairs_scores, write_scores_tsv
from genomics_rs_tpu.sequence import Sequence, SequenceContainer

SCORES = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


def test_allpairs_matches_single(tmp_path):
    rng = np.random.default_rng(31)
    seqs = [
        Sequence(f"s{k}", "".join(rng.choice(list("ACGT"), int(rng.integers(20, 90)))))
        for k in range(5)
    ]
    container = SequenceContainer(sequences=seqs)
    result = allpairs_scores(container, SCORES, is_local=False, engine="scan")

    aligner = PairwiseAligner(SCORES, is_local=False, engine="scan")
    for j in range(5):
        for i in range(j + 1):
            want = aligner.score_only(seqs[i], seqs[j])
            assert int(result.matrix[j, i]) == want, (i, j)
        for i in range(j + 1, 5):
            assert int(result.matrix[j, i]) == 0

    tsv = write_scores_tsv(result, str(tmp_path / "m.tsv"))
    assert tsv.splitlines()[0].split("\t")[1:6] == [str(k) for k in range(5)]


def test_allpairs_resumable(tmp_path):
    """Crash-resume: first run interrupted mid-way, second completes
    from the checkpoint and matches the non-resumable result."""
    from genomics_rs_tpu.parallel.allpairs import allpairs_scores_resumable

    rng = np.random.default_rng(37)
    seqs = [
        Sequence(f"s{k}", "".join(rng.choice(list("ACGT"), 40)))
        for k in range(6)
    ]
    container = SequenceContainer(sequences=seqs)
    ckpt = str(tmp_path / "pairs.jsonl")

    full = allpairs_scores(container, SCORES, engine="scan")

    # Simulate a partial run: compute only the first chunk, then "crash".
    r1 = allpairs_scores_resumable(
        container, SCORES, ckpt, engine="scan", chunk_pairs=5
    )
    np.testing.assert_array_equal(r1.matrix, full.matrix)

    # Truncate the checkpoint to meta + one chunk (simulated crash,
    # including a torn trailing write) and resume.
    lines = open(ckpt).read().splitlines()
    with open(ckpt, "w") as f:
        f.write(lines[0] + "\n" + lines[1] + "\n" + '{"k0": 10, "sco')
    r2 = allpairs_scores_resumable(
        container, SCORES, ckpt, engine="scan", chunk_pairs=5
    )
    np.testing.assert_array_equal(r2.matrix, full.matrix)
    # Checkpoint now contains meta + every chunk again.
    assert len(open(ckpt).read().splitlines()) == 1 + -(-21 // 5)

    # A checkpoint from different params is discarded, not misused.
    r3 = allpairs_scores_resumable(
        container, SCORES, ckpt, engine="scan", chunk_pairs=7
    )
    np.testing.assert_array_equal(r3.matrix, full.matrix)


def test_allpairs_length_buckets_mixed_corpus():
    """Mixed corpus (clustered short genomes + one long outlier): the
    bucketed driver must keep total padded cells <= 1.3x true cells
    (the reference pays zero padding, main.rs:263-308; global
    max-length padding would be ~7x here) with an identical matrix."""
    from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan

    rng = np.random.default_rng(53)
    seqs = [
        Sequence(
            f"s{k}", "".join(rng.choice(list("ACGT"), int(rng.integers(620, 641))))
        )
        for k in range(4)
    ]
    seqs.append(Sequence("outlier", "".join(rng.choice(list("ACGT"), 3199))))
    container = SequenceContainer(sequences=seqs)

    result = allpairs_scores(container, SCORES, engine="scan")
    assert result.padded_cells <= 1.3 * result.cells, (
        result.padded_cells,
        result.cells,
    )

    # Matrix parity against the unbucketed oracle on every pair.
    from genomics_rs_tpu.sequence import PAD_S1, PAD_S2

    for j in range(5):
        for i in range(j + 1):
            ref = gotoh_fill_scan(
                seqs[i].encoded(pad_value=PAD_S1),
                seqs[j].encoded(pad_value=PAD_S2),
                np.int32(len(seqs[i])),
                np.int32(len(seqs[j])),
                SCORES,
                False,
            )
            assert int(result.matrix[j, i]) == int(ref.score), (i, j)


def test_balanced_deal_properties():
    """LPT dealing: complete partition; no share exceeds the mean by
    more than the largest single item; a single giant item reaches
    the indivisible-item efficiency bound."""
    from genomics_rs_tpu.parallel.distributed import balanced_deal

    rng = np.random.default_rng(7)
    costs = [float(c) for c in rng.integers(1, 1000, 37)] + [1e6]
    shares = balanced_deal(costs, 4)
    assert sorted(k for s in shares for k in s) == list(range(38))
    totals = [sum(costs[k] for k in s) for s in shares]
    assert max(totals) - min(totals) <= max(costs)
    # One indivisible giant: the bottleneck is exactly that share.
    assert max(totals) == pytest.approx(
        max(1e6, (sum(costs) - 1e6) / 3), rel=0.34
    )


def test_resumable_invalidates_on_content_change(tmp_path):
    """A length-preserving corpus edit must invalidate the checkpoint
    (the meta digest covers names + content, not just lengths)."""
    from genomics_rs_tpu.parallel.allpairs import allpairs_scores_resumable

    rng = np.random.default_rng(41)
    seqs = [
        Sequence(f"s{k}", "".join(rng.choice(list("ACGT"), 40)))
        for k in range(4)
    ]
    container = SequenceContainer(sequences=seqs)
    ckpt = str(tmp_path / "pairs.jsonl")
    allpairs_scores_resumable(container, SCORES, ckpt, engine="scan")

    # Same lengths, different content.
    mutated = "".join(
        {"A": "C", "C": "G", "G": "T", "T": "A"}[c]
        for c in seqs[0].sequence
    )
    seqs2 = [Sequence(seqs[0].name, mutated)] + seqs[1:]
    container2 = SequenceContainer(sequences=seqs2)
    r = allpairs_scores_resumable(container2, SCORES, ckpt, engine="scan")
    full = allpairs_scores(container2, SCORES, engine="scan")
    np.testing.assert_array_equal(r.matrix, full.matrix)


def test_allpairs_sharded_pallas_engines_match_scan():
    """Single-process multi-device all-pairs: buckets sharded over the
    8-device CPU mesh with per-shard Pallas fills (interpret mode
    stands in for the chip) must reproduce the scan matrix. Mixed
    lengths force two buckets — one short-read-kernel bucket and one
    row-segmented bucket (``mesh_bucket_engine`` routing)."""
    import pytest

    rng = np.random.default_rng(41)
    seqs = [
        Sequence(
            f"s{k}",
            "".join(
                rng.choice(list("ACGT"), int(rng.integers(40, 200)))
            ),
        )
        for k in range(5)
    ] + [
        Sequence(
            f"m{k}",
            "".join(
                rng.choice(list("ACGT"), int(rng.integers(280, 380)))
            ),
        )
        for k in range(2)
    ]
    container = SequenceContainer(sequences=seqs)
    want = allpairs_scores(container, SCORES, is_local=False, engine="scan")
    got = allpairs_scores(
        container,
        SCORES,
        is_local=False,
        engine="pallas",
        interpret=True,
    )
    if not np.array_equal(got.matrix, want.matrix):
        pytest.fail(
            f"sharded pallas matrix != scan:\n{got.matrix}\n{want.matrix}"
        )


def test_mesh_bucket_engine_routing():
    from genomics_rs_tpu.parallel.batch import (
        SEGMENTED_MAX_LEN,
        SHORTREAD_MAX_LEN,
        mesh_bucket_engine,
    )

    assert mesh_bucket_engine("scan", 128, 128, False) == "scan"
    assert mesh_bucket_engine("shortread", 9000, 9000, False) == "shortread"
    assert mesh_bucket_engine("auto", 128, SHORTREAD_MAX_LEN, False) == (
        "shortread"
    )
    assert mesh_bucket_engine("pallas", 512, 512, False) == "segmented"
    # stream tiers fall back to the flat batch kernel per shard.
    assert (
        mesh_bucket_engine("stream", SEGMENTED_MAX_LEN + 1, 128, False)
        == "pallas"
    )


def test_device_loop_scores_matches_scan():
    """Explicit per-device placement (the long-pair stream-tier path):
    slices dispatched to each of the 8 CPU devices must reproduce the
    scan scores, including the row-0-replicating batch padding."""
    import jax

    from genomics_rs_tpu.parallel.batch import (
        batch_scores,
        device_loop_scores,
    )
    from genomics_rs_tpu.sequence import PAD_S1, PAD_S2

    rng = np.random.default_rng(47)
    B, L = 10, 256
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ms = rng.integers(L // 2, L + 1, B).astype(np.int32)
    ns = rng.integers(L // 2, L + 1, B).astype(np.int32)
    s1b = np.full((B, L), PAD_S1, np.uint8)
    s2b = np.full((B, L), PAD_S2, np.uint8)
    for i in range(B):
        s1b[i, : ms[i]] = bases[rng.integers(0, 4, ms[i])]
        s2b[i, : ns[i]] = bases[rng.integers(0, 4, ns[i])]
    for is_local in (False, True):
        want = batch_scores(s1b, s2b, ms, ns, SCORES, is_local)
        sc, si, sj = device_loop_scores(
            jax.devices(),
            s1b,
            s2b,
            ms,
            ns,
            SCORES,
            is_local,
            engine="stream",
            interpret=True,
        )
        assert np.array_equal(sc, np.asarray(want.score)), is_local
        if is_local:
            assert np.array_equal(si, np.asarray(want.start_i))
            assert np.array_equal(sj, np.asarray(want.start_j))


def test_bucketed_long_bucket_routes_device_loop(monkeypatch):
    """Buckets past the segmented band route to the per-device stream
    loop when a multi-device mesh is present."""
    import genomics_rs_tpu.parallel.allpairs as ap
    import genomics_rs_tpu.parallel.batch as batch
    from genomics_rs_tpu.parallel.mesh import make_mesh

    called = {}

    def fake_loop(devs, s1b, s2b, ms, ns, scores, is_local, engine="stream",
                  interpret=False):
        called["engine"] = engine
        called["n"] = len(ms)
        return (
            np.zeros(len(ms), np.int32),
            np.zeros(len(ms), np.int32),
            np.zeros(len(ms), np.int32),
        )

    monkeypatch.setattr(batch, "device_loop_scores", fake_loop)
    rng = np.random.default_rng(3)
    seqs = [
        Sequence(
            f"L{k}",
            "".join(rng.choice(list("ACGT"), 9000)),
        )
        for k in range(2)
    ]
    container = SequenceContainer(sequences=seqs)
    lens = np.array([len(s) for s in seqs], np.int32)
    pairs = [(0, 0), (0, 1), (1, 1)]
    sc, _ = ap._score_pairs_bucketed(
        container, pairs, lens, SCORES, False, "pallas",
        mesh=make_mesh(), interpret=True,
    )
    assert called == {"engine": "stream", "n": 3}
    assert list(sc) == [0, 0, 0]
