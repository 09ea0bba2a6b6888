"""All-pairs DP score matrix driver (scan engine on the CPU mesh)."""

import numpy as np

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
