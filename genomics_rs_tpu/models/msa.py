"""Center-star multiple sequence alignment on the device engines.

No reference counterpart: ``/root/reference`` stops at pairwise
alignment (``src/alignment/algo.rs``) and whole-corpus LCS similarity
(``src/main.rs:216-379``). This module composes those two capabilities
into a proper MSA the TPU way:

1. **Center selection** — the all-pairs global score matrix comes from
   the batched device engines (one bucketed dispatch over the whole
   corpus, ``parallel/allpairs.py``); the center is the sequence with
   the maximum summed score against the rest (the classic center-star
   2-approximation pivot, argmax instead of argmin because these are
   similarity scores).
2. **Star alignments** — every other sequence is globally aligned to
   the center with the routed pairwise aligner (Pallas fill + device
   walk; long pairs fall onto the checkpointed path automatically).
3. **Merge** — "once a gap, always a gap": each pairwise alignment's
   gapped center is merged into the running master center; every gap
   inserted into the master is re-broadcast into previously merged
   rows, so each row's projection against the center reproduces its
   pairwise alignment exactly (pinned by ``tests/test_msa.py``).

Ties in center selection keep the smallest index (deterministic).
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.aligner import PairwiseAligner
from genomics_rs_tpu.ops.traceback import AlignedSequences, AlignmentChoice
from genomics_rs_tpu.sequence import Sequence, SequenceContainer
from genomics_rs_tpu.utils.profiling import PhaseTimer

log = logging.getLogger(__name__)

_GAP = "-"


@dataclasses.dataclass
class MSAResult:
    """A finished multiple alignment.

    ``rows[k]`` is the gapped row for ``names[k]`` — all rows share one
    length, and removing the gaps recovers the input sequences
    verbatim.
    """

    names: list[str]
    rows: list[str]
    center_index: int
    #: [j][i] = global score for i <= j (lower triangle, like
    #: AllPairsResult.matrix).
    score_matrix: np.ndarray

    @property
    def width(self) -> int:
        return len(self.rows[0]) if self.rows else 0

    def conservation(self) -> str:
        """'*' where a column is gap-free and fully identical."""
        out = []
        for col in zip(*self.rows):
            first = col[0]
            out.append(
                "*"
                if first != _GAP and all(ch == first for ch in col)
                else " "
            )
        return "".join(out)


def _alignment_ops(aln: AlignedSequences) -> str:
    """Forward per-column ops of a pairwise alignment.

    'M' consumes a char of both sequences, 'I' only of s2 (gap in s1),
    'D' only of s1 (gap in s2) — the display convention
    (``display/alignment.py``).
    """
    C = AlignmentChoice
    ops = []
    for choice, _, _ in reversed(aln.alignment):
        if choice in (C.INSERT, C.OPEN_INSERT):
            ops.append("I")
        elif choice in (C.DELETE, C.OPEN_DELETE):
            ops.append("D")
        else:
            ops.append("M")
    return "".join(ops)


def _gapped_pair(center: str, other: str, ops: str) -> tuple[str, str]:
    """Expand an op string into the two gapped row strings."""
    ci = oi = 0
    crow: list[str] = []
    orow: list[str] = []
    for op in ops:
        if op == "I":
            crow.append(_GAP)
        else:
            crow.append(center[ci])
            ci += 1
        if op == "D":
            orow.append(_GAP)
        else:
            orow.append(other[oi])
            oi += 1
    if ci != len(center) or oi != len(other):
        raise AssertionError(
            "pairwise alignment did not consume both sequences "
            f"({ci}/{len(center)}, {oi}/{len(other)})"
        )
    return "".join(crow), "".join(orow)


def _merge_center(
    master: str, rows: list[str], new_center: str, new_row: str
) -> tuple[str, list[str], str]:
    """Merge a gapped center into the master (once a gap, always a gap).

    ``master`` and ``new_center`` are two gapped spellings of the SAME
    center sequence; the merged center takes a gap wherever either
    has one (aligned gap columns are shared). Returns the merged
    center, the re-padded existing rows, and the padded new row.
    """
    a = b = 0
    merged: list[str] = []
    # Per existing row and the new row: which source column feeds each
    # merged column (-1 = inserted gap).
    take_a: list[int] = []
    take_b: list[int] = []
    la, lb = len(master), len(new_center)
    while a < la or b < lb:
        ca = master[a] if a < la else None
        cb = new_center[b] if b < lb else None
        if ca is not None and cb is not None and (ca == cb or (ca != _GAP and cb != _GAP)):
            # Same center char (they must match — both spell the
            # center) or two aligned gap columns.
            merged.append(ca)
            take_a.append(a)
            take_b.append(b)
            a += 1
            b += 1
        elif ca == _GAP or cb is None:
            # master has an extra gap column here: pad the new row.
            merged.append(_GAP)
            take_a.append(a)
            take_b.append(-1)
            a += 1
        else:
            # new alignment opened a gap the master lacks: pad master
            # and every existing row.
            merged.append(_GAP)
            take_a.append(-1)
            take_b.append(b)
            b += 1
    out_rows = [
        "".join(r[i] if i >= 0 else _GAP for i in take_a) for r in rows
    ]
    padded_new = "".join(
        new_row[i] if i >= 0 else _GAP for i in take_b
    )
    return "".join(merged), out_rows, padded_new


def center_star_msa(
    container: SequenceContainer,
    scores: Scores,
    engine: str = "auto",
    interpret: bool = False,
) -> MSAResult:
    """Multiple alignment of every sequence in ``container``.

    The pairwise score pass runs as one batched device dispatch
    (``allpairs_scores``); the K-1 star alignments run through the
    routed :class:`PairwiseAligner` (global mode).
    """
    from genomics_rs_tpu.parallel.allpairs import allpairs_scores

    seqs = container.sequences
    if not seqs:
        raise ValueError("msa needs at least one sequence")
    names = [s.name for s in seqs]
    if len(seqs) == 1:
        return MSAResult(
            names, [seqs[0].sequence], 0, np.zeros((1, 1), np.int64)
        )

    with PhaseTimer("msa").span("compute the pairwise score matrix"):
        ap = allpairs_scores(
            container, scores, is_local=False, engine=engine,
            interpret=interpret,
        )
    # Symmetrize the lower triangle (diagonal self-scores excluded
    # from the center sum: constant offset per row ranking otherwise).
    mat = ap.matrix
    full = mat + mat.T
    np.fill_diagonal(full, 0)
    sums = full.sum(axis=1)
    center = int(np.argmax(sums))
    log.info(
        "MSA center: %s (summed score %d)", names[center], sums[center]
    )

    aligner = PairwiseAligner(
        scores, is_local=False, engine=engine, interpret=interpret
    )
    cseq = seqs[center]
    master = cseq.sequence
    rows: list[str] = []
    order = [k for k in range(len(seqs)) if k != center]
    with PhaseTimer("msa").span("align the corpus to the center"):
        for k in order:
            aln = aligner.align(cseq, seqs[k])
            ops = _alignment_ops(aln)
            gc, go = _gapped_pair(cseq.sequence, seqs[k].sequence, ops)
            master, rows, padded = _merge_center(master, rows, gc, go)
            rows.append(padded)

    # Rows back in corpus order, center included.
    all_rows = [""] * len(seqs)
    all_rows[center] = master
    for pos, k in enumerate(order):
        all_rows[k] = rows[pos]
    return MSAResult(names, all_rows, center, mat)


def write_msa_fasta(result: MSAResult, path: str) -> None:
    """Aligned-FASTA output (60-column wrapped)."""
    with open(path, "w") as f:
        for name, row in zip(result.names, result.rows):
            f.write(f">{name}\n")
            for i in range(0, len(row), 60):
                f.write(row[i : i + 60] + "\n")


def format_msa_clustal(result: MSAResult, width: int = 60) -> str:
    """CLUSTAL-style block rendering with a conservation line."""
    cons = result.conservation()
    namew = max((len(n) for n in result.names), default=0)
    namew = min(max(namew, 10), 30)
    lines = ["genomics_rs_tpu multiple sequence alignment", ""]
    for start in range(0, result.width, width):
        for name, row in zip(result.names, result.rows):
            lines.append(
                f"{name[:namew]:<{namew}}  {row[start:start + width]}"
            )
        lines.append(f"{'':<{namew}}  {cons[start:start + width]}")
        lines.append("")
    return "\n".join(lines)
