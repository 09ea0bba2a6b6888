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
   the center. On the pallas engine the K-1 fills dispatch
   back-to-back (async, shared compiled shape); their packed
   direction bitmaps are walked in ONE lockstep device dispatch
   (``ops/traceback_batch.walk_batch``, layout "diag16") when the
   stack is small, or per pair via the Mosaic hardware-loop walker
   (``ops/traceback_device.device_walk``) when stacking would force
   XLA to re-tile gigabytes — round 4's batching of what used to be
   K-1 sequential checkpointed aligns. Pairs too long even for one
   monolithic bitmap fall back to the routed pairwise aligner.
3. **Merge** — "once a gap, always a gap": between two center chars
   (a "slot") the merged alignment carries the MAXIMUM of the gap
   runs any pairwise alignment put there, each row's inserted chars
   first and padding after — provably identical to the sequential
   two-pointer merge (``_merge_center``, kept as the test oracle),
   but built in O(width) numpy per row instead of re-spelling every
   previous row on every merge. Each row's projection against the
   center reproduces its pairwise alignment exactly (pinned by
   ``tests/test_msa.py``).

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


#: forward-op byte by walk move code (DIR_SUB/INS/DEL = 0/1/2).
_OP_BY_CODE = np.frombuffer(b"MID?", dtype=np.uint8)

#: largest per-pair packed bitmap the batched star stage will build
#: monolithically (sub-batched to ~4 GB live); beyond this, pairs run
#: through the routed aligner (checkpointed path) one at a time.
STAR_PAIR_DIRS_BUDGET = 1 << 30


#: largest STACKED bitmap the lockstep walk will take. The batched
#: gather makes XLA re-tile the whole stack (pad B up to the sublane
#: multiple + a layout copy, ~3x the stacked bytes live) — fine at
#: read scale, fatal at 30 kb x 9 pairs (17.7 GB observed). Above
#: this, each pair walks alone via the Mosaic hardware-loop walker,
#: which leaves the bitmap in HBM untouched.
LOCKSTEP_STACK_BUDGET = 512 << 20


def _star_ops_batched(
    cseq: Sequence,
    others: list[Sequence],
    scores: Scores,
    interpret: bool,
) -> list[str]:
    """Per-pair forward op strings (M/I/D) for center-vs-other global
    alignments: K-1 async packed-dirs fills (one compiled shape), then
    ONE lockstep batched device walk when the stacked bitmaps are
    small, or per-pair Mosaic hardware-loop walks when they are not.
    Bit-identical to walking each pair alone (both walkers replicate
    ``walk_block``'s movement semantics)."""
    from genomics_rs_tpu.models.aligner import PAD_MULTIPLE, _fill
    from genomics_rs_tpu.ops.traceback_batch import NO_MOVE, walk_batch
    from genomics_rs_tpu.ops.traceback_device import device_walk
    from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, round_up

    import jax
    import jax.numpy as jnp

    m = len(cseq)
    Lm = max(round_up(m, PAD_MULTIPLE), PAD_MULTIPLE)
    Ln = max(
        round_up(max(len(o) for o in others), PAD_MULTIPLE),
        PAD_MULTIPLE,
    )
    s1e = cseq.encoded(pad_to=Lm, pad_value=PAD_S1)
    # Sub-batch so the stacked packed bitmaps stay well under HBM
    # (each is (Kp/16, V) int32 ~ (Lm+Ln)*Lm/4 bytes; the streamed
    # fill's shared-diagonal layout needs ~half that).
    per_pair = (Lm + Ln + 1) * round_up(Lm + 1, 1024) // 4
    group = max(1, int((4 << 30) // max(per_pair, 1)))
    max_steps = round_up(Lm + Ln + 1, 8192)
    ops: list[str] = []
    for g0 in range(0, len(others), group):
        chunk = others[g0 : g0 + group]
        walked = None
        if len(chunk) >= 2:
            # One continuous wavefront for the whole group: the
            # streamed dirs fill removes the per-pair diagonal ramp
            # (~2x at square pairs) that the monolithic fills pay
            # (shared engine with align_batch).
            from genomics_rs_tpu.models.aligner import (
                stream_walk_group,
            )

            s1b = np.stack([s1e] * len(chunk))
            s2b = np.stack(
                [o.encoded(pad_to=Ln, pad_value=PAD_S2) for o in chunk]
            )
            msg = np.full(len(chunk), m, np.int32)
            nsg = np.array([len(o) for o in chunk], np.int32)
            walked = stream_walk_group(
                s1b, s2b, msg, nsg, scores, False, interpret,
                max_steps,
            )
        if walked is not None:
            for mv_tb in walked[0]:
                mv = mv_tb[::-1]  # forward order
                if (mv == NO_MOVE).any():
                    raise RuntimeError(
                        "batched star walk emitted a gap"
                    )
                ops.append(_OP_BY_CODE[mv].tobytes().decode())
            continue
        fills = []
        for o in chunk:
            s2e = o.encoded(pad_to=Ln, pad_value=PAD_S2)
            fills.append(
                _fill(
                    s1e, s2e, np.int32(m), np.int32(len(o)), scores,
                    False, "pallas", packed_dirs=True,
                    interpret=interpret,
                )
            )
        if len(chunk) * per_pair <= LOCKSTEP_STACK_BUDGET:
            codes = jnp.stack([r.dirs for r in fills])
            start_i = np.full(len(chunk), m, np.int32)
            start_j = np.array([len(o) for o in chunk], np.int32)
            moves, counts, i_f, j_f, done = jax.device_get(
                walk_batch(
                    codes, start_i, start_j, scores, False,
                    layout="diag16", max_steps=Lm + Ln + 1,
                )
            )
            # A stop code mid-table also sets done — a GLOBAL walk
            # must specifically reach (0, 0) (same check as the
            # per-pair branch; a corrupt fill should fail here, not
            # as a confusing consume-count assertion in _build_rows).
            if not done.all() or (i_f != 0).any() or (j_f != 0).any():
                bad = int(
                    np.flatnonzero(
                        ~done | (i_f != 0) | (j_f != 0)
                    )[0]
                )
                raise RuntimeError(
                    "batched star walk left the table at "
                    f"({int(i_f[bad])}, {int(j_f[bad])})"
                )
            walked = [
                moves[b, : int(counts[b])][::-1]
                for b in range(len(chunk))
            ]
        else:
            walked = []
            for o, res in zip(chunk, fills):
                codes1, i_f, j_f, done = device_walk(
                    res.dirs, res.start_i, res.start_j, np.int32(0),
                    max_steps=max_steps, interpret=interpret,
                )
                if not bool(done) or (int(i_f), int(j_f)) != (0, 0):
                    raise RuntimeError(
                        "star retrace left the table at "
                        f"({int(i_f)}, {int(j_f)})"
                    )
                walked.append(np.asarray(codes1)[::-1])
        for mv in walked:
            if (mv == NO_MOVE).any():
                raise RuntimeError("batched star walk emitted a gap")
            ops.append(_OP_BY_CODE[mv].tobytes().decode())
    return ops


def _build_rows(
    center: str, others: list[str], ops_list: list[str]
) -> tuple[str, list[str]]:
    """Merged MSA rows from per-pair op strings (slot-count merge).

    Slot p is the gap run between center chars p-1 and p (slot 0
    before the first, slot C after the last). The merged width gives
    every slot the max run over all pairs; each row places its own
    inserted chars at the head of the slot and pads the rest — the
    exact column layout the sequential two-pointer merge
    (``_merge_center``) produces, in O(width) numpy per row.
    """
    C = len(center)
    K1 = len(others)
    gaps = np.zeros((K1, C + 1), np.int64)
    parsed = []
    for k, ops in enumerate(ops_list):
        opsb = np.frombuffer(ops.encode("latin-1"), np.uint8)
        isI = opsb == ord("I")
        ccex = np.concatenate([[0], np.cumsum(~isI)[:-1]])
        slots = ccex[isI]
        gaps[k] = np.bincount(slots, minlength=C + 1)
        parsed.append((opsb, isI, ccex, slots))
    M = gaps.max(axis=0) if K1 else np.zeros(C + 1, np.int64)
    W = C + int(M.sum())
    preM = np.concatenate([[0], np.cumsum(M)])
    base = np.arange(C + 1) + preM[:-1]  # slot p's first column
    pos_center = base[:C] + M[:C]  # center char p's column
    center_b = np.frombuffer(center.encode("latin-1"), np.uint8)
    master = np.full(W, ord(_GAP), np.uint8)
    master[pos_center] = center_b
    rows: list[str] = []
    for (opsb, isI, ccex, slots), other in zip(parsed, others):
        if (~isI).sum() != C:
            raise AssertionError(
                "pairwise alignment did not consume the center "
                f"({int((~isI).sum())}/{C})"
            )
        other_b = np.frombuffer(other.encode("latin-1"), np.uint8)
        noD = opsb != ord("D")
        if noD.sum() != len(other):
            raise AssertionError(
                "pairwise alignment did not consume the row sequence "
                f"({int(noD.sum())}/{len(other)})"
            )
        oiex = np.concatenate([[0], np.cumsum(noD)[:-1]])
        out = np.full(W, ord(_GAP), np.uint8)
        cops = opsb[~isI]  # the op consuming each center char
        m_mask = cops == ord("M")
        out[pos_center[m_mask]] = other_b[oiex[~isI][m_mask]]
        # I-run chars go at the head of their slot, in run order.
        rank = np.arange(len(slots)) - np.searchsorted(slots, slots)
        out[base[slots] + rank] = other_b[oiex[isI]]
        rows.append(out.tobytes().decode("latin-1"))
    return master.tobytes().decode("latin-1"), rows


def center_star_msa(
    container: SequenceContainer,
    scores: Scores,
    engine: str = "auto",
    interpret: bool = False,
    matrix=None,
) -> MSAResult:
    """Multiple alignment of every sequence in ``container``.

    The pairwise score pass runs as one batched device dispatch
    (``allpairs_scores``); the K-1 star alignments run through the
    routed :class:`PairwiseAligner` (global mode).

    ``matrix`` (a ``SubstMatrix``) switches to full-matrix scoring —
    protein MSA: the score pass uses the batched matrix stream engine
    and the K-1 star alignments fill in ONE 2-D packed stream-dirs
    dispatch + one ``walk_many`` dispatch
    (``models.aligner.matrix_align_batch``, round 5 — they ran
    per-pair on the lax.scan engine before); gap costs still come
    from ``scores.g``/``scores.h``.
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
        if matrix is not None:
            from genomics_rs_tpu.parallel.allpairs import (
                allpairs_matrix_scores,
            )

            ap = allpairs_matrix_scores(
                container, matrix, g=scores.g, h=scores.h,
                is_local=False,
            )
        else:
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

    cseq = seqs[center]
    order = [k for k in range(len(seqs)) if k != center]
    others = [seqs[k] for k in order]
    resolved = engine
    if engine == "auto":
        import jax

        resolved = (
            "pallas" if jax.default_backend() == "tpu" else "scan"
        )
    if matrix is not None:
        # The per-pair matrix aligner (the batched path's fallback)
        # runs on the scan engine.
        resolved = "scan"
    aligner = PairwiseAligner(
        scores,
        is_local=False,
        engine=resolved,
        interpret=interpret,
        matrix=matrix,
    )
    # The batched path needs every pair's monolithic packed bitmap to
    # be buildable. Its budget is larger than the aligner's
    # monolithic-route budget: the star stage explicitly sub-batches
    # so only one GROUP of bitmaps is live (~4 GB), and the transient
    # is freed before the merge — a 30 kb corpus (472 MB/pair) stays
    # on the fast path instead of paying 9 checkpointed aligns.
    from genomics_rs_tpu.sequence import round_up as _ru

    Lm_est = max(_ru(len(cseq), 128), 128)
    Ln_est = max(
        _ru(max((len(o) for o in others), default=1), 128), 128
    )
    est_dirs = (Lm_est + Ln_est + 1) * _ru(Lm_est + 1, 1024) // 4
    with PhaseTimer("msa").span("align the corpus to the center"):
        if matrix is not None and others:
            from genomics_rs_tpu.models.aligner import (
                matrix_align_batch,
            )

            ops_list = [
                _alignment_ops(al)
                for al in matrix_align_batch(
                    [(cseq, o) for o in others],
                    matrix,
                    g=scores.g,
                    h=scores.h,
                    is_local=False,
                    interpret=interpret,
                )
            ]
        elif (
            resolved == "pallas"
            and matrix is None
            and others
            and est_dirs <= STAR_PAIR_DIRS_BUDGET
        ):
            ops_list = _star_ops_batched(
                cseq, others, scores, interpret
            )
        else:
            ops_list = [
                _alignment_ops(aligner.align(cseq, o)) for o in others
            ]
        master, rows = _build_rows(
            cseq.sequence, [o.sequence for o in others], ops_list
        )

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
