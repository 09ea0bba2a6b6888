"""Batched short-read alignment with full per-read tracebacks.

The reference aligns exactly one pair per process run
(``/root/reference/src/main.rs:123-153``); the score-only read batches
(``ops/gotoh_shortread.py``) extend that to thousands of pairs but
return only (score, end). This driver completes the read-mapping use
case: every read gets its full alignment — path, stats, CIGAR — while
the O(m*n) work stays batched on device:

* fills run as a ``vmap``-ed wavefront with the 2-bit direction bitmap
  emitted per read (read-scale bitmaps are tiny: ~130 KB at 256 bp);
* tracebacks are O(m+n) host walks over the bitmaps, sharing the
  reference-quirk classification (``ops/traceback.py``) so every
  per-read result is bit-identical to ``PairwiseAligner.align`` on
  that pair (pinned by tests).

CIGAR convention (query = s1 vs reference = s2): ``M`` consumes both
(match or mismatch), ``I`` consumes only the query (the DP's DELETE
move, gap in s2), ``D`` consumes only the reference (the DP's INSERT
move, gap in s1).
"""

from __future__ import annotations

import functools
import logging

import numpy as np

import jax

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.traceback import (
    AlignedSequences,
    AlignmentChoice,
    traceback_host,
)
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, Sequence, round_up

log = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("is_local",))
def _fill_batch(s1b, s2b, ms, ns, scores: Scores, is_local: bool):
    def one(s1e, s2e, m, n):
        res = gotoh_fill_scan(s1e, s2e, m, n, scores, is_local)
        return res.dirs, res.score, res.start_i, res.start_j

    return jax.vmap(one, in_axes=(0, 0, 0, 0))(s1b, s2b, ms, ns)


def cigar(aligned: AlignedSequences) -> str:
    """Run-length CIGAR string (query = s1) from the move path."""
    ops = []
    for choice, _, _ in reversed(aligned.alignment):
        if choice in (AlignmentChoice.MATCH, AlignmentChoice.MISMATCH):
            op = "M"
        elif choice in (
            AlignmentChoice.DELETE,
            AlignmentChoice.OPEN_DELETE,
        ):
            op = "I"  # consumes only the query (gap in s2)
        else:
            op = "D"  # consumes only the reference (gap in s1)
        if ops and ops[-1][0] == op:
            ops[-1][1] += 1
        else:
            ops.append([op, 1])
    return "".join(f"{count}{op}" for op, count in ops)


def align_reads(
    queries: list[Sequence],
    refs: list[Sequence],
    scores: Scores,
    is_local: bool = True,
    batch: int = 512,
) -> list[AlignedSequences]:
    """Full alignments for query[i] vs ref[i], batched on device.

    Reads are chunked into ``batch``-sized device fills (bounding the
    resident bitmap memory to ``batch * K * (L1+1)`` bytes) and
    traced back on host. Output order matches the input order.
    """
    if len(queries) != len(refs):
        raise ValueError(
            f"query/ref count mismatch: {len(queries)} vs {len(refs)}"
        )
    L1 = max(round_up(max((len(s) for s in queries), default=1), 128), 128)
    L2 = max(round_up(max((len(s) for s in refs), default=1), 128), 128)

    out: list[AlignedSequences] = []
    for k0 in range(0, len(queries), batch):
        qs = queries[k0 : k0 + batch]
        rs = refs[k0 : k0 + batch]
        s1b = np.stack(
            [s.encoded(pad_to=L1, pad_value=PAD_S1) for s in qs]
        )
        s2b = np.stack(
            [s.encoded(pad_to=L2, pad_value=PAD_S2) for s in rs]
        )
        ms = np.array([len(s) for s in qs], dtype=np.int32)
        ns = np.array([len(s) for s in rs], dtype=np.int32)
        dirs, sc, si, sj = _fill_batch(
            s1b, s2b, ms, ns, scores, is_local
        )
        dirs = np.asarray(dirs)
        sc, si, sj = np.asarray(sc), np.asarray(si), np.asarray(sj)
        for k in range(len(qs)):
            out.append(
                traceback_host(
                    dirs[k],
                    int(si[k]),
                    int(sj[k]),
                    int(sc[k]),
                    qs[k],
                    rs[k],
                    is_local,
                )
            )
    return out
