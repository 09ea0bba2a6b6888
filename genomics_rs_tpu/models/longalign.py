"""Checkpointed linear-space alignment with full traceback.

The reference materialises 48 B/cell (SURVEY §2.4-9: ~43 GB for one
30 kb pair), and even our 2-bit direction bitmap tops out around
60 kb pairs in one chip's HBM. This driver removes the ceiling:

1. **Forward pass** — the table is filled as full-width row blocks of
   ``block_rows`` rows through the streamed-boundary Pallas tile
   kernel (score-only + bottom-row emission); only each block's input
   top row is checkpointed (O((m/R) * n) int32).
2. **Backward pass** — walking from the end cell, each crossed block
   is *refilled* with its 2-bit direction bitmap (O(R * n) transient,
   device-resident) and the path is chased on device
   (``ops/traceback_device.device_walk``); only O(m+n) move codes ever
   reach the host.

Because every block refill injects the exact checkpointed boundary
values, the per-cell direction codes — and therefore the traceback
path, tie-breaks and stats — are bit-identical to a monolithic fill
(verified against ``PairwiseAligner`` in tests/test_longalign.py).

At chromosome scale the scheme goes HIERARCHICAL (``l2_rows``): the
forward pass checkpoints ~96k-row blocks (throughput-optimal for the
wavefront), and the backward pass re-checkpoints each crossed block
at ~16k rows from its stored boundary before materializing any
direction bitmap — so a chr12 x chr12 alignment (1.16e12 cells, whose
monolithic bitmap would be ~290 GB) keeps a full bit-exact traceback
with at most a ~4.5 GB transient: 41 s warm on one v5e chip.
"""

from __future__ import annotations

import functools
import logging
import time

import numpy as np

import jax
import jax.numpy as jnp

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_pallas import gotoh_tile_pallas
from genomics_rs_tpu.ops.gotoh_rowblock import gotoh_rowblock_pallas
from genomics_rs_tpu.ops.gotoh_scan import INT_MIN
from genomics_rs_tpu.ops.gotoh_tile import (
    global_boundary_left,
    global_boundary_top,
)
from genomics_rs_tpu.ops.traceback import AlignedSequences, classify_moves
from genomics_rs_tpu.ops.traceback_device import device_walk
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, Sequence, round_up

log = logging.getLogger(__name__)

#: Largest single backward-pass dirs refill, bytes. Shared invariant:
#: the aligner picks hierarchical leaf heights so one refill fits
#: this budget, and the leaf walk prefetches (two live refills) only
#: under the same cap — 2 x 4.5 GB measured safe in 16 GB HBM at
#: chr12 width, 2 x 9.1 GB (l2=32767) OOMs.
REFILL_BYTES_CAP = (9 << 30) // 2



def _forward_blocks(
    s1e,
    s2e,
    m: int,
    n: int,
    R: int,
    NB: int,
    scores: Scores,
    is_local: bool,
    interpret: bool,
    keep_tops: bool,
    lean: bool = False,
):
    """Shared forward pass over full-width row blocks.

    The whole pass is ONE jitted ``lax.scan`` over blocks (the tile
    kernel is a primitive inside the scan body), so a pair costs a
    single dispatch regardless of block count — dispatch latency
    through remote tunnels would otherwise dominate the pipeline.
    Returns (tops (NB, 3, n+1) | None, best (v, i, j), at_mn).
    """
    Ln = s2e.shape[0]
    tops, best_dev, at_mn_dev = _fwd_jit(
        s1e,
        s2e,
        np.int32(m),
        np.int32(n),
        scores,
        global_boundary_top(0, Ln, scores),
        np.int32(0),
        NB=NB,
        R=R,
        keep=keep_tops,
        loc=is_local,
        interp=interpret,
        lean=lean,
    )
    best = (
        tuple(int(x) for x in best_dev) if is_local else (INT_MIN, 0, 0)
    )
    return (tops if keep_tops else None), best, int(at_mn_dev)


@functools.partial(
    jax.jit, static_argnames=("NB", "R", "keep", "loc", "interp", "lean")
)
def _fwd_jit(
    s1e, s2e, m, n, scores, top0, i_base, NB, R, keep, loc, interp,
    lean=False,
):
    """Module-level jit so the scan+kernel program compiles once per
    shape bucket, not per call (the closure version re-keyed the jit
    cache on function identity every invocation).

    ``lean`` fills blocks with the specialized forward row-block
    kernel (``ops/gotoh_rowblock``) instead of the general tile
    kernel — identical results (pinned by tests), preferred for
    score-only passes with big blocks (``score_long``).

    ``top0`` is the I/S/D boundary of row ``i_base`` over columns
    0..len(s2e) — the global row-0 boundary for a whole-pair pass, a
    checkpointed row for a nested pass inside a parent block (the
    hierarchical backward, :func:`_walk_span`).
    """
    s1_blocks = s1e.reshape(NB, R)

    def body(top, xs):
        s1_blk, b = xs
        i0 = i_base + b * R
        if lean:
            res = gotoh_rowblock_pallas(
                s1_blk, s2e, top, m, n, i0, scores, loc,
                interpret=interp,
            )
        else:
            left = global_boundary_left(i0, R, scores)
            res = gotoh_tile_pallas(
                s1_blk,
                s2e,
                top,
                left,
                m,
                n,
                i0,
                jnp.int32(0),
                scores,
                loc,
                emit_dirs=False,
                emit_bottom=True,
                interpret=interp,
            )
        ys = (
            top if keep else jnp.int32(0),
            jnp.stack(res.best),
            res.score_at_mn,
        )
        return res.bottom, ys

    _, (tops, bests, at_mns) = jax.lax.scan(
        body,
        jnp.asarray(top0, jnp.int32),
        (s1_blocks, jnp.arange(NB, dtype=jnp.int32)),
    )
    # Merge with the reference tie-break (blocks ordered by i).
    at_mn = jnp.max(at_mns)
    v, bi, bj = bests[:, 0], bests[:, 1], bests[:, 2]
    vmax = jnp.max(v)
    i_best = jnp.max(jnp.where(v == vmax, bi, -1))
    j_best = jnp.max(jnp.where((v == vmax) & (bi == i_best), bj, -1))
    return tops, (vmax, i_best, j_best), at_mn


def score_long(
    seq1: Sequence,
    seq2: Sequence,
    scores: Scores,
    is_local: bool = False,
    block_rows: int = 98303,
    interpret: bool = False,
) -> tuple[int, int, int]:
    """(score, start_i, start_j) for arbitrarily long pairs.

    Forward block fills only, keeping a single rolling boundary row on
    device — O(n) memory, no checkpoints, so chromosome-scale pairs
    (chr12 x chr12 = 1.2e12 cells) score on one chip.

    Blocks go through the lean forward row-block kernel. The wavefront
    kernels are latency-bound per diagonal step, so throughput scales
    with block height until VMEM-level costs catch up: chr12 x chr12
    measured 3.9e10 cells/s at 16k rows (tile kernel), 7.4e10 at 64k,
    **7.8e10 at the default 96k (14.9 s)**, regressing at 128k. R+1 a
    multiple of 1024 wastes no lanes; short pairs shrink R to the
    minimal lane vector.
    """
    m, n = len(seq1), len(seq2)
    R = min(block_rows, max(round_up(m + 1, 1024) - 1, 1023))
    Lm = max(round_up(m, R), R)
    Ln = max(round_up(n, 128), 128)
    NB = Lm // R
    s1e = seq1.encoded(pad_to=Lm, pad_value=PAD_S1)
    s2e = seq2.encoded(pad_to=Ln, pad_value=PAD_S2)

    t0 = time.perf_counter()
    _, best, at_mn = _forward_blocks(
        s1e, s2e, m, n, R, NB, scores, is_local, interpret,
        keep_tops=False, lean=True,
    )
    elapsed = time.perf_counter() - t0
    cells = (m + 1.0) * (n + 1.0)
    log.info(
        "[ScoreLong] %dx%d (%.3g cells) in %d blocks: %.2fs (%.3g cells/s)",
        m,
        n,
        cells,
        NB,
        elapsed,
        cells / elapsed,
    )
    if is_local:
        return best
    return at_mn, m, n


def _walk_span(
    s1e_span,
    s2e_span,
    tops,
    R: int,
    i_base: int,
    m: int,
    n: int,
    scores: Scores,
    is_local: bool,
    interpret: bool,
    i: int,
    j: int,
    l2_rows: int | None = None,
):
    """Walk the traceback upward through a span of checkpointed blocks.

    The span covers global rows ``[i_base, i_base + NB*R]`` as ``NB``
    blocks of ``R`` rows; ``tops[b]`` is the checkpointed I/S/D
    boundary of row ``i_base + b*R`` over columns ``0..len(s2e_span)``
    and ``s1e_span`` holds the span's ``NB*R`` encoded rows. The walk
    enters at global ``(i, j)`` and returns ``(codes, i, j, done)``
    with the move codes in walk order; ``done=False`` means the path
    exited the span above ``i_base`` (and continues in the caller's
    block above).

    With ``l2_rows=None`` each crossed block is refilled with its
    packed 2-bit direction bitmap and chased on device. With
    ``l2_rows`` set (the hierarchical backward; ``R % l2_rows == 0``),
    a crossed block is instead *re-checkpointed*: a nested forward
    pass over ``l2_rows``-row sub-blocks (column-truncated to the
    entry column) rebuilds that block's interior boundaries from
    ``tops[b]``, and the walk recurses one level down — so the dirs
    bitmaps only ever materialize at ``l2_rows`` granularity. That is
    what lets chromosome-scale pairs keep full bit-exact tracebacks:
    a chr12-height block's own bitmap would be tens of GB, a
    sub-block's is ~1-2 GB transient.

    Two latency optimizations in the leaf level (see the refill loop):

    * COLUMN TRUNCATION — the walk enters a block at column ``j`` and
      only ever moves left, so cells right of ``j`` are never read:
      refill just columns [0, Bt] with ``Bt >= j``, quantized to
      quarter-width buckets to bound compiled kernel variants.
    * PREFETCH — a global walk always exits into the block above, and
      its exit column can't exceed its entry column, so the next
      block's refill is enqueued (JAX async dispatch) BEFORE the
      walk's host sync: one device round-trip per block instead of
      two. (A local walk may stop in ANY block, where a prefetched
      whole-block fill would be discarded — locals refill after the
      walk instead.)
    """
    codes: list[np.ndarray] = []
    done = i == 0 and j == 0
    if done:
        return codes, i, j, True
    Ln = s2e_span.shape[0]
    quantum = max(round_up(-(-Ln // 4), 128), 128)
    blk = max(0, (i - 1 - i_base) // R)

    if l2_rows is not None:
        if R % l2_rows:
            raise ValueError(
                f"hierarchical walk needs block_rows ({R}) to be a "
                f"multiple of l2_rows ({l2_rows})"
            )
        NB2 = R // l2_rows
        while not done:
            i0 = i_base + blk * R
            r0 = blk * R
            s1_blk = s1e_span[r0 : r0 + R]
            # Nested forward from the checkpointed row i0, truncated
            # right of the entry column (cells there are never read:
            # DP dependencies only flow rightward).
            Bt = min(Ln, round_up(max(j, 1), quantum))
            sub_tops, _, _ = _fwd_jit(
                s1_blk,
                s2e_span[:Bt],
                np.int32(m),
                np.int32(n),
                scores,
                tops[blk][:, : Bt + 1],
                np.int32(i0),
                NB=NB2,
                R=l2_rows,
                keep=True,
                loc=is_local,
                interp=interpret,
                lean=True,
            )
            sub_codes, i, j, done = _walk_span(
                s1_blk,
                s2e_span[:Bt],
                sub_tops,
                l2_rows,
                i0,
                m,
                n,
                scores,
                is_local,
                interpret,
                i,
                j,
            )
            codes.extend(sub_codes)
            if not done:
                if blk == 0:
                    return codes, i, j, False
                blk -= 1
        return codes, i, j, True

    max_steps = R + Ln + 1
    # Prefetching keeps TWO dirs bitmaps live; past ~4.5 GB each the
    # pair would crowd out the 16 GB HBM, so walk unprefetched (the
    # hidden latency is one host round-trip per block — noise next to
    # a multi-GB refill; chr12-width leaves sit just under the gate
    # and measured fine with both buffers live). Locals never
    # prefetch: they may stop in ANY block, discarding the
    # speculative fill.
    refill_bytes = (R + Ln + 1) * round_up(R + 1, 1024) // 4
    prefetch_ok = (not is_local) and refill_bytes <= REFILL_BYTES_CAP

    def refill(b: int, jcap: int):
        i0 = i_base + b * R
        r0 = b * R
        Bt = min(Ln, round_up(max(jcap, 1), quantum))
        res = gotoh_rowblock_pallas(
            s1e_span[r0 : r0 + R],
            s2e_span[:Bt],
            tops[b][:, : Bt + 1],
            np.int32(m),
            np.int32(n),
            np.int32(i0),
            scores,
            is_local,
            emit_dirs=True,
            emit_bottom=False,
            interpret=interpret,
        )
        return res, i0

    res, i0 = refill(blk, j)
    while not done:
        if blk > 0 and prefetch_ok:
            nxt = refill(blk - 1, j)
        blk_codes, i_f, j_f, done_f = device_walk(
            res.dirs,
            np.int32(i - i0),
            np.int32(j),
            np.int32(i0),
            max_steps=max_steps,
            interpret=interpret,
        )
        codes.append(blk_codes)
        i, j, done = int(i_f), int(j_f), bool(done_f)
        # device_walk only returns on terminate/exit (it resumes a
        # filled buffer internally and raises on zero progress), so
        # the remaining failure mode is exiting past the first block.
        if not done and blk == 0:
            return codes, i, j, False
        if not done:
            res, i0 = nxt if prefetch_ok else refill(blk - 1, j)
            blk -= 1
    return codes, i, j, True


def align_checkpointed(
    seq1: Sequence,
    seq2: Sequence,
    scores: Scores,
    is_local: bool = False,
    block_rows: int = 8191,
    interpret: bool = False,
    l2_rows: int | None = None,
) -> AlignedSequences:
    """Full global/local alignment with O((m/R + R) * n) device memory.

    Both passes use the lean row-block kernel (``ops/gotoh_rowblock``,
    same results as the tile kernel — pinned by tests): the forward
    pass emits each block's bottom row as the next block's top
    boundary, and the backward pass refills crossed blocks with packed
    dirs (no bottom) and walks them on device. Size ``block_rows`` so
    R+1 is a multiple of 1024 (the lean kernel's lane vector covers
    R+1 rows rounded up to 1024).

    ``l2_rows`` enables the HIERARCHICAL backward (two checkpoint
    levels) for chromosome-scale pairs: ``block_rows`` becomes the
    coarse level (sized for forward-pass throughput — the wavefront
    runs ``NB * (R + n)`` diagonal steps, so tall blocks amortize the
    per-block ``n``; ~96k rows is the measured chr12 sweet spot) and
    crossed blocks are re-checkpointed at ``l2_rows`` granularity
    before their dirs bitmaps materialize (``_walk_span``). Requires
    ``block_rows % l2_rows == 0``; size both so each +1 is a multiple
    of 1024 (e.g. 12*8191 + 11 = 98303 wastes lanes — use 98292).
    """
    if l2_rows is not None and block_rows % l2_rows:
        # Checked again in _walk_span; failing here saves the whole
        # forward pass (the precondition needs only the arguments).
        raise ValueError(
            f"hierarchical walk needs block_rows ({block_rows}) to be "
            f"a multiple of l2_rows ({l2_rows})"
        )
    m, n = len(seq1), len(seq2)
    R = block_rows
    Lm = max(round_up(m, R), R)
    Ln = max(round_up(n, 128), 128)
    NB = Lm // R
    s1e = seq1.encoded(pad_to=Lm, pad_value=PAD_S1)
    s2e = seq2.encoded(pad_to=Ln, pad_value=PAD_S2)

    # ---- forward: fill blocks, checkpoint each block's top row ----
    t0 = time.perf_counter()
    tops, best, at_mn = _forward_blocks(
        s1e, s2e, m, n, R, NB, scores, is_local, interpret,
        keep_tops=True, lean=True,
    )
    t_fwd = time.perf_counter() - t0

    if is_local:
        score, start_i, start_j = best
    else:
        score, start_i, start_j = at_mn, m, n

    # ---- backward: refill crossed blocks with dirs, walk on device ----
    # (column truncation / prefetch / hierarchical re-checkpointing:
    # see _walk_span.)
    t0 = time.perf_counter()
    codes, i, j, done = _walk_span(
        s1e,
        s2e,
        tops,
        R,
        0,
        m,
        n,
        scores,
        is_local,
        interpret,
        start_i,
        start_j,
        l2_rows=l2_rows,
    )
    if not done:
        raise RuntimeError(
            f"traceback left block 0 at ({i}, {j}) without terminating"
        )
    t_bwd = time.perf_counter() - t0
    log.info(
        "[LongAlign] %dx%d in %d blocks of %d rows: forward %.2fs, "
        "traceback %.2fs",
        m,
        n,
        NB,
        R,
        t_fwd,
        t_bwd,
    )

    all_codes = np.concatenate(codes) if codes else np.zeros(0, np.uint8)
    return classify_moves(all_codes, start_i, start_j, score, seq1, seq2)
