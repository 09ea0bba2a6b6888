"""Checkpointed linear-space alignment with full traceback.

The reference materialises 48 B/cell (SURVEY §2.4-9: ~43 GB for one
30 kb pair), and even our 2-bit direction bitmap tops out around
60 kb pairs in one chip's HBM. This driver removes the ceiling:

1. **Forward pass** — the table is filled as full-width row blocks of
   ``block_rows`` rows through the lean row-block Pallas kernel;
   each block's input top row is checkpointed (O((m/R) * n) int32),
   and — round 4 — so is every COLUMN at stride V (the kernel's lane
   count; ``emit_cols``, one compare + three selects per step).
2. **Backward pass** — walking from the end cell, each crossed block
   is refilled over a narrow column WINDOW ending at the walk's entry
   column (left boundary = the nearest captured column at least V to
   the left; top boundary = the checkpointed row sliced to the
   window), its 2-bit direction bitmap is chased on device
   (``ops/traceback_device.device_walk`` with a left-exit guard), and
   only O(m+n) move codes ever reach the host. A walk that consumes
   more than the window's columns (a long horizontal run) exits LEFT
   and resumes in a window one stride wider — exactness never
   depends on the window guess.

Because every window refill injects exact checkpointed boundary
values, the per-cell direction codes — and therefore the traceback
path, tie-breaks and stats — are bit-identical to a monolithic fill
(verified against ``PairwiseAligner`` in tests/test_longalign.py).

This replaces round 3's two-level re-checkpointing hierarchy: the
windowed backward refills O(m * V) cells instead of O(m * n / 2)
TWICE (nested score pass + full-width dirs refills), so a chr12 x
chr12 alignment (1.16e12 cells, whose monolithic bitmap would be
~290 GB) now spends its time almost entirely in the single forward
pass, with a bounded ~0.8 GB dirs transient per window.
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
    keep_cols: bool = False,
):
    """Shared forward pass over full-width row blocks.

    The whole pass is ONE jitted ``lax.scan`` over blocks (the tile
    kernel is a primitive inside the scan body), so a pair costs a
    single dispatch regardless of block count — dispatch latency
    through remote tunnels would otherwise dominate the pipeline.
    Returns (tops (NB, 3, n+1) | None, cols (NB, NC, 3, V) | None,
    best (v, i, j), at_mn).
    """
    Ln = s2e.shape[0]
    tops, cols, best_dev, at_mn_dev = _fwd_jit(
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
        keep_cols=keep_cols,
    )
    best = (
        tuple(int(x) for x in best_dev) if is_local else (INT_MIN, 0, 0)
    )
    return (
        (tops if keep_tops else None),
        (cols if keep_cols else None),
        best,
        int(at_mn_dev),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "NB", "R", "keep", "loc", "interp", "lean", "keep_cols"
    ),
)
def _fwd_jit(
    s1e, s2e, m, n, scores, top0, i_base, NB, R, keep, loc, interp,
    lean=False, keep_cols=False,
):
    """Module-level jit so the scan+kernel program compiles once per
    shape bucket, not per call (the closure version re-keyed the jit
    cache on function identity every invocation).

    ``lean`` fills blocks with the specialized forward row-block
    kernel (``ops/gotoh_rowblock``) instead of the general tile
    kernel — identical results (pinned by tests), preferred for
    score-only passes with big blocks (``score_long``).

    ``keep_cols`` (lean only) also checkpoints every stride-V column
    of every block (the windowed backward's left boundaries).

    ``top0`` is the I/S/D boundary of row ``i_base`` over columns
    0..len(s2e).
    """
    if keep_cols and not lean:
        raise ValueError("keep_cols requires the lean kernel")
    s1_blocks = s1e.reshape(NB, R)

    def body(top, xs):
        s1_blk, b = xs
        i0 = i_base + b * R
        if lean:
            res = gotoh_rowblock_pallas(
                s1_blk, s2e, top, m, n, i0, scores, loc,
                emit_cols=keep_cols,
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
            res.cols if keep_cols else jnp.int32(0),
            jnp.stack(res.best),
            res.score_at_mn,
        )
        return res.bottom, ys

    _, (tops, cols, bests, at_mns) = jax.lax.scan(
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
    return tops, cols, (vmax, i_best, j_best), at_mn


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
    _, _, best, at_mn = _forward_blocks(
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


@functools.partial(jax.jit, static_argnames=("Bt", "R", "V"))
def _slice_window(tops, cols, blk, jc, Bt, R, V):
    """(top slice (3, Bt+1), left column (3, R)) for one window.

    One jitted dynamic-slice program per (Bt, R) bucket with TRACED
    block/column starts: host-level `tops[blk][:, jc:...]` indexing
    would compile a fresh XLA slice executable for every distinct
    (blk, jc) constant — ~NB programs through the remote-compile
    tunnel per alignment, which is where the first cut of this path
    spent (wedged) its time.
    """
    blk = jnp.asarray(blk, jnp.int32)
    jc = jnp.asarray(jc, jnp.int32)
    top_w = jax.lax.dynamic_slice(
        tops, (blk, jnp.int32(0), jc), (1, 3, Bt + 1)
    )[0]
    left = jax.lax.dynamic_slice(
        cols,
        (blk, jc // V, jnp.int32(0), jnp.int32(1)),
        (1, 1, 3, R),
    )[0, 0]
    return top_w, left


def _walk_span_windowed(
    s1e,
    s2e,
    tops,
    cols,
    R: int,
    m: int,
    n: int,
    scores: Scores,
    is_local: bool,
    interpret: bool,
    i: int,
    j: int,
):
    """Walk the traceback upward through windowed block refills.

    ``tops[b]`` is the checkpointed I/S/D of row ``b*R`` over columns
    0..Ln; ``cols[b, c]`` the captured I/S/D of column ``c*V`` over
    the block's lanes (V = the kernel lane count for ``R``). For each
    crossed block the refill covers only columns ``[jc, j]`` where
    ``jc`` is the nearest captured column at least V left of the
    entry column ``j`` — the walk has >= V columns of room, and a
    rare longer horizontal run exits LEFT and resumes one stride
    wider. Returns the move codes in walk order.
    """
    codes: list[np.ndarray] = []
    if i == 0 and j == 0:
        return codes
    Ln = s2e.shape[0]
    V = max(round_up(R + 1, 1024), 1024)
    blk = max(0, (i - 1) // R)
    max_steps = R + 2 * V + 1
    while True:
        i0 = blk * R
        # Window floor: >= V columns of walking room below the entry
        # column (j // V - 1 strides), clamped at the true left edge.
        jc = max(0, (j // V - 1) * V)
        # Width quantized to V so length-neighbouring windows share
        # the compiled kernel (at most ~3 variants per pair shape).
        Bt = min(Ln - jc, round_up(max(j - jc, 1), V))
        top_w, left = _slice_window(tops, cols, blk, jc, Bt, R, V)
        res = gotoh_rowblock_pallas(
            s1e[i0 : i0 + R],
            s2e[jc : jc + Bt],
            top_w,
            np.int32(m),
            np.int32(Bt),
            np.int32(i0),
            scores,
            is_local,
            emit_dirs=True,
            emit_bottom=False,
            left=left if jc > 0 else None,
            interpret=interpret,
        )
        blk_codes, i_f, j_f, done = device_walk(
            res.dirs,
            np.int32(i - i0),
            np.int32(j - jc),
            np.int32(i0),
            max_steps=max_steps,
            interpret=interpret,
            j0=jc,
        )
        codes.append(blk_codes)
        i, j_local, done = int(i_f), int(j_f), bool(done)
        j = j_local + jc
        if done:
            return codes
        if i < i0:
            if blk == 0:
                raise RuntimeError(
                    f"traceback left block 0 at ({i}, {j}) without "
                    "terminating"
                )
            blk -= 1
        elif j_local == 0:
            # Left exit: same block, resume in a window one stride
            # wider (the loop recomputes jc from the new j).
            if jc == 0:
                raise RuntimeError(
                    f"traceback hit the left edge at ({i}, {j}) "
                    "without terminating"
                )
        else:
            raise RuntimeError(
                f"traceback stalled at ({i}, {j}) in block {blk}"
            )


def align_checkpointed(
    seq1: Sequence,
    seq2: Sequence,
    scores: Scores,
    is_local: bool = False,
    block_rows: int = 65535,
    interpret: bool = False,
) -> AlignedSequences:
    """Full global/local alignment with O((m/R + R) * V) device memory.

    Both passes use the lean row-block kernel (``ops/gotoh_rowblock``,
    same results as the tile kernel — pinned by tests): the forward
    pass emits each block's bottom row as the next block's top
    boundary and checkpoints stride-V columns (``emit_cols``), and
    the backward pass refills narrow column windows with packed dirs
    and walks them on device (module docstring). Size ``block_rows``
    so R+1 is a multiple of 1024 (the lean kernel's lane vector
    covers R+1 rows rounded up to 1024).
    """
    m, n = len(seq1), len(seq2)
    R = block_rows
    Lm = max(round_up(m, R), R)
    Ln = max(round_up(n, 128), 128)
    NB = Lm // R
    s1e = seq1.encoded(pad_to=Lm, pad_value=PAD_S1)
    s2e = seq2.encoded(pad_to=Ln, pad_value=PAD_S2)

    # ---- forward: fill blocks, checkpoint top rows + stride-V cols --
    t0 = time.perf_counter()
    tops, cols, best, at_mn = _forward_blocks(
        s1e, s2e, m, n, R, NB, scores, is_local, interpret,
        keep_tops=True, lean=True, keep_cols=True,
    )
    t_fwd = time.perf_counter() - t0

    if is_local:
        score, start_i, start_j = best
    else:
        score, start_i, start_j = at_mn, m, n

    # ---- backward: windowed dirs refills, walk on device ----
    t0 = time.perf_counter()
    codes = _walk_span_windowed(
        s1e,
        s2e,
        tops,
        cols,
        R,
        m,
        n,
        scores,
        is_local,
        interpret,
        start_i,
        start_j,
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
