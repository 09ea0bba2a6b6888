"""Batched + sharded alignment scoring.

TPU-native replacement for the reference's rayon fan-out
(``/root/reference/src/main.rs:245-261``): instead of threads mutating
a shared matrix, fixed-shape *batches* of encoded pairs are scored with
a ``vmap``-ed wavefront fill, and batches are sharded over the mesh's
``data`` axis with ``shard_map``; global statistics are merged with
``psum``/``pmax`` collectives over ICI rather than shared memory.

Score-only mode (``emit_dirs=False``) keeps per-pair state O(m+n), so
thousands of ~30 kb pairs batch comfortably in HBM; pairs that need a
full traceback re-run the single-pair path with the direction bitmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.parallel.mesh import DATA_AXIS


class BatchScores(NamedTuple):
    """Per-pair results plus collectively-merged batch statistics.

    score:    int32[B]  alignment score per pair.
    start_i:  int32[B]  retrace start row (m for global, argmax local).
    start_j:  int32[B]  retrace start col.
    max_score: int32    max score across the whole (global) batch.
    total_cells: float32  total true DP cells across the batch (float:
        int32 would overflow past ~2 CoV pairs and x64 is off by default).
    """

    score: jax.Array
    start_i: jax.Array
    start_j: jax.Array
    max_score: jax.Array
    total_cells: jax.Array


def _score_one(s1e, s2e, m, n, scores: Scores, is_local: bool, vma_axes=()):
    res = gotoh_fill_scan(
        s1e, s2e, m, n, scores, is_local, emit_dirs=False, vma_axes=vma_axes
    )
    return res.score, res.start_i, res.start_j


def batch_scores(
    s1eb: jax.Array,
    s2eb: jax.Array,
    ms: jax.Array,
    ns: jax.Array,
    scores: Scores,
    is_local: bool,
    vma_axes: tuple[str, ...] = (),
) -> BatchScores:
    """Score a batch of pairs on one device (vmap over the fill)."""
    import functools

    fn = functools.partial(_score_one, vma_axes=vma_axes)
    sc, si, sj = jax.vmap(fn, in_axes=(0, 0, 0, 0, None, None))(
        s1eb, s2eb, ms, ns, scores, is_local
    )
    cells = jnp.sum(
        (ms.astype(jnp.float32) + 1) * (ns.astype(jnp.float32) + 1)
    )
    return BatchScores(sc, si, sj, jnp.max(sc), cells)


def batch_scores_sharded(
    mesh: jax.sharding.Mesh,
    s1eb: jax.Array,
    s2eb: jax.Array,
    ms: jax.Array,
    ns: jax.Array,
    scores: Scores,
    is_local: bool,
    axis_name: str = DATA_AXIS,
) -> BatchScores:
    """Shard the batch over ``axis_name`` and merge stats with collectives.

    The batch dimension must be divisible by the mesh axis size (use
    :func:`pad_batch`). Per-pair outputs come back sharded over the
    same axis; ``max_score``/``total_cells`` are replicated via
    ``pmax``/``psum`` over ICI — the TPU-native version of the
    reference's shared-memory matrix writes.
    """

    def shard_fn(s1eb, s2eb, ms, ns):
        local = batch_scores(
            s1eb, s2eb, ms, ns, scores, is_local, vma_axes=(axis_name,)
        )
        return BatchScores(
            score=local.score,
            start_i=local.start_i,
            start_j=local.start_j,
            max_score=jax.lax.pmax(local.max_score, axis_name),
            total_cells=jax.lax.psum(local.total_cells, axis_name),
        )

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=BatchScores(
            score=P(axis_name),
            start_i=P(axis_name),
            start_j=P(axis_name),
            max_score=P(),
            total_cells=P(),
        ),
    )
    return sharded(s1eb, s2eb, ms, ns)


#: Below this padded length the row-scan read kernel beats the
#: diagonal batch kernel (whose flat-diagonal lanes go mostly idle).
#: Bounded by the shortread kernel's VMEM footprint (~6 row-pane
#: scratch buffers of L2*4 KiB + in/out blocks): 256 keeps it near
#: ~11 MiB; 512 would exceed the ~16 MiB core budget.
SHORTREAD_MAX_LEN = 256

#: Above SHORTREAD_MAX_LEN and up to this padded length the
#: row-segmented kernel (8 pairs per register pane,
#: ``ops/gotoh_segmented.py``) beats the flat diagonal kernel — by
#: 3.9x at 1 kb, 3.0x at 2 kb, 2.4x at 4 kb and still 1.7x at 8 kb
#: (measured, see the crossover table in that module's docstring).
SEGMENTED_MAX_LEN = 8192

#: In GLOBAL mode, above this padded length (and within the segmented
#: band) the row-stacked 8-stream kernel (``ops/gotoh_stream8.py``)
#: beats the row-segmented kernel: 1.32x at 2 kb, 1.16x at 4 kb,
#: 1.19x at 8 kb (measured on a v5e chip, batches sized ~2e9 cells).
#: At/below 1 kb it's a wash (1.04x) and at 512 a loss (0.94x); in
#: LOCAL mode it loses everywhere (0.67-1.03x — the candidate-mask +
#: flush machinery adds per-step pane ops), so local stays segmented.
STREAM8_MIN_LEN = 1024


def score_pairs(
    s1b,
    s2b,
    ms,
    ns,
    scores: Scores,
    is_local: bool = False,
    engine: str = "auto",
):
    """Score a batch of encoded pairs, picking the best kernel.

    engine: "auto" (TPU: shortread for read-scale pairs, row-segmented
    for the mid-length band — with the row-stacked 8-stream kernel
    taking the global-mode upper half of that band, see
    STREAM8_MIN_LEN — the streamed multi-segment kernel for long-pair
    batches — measured ~1.8x the flat kernel on the 55-pair corpus,
    global and local — and the flat diagonal batch kernel otherwise;
    CPU: vmap scan), or one of "shortread", "segmented", "stream8",
    "stream", "pallas", "scan".

    Returns (score, start_i, start_j) arrays of shape (B,).
    """
    L = max(s1b.shape[1], s2b.shape[1])
    if engine == "auto":
        if jax.default_backend() == "tpu":
            if L <= SHORTREAD_MAX_LEN:
                engine = "shortread"
            elif s1b.shape[1] <= SEGMENTED_MAX_LEN:
                if (
                    not is_local
                    and s1b.shape[1] > STREAM8_MIN_LEN
                    and s1b.shape[0] >= 2
                ):
                    engine = "stream8"
                else:
                    engine = "segmented"
            elif s1b.shape[0] >= 2:
                engine = "stream"
            else:
                engine = "pallas"
        else:
            engine = "scan"
    if engine == "stream":
        from genomics_rs_tpu.ops.gotoh_stream import gotoh_scores_stream

        return gotoh_scores_stream(s1b, s2b, ms, ns, scores, is_local)
    if engine == "stream8":
        from genomics_rs_tpu.ops.gotoh_stream8 import (
            gotoh_scores_stream8,
        )

        return gotoh_scores_stream8(s1b, s2b, ms, ns, scores, is_local)
    if engine == "shortread":
        from genomics_rs_tpu.ops.gotoh_shortread import (
            gotoh_scores_shortread,
        )

        return gotoh_scores_shortread(s1b, s2b, ms, ns, scores, is_local)
    if engine == "segmented":
        from genomics_rs_tpu.ops.gotoh_segmented import (
            gotoh_scores_segmented,
        )

        return gotoh_scores_segmented(s1b, s2b, ms, ns, scores, is_local)
    if engine == "pallas":
        from genomics_rs_tpu.ops.gotoh_pallas import (
            gotoh_scores_pallas_batch,
        )

        return gotoh_scores_pallas_batch(s1b, s2b, ms, ns, scores, is_local)
    out = batch_scores(s1b, s2b, ms, ns, scores, is_local)
    return out.score, out.start_i, out.start_j


def pad_batch(arrs, batch: int, multiple: int, pad_values=None):
    """Pad leading batch dim of every array in ``arrs`` up to a multiple.

    ``pad_values[i]`` fills array i's padding rows; ``None`` replicates
    row 0. Pass 0 for the length arrays so padding rows are trivial
    (1x1) fills that don't inflate cell-count statistics; padded
    scores are discarded either way. Returns (padded arrays, padded
    batch size).
    """
    import numpy as np

    pb = -(-batch // multiple) * multiple
    if pb == batch:
        return arrs, batch
    if pad_values is None:
        pad_values = [None] * len(arrs)
    out = []
    for a, pv in zip(arrs, pad_values):
        if pv is None:
            pad = np.broadcast_to(a[:1], (pb - batch,) + a.shape[1:])
        else:
            pad = np.full((pb - batch,) + a.shape[1:], pv, dtype=a.dtype)
        out.append(np.concatenate([a, pad], axis=0))
    return out, pb
