"""Sequence-parallel (wavefront-sharded) Gotoh fill over a mesh axis.

The DP analog of context parallelism (SURVEY §5): rows of the table
are sharded over the ``seq`` mesh axis, each device fills (rows x
column-block) tiles, and tile bottom rows flow to the next device with
ring ``ppermute`` — a software pipeline over the anti-diagonal of the
*tile* grid. After P + C - 1 steps every tile is filled; the global
score at (m, n) and the local argmax (reference last-row-major
tie-break) are merged with ``pmax`` collectives.

Memory per device is O((m/P) + n) — this is the path to chr12-scale
pairs that no single chip (nor the reference's 48 B/cell table,
SURVEY §2.4-9) can hold. Score-only: for a full traceback at this
scale use the checkpointed linear-space driver
(``models/longalign.py::align_checkpointed``).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_tile import (
    INT_MIN,
    TileResult,
    global_boundary_left,
    global_boundary_top,
    tile_fill,
)
from genomics_rs_tpu.parallel.mesh import SEQ_AXIS


class LongSeqResult(NamedTuple):
    score: jax.Array  # global-mode score: cell max at (m, n)
    best: jax.Array  # int32[3]: local argmax (value, i, j)


def _merge_best(a, b):
    """Associative merge with the reference tie-break (larger value,
    then larger i, then larger j)."""
    av, ai, aj = a
    bv, bi, bj = b
    b_wins = (bv > av) | (
        (bv == av) & ((bi > ai) | ((bi == ai) & (bj > aj)))
    )
    return (
        jnp.where(b_wins, bv, av),
        jnp.where(b_wins, bi, ai),
        jnp.where(b_wins, bj, aj),
    )


def _seq_core(
    s1_shard: jax.Array,
    s2_full: jax.Array,
    m: jax.Array,
    n: jax.Array,
    scores: Scores,
    is_local: bool,
    axis_name: str,
    n_blocks: int,
    engine: str = "scan",
    interpret: bool = False,
    vma_axes: tuple[str, ...] = (),
) -> LongSeqResult:
    """Per-device pipeline body (call inside shard_map over axis_name).

    ``engine="pallas"`` fills each tile with the streamed-boundary
    Pallas wavefront kernel (``gotoh_tile_pallas`` with
    ``emit_bottom``/``emit_right``) — the flagship single-chip engine
    driving the multi-chip pipeline; ``"scan"`` uses the plain-JAX
    ``tile_fill`` oracle (CPU/tests fallback).
    """
    from genomics_rs_tpu.ops.gotoh_scan import vary

    R = s1_shard.shape[0]
    N = s2_full.shape[0]
    C = n_blocks
    B = N // C
    assert B * C == N, "s2 length must divide into n_blocks"

    # dynamic_slice requires operand/index varying-axes to match; the
    # replicated inputs must be cast up to the full vma set before
    # being sliced with axis_index-derived (varying) offsets.
    s2_full, m, n = vary((s2_full, m, n), vma_axes)

    P_ = jax.lax.axis_size(axis_name)
    p = jax.lax.axis_index(axis_name)
    i0 = vary(p * R, vma_axes)
    int_min = jnp.int32(INT_MIN)

    left = global_boundary_left(i0, R, scores)
    top_recv = jnp.zeros((3, B + 1), dtype=jnp.int32)
    best = (int_min, jnp.int32(0), jnp.int32(0))
    at_mn = int_min

    perm = [(i, (i + 1) % P_) for i in range(P_)]

    for t in range(P_ + C - 1):
        c = t - p
        j0 = vary(c * B, vma_axes)
        j0c = jnp.clip(j0, 0, N - B)
        top0 = global_boundary_top(j0, B, scores)
        top = jnp.where(p == 0, top0, top_recv)
        s2_block = jax.lax.dynamic_slice(s2_full, (j0c,), (B,))
        if engine == "pallas":
            from genomics_rs_tpu.ops.gotoh_pallas import gotoh_tile_pallas

            pres = gotoh_tile_pallas(
                s1_shard,
                s2_block,
                top,
                left,
                m,
                n,
                i0,
                j0,
                scores,
                is_local,
                emit_dirs=False,
                emit_bottom=True,
                emit_right=True,
                interpret=interpret,
                vma_axes=vma_axes,
            )
            res = TileResult(
                bottom=pres.bottom,
                right=pres.right,
                best=pres.best,
                at_mn=pres.score_at_mn,
            )
        else:
            res = tile_fill(
                s1_shard,
                s2_block,
                top,
                left,
                scores,
                is_local,
                i0,
                j0,
                m,
                n,
                vma_axes=vma_axes,
            )
        active = (c >= 0) & (c < C)
        left = jnp.where(active, res.right, left)
        cand = (
            jnp.where(active, res.best[0], int_min),
            jnp.where(active, res.best[1], 0),
            jnp.where(active, res.best[2], 0),
        )
        best = _merge_best(best, cand)
        at_mn = jnp.maximum(at_mn, jnp.where(active, res.at_mn, int_min))
        top_recv = jax.lax.ppermute(res.bottom, axis_name, perm)

    # Collective merges over the seq axis.
    score = jax.lax.pmax(at_mn, axis_name)
    bv = jax.lax.pmax(best[0], axis_name)
    bi = jax.lax.pmax(
        jnp.where(best[0] == bv, best[1], -1), axis_name
    )
    bj = jax.lax.pmax(
        jnp.where((best[0] == bv) & (best[1] == bi), best[2], -1),
        axis_name,
    )
    return LongSeqResult(
        score=score, best=jnp.stack([bv, bi, bj])
    )


def batched_sharded_scores(
    mesh: jax.sharding.Mesh,
    s1b,
    s2b,
    ms,
    ns,
    scores: Scores,
    is_local: bool = False,
    data_axis: str = "data",
    seq_axis: str = SEQ_AXIS,
    n_blocks: int | None = None,
    engine: str = "scan",
    interpret: bool = False,
) -> LongSeqResult:
    """2-D (data x seq) sharding: pairs over ``data``, each pair's DP
    rows over ``seq`` — composed data- and sequence-parallelism.

    s1b: (Batch, Lm) with Batch divisible by the data-axis size and Lm
    by the seq-axis size; s2b: (Batch, Ln); ms/ns: (Batch,).
    """
    C = n_blocks or mesh.shape[seq_axis]
    fn = _batched_sharded_fn(
        mesh,
        data_axis,
        seq_axis,
        C,
        engine,
        interpret,
        is_local,
        scores.as_tuple(),
    )
    return fn(
        s1b,
        s2b,
        jnp.asarray(ms, jnp.int32),
        jnp.asarray(ns, jnp.int32),
    )


@functools.lru_cache(maxsize=64)
def _batched_sharded_fn(
    mesh, data_axis, seq_axis, C, engine, interpret, is_local, scores_tuple
):
    """Cached jitted builder (see ``_sharded_fn`` for why)."""
    from genomics_rs_tpu.config import Scores

    scores = Scores(*scores_tuple)

    def shard_fn(s1_blk, s2_blk, ms_blk, ns_blk):
        core = partial(
            _seq_core,
            scores=scores,
            is_local=is_local,
            axis_name=seq_axis,
            n_blocks=C,
            engine=engine,
            interpret=interpret,
            vma_axes=(data_axis, seq_axis),
        )
        return jax.vmap(core)(s1_blk, s2_blk, ms_blk, ns_blk)

    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P(data_axis, seq_axis),
                P(data_axis),
                P(data_axis),
                P(data_axis),
            ),
            out_specs=LongSeqResult(score=P(data_axis), best=P(data_axis)),
            # Pallas *interpret* mode slices varying block operands
            # with invariant grid indices internally, which the vma
            # checker rejects (JAX suggests check_vma=False as the
            # workaround). Compiled paths — scan everywhere, pallas on
            # TPU — keep the static safety net on.
            check_vma=not (engine == "pallas" and interpret),
        )
    )


def sharded_gotoh_score(
    mesh: jax.sharding.Mesh,
    s1e,
    s2e,
    m,
    n,
    scores: Scores,
    is_local: bool = False,
    axis_name: str = SEQ_AXIS,
    n_blocks: int | None = None,
    engine: str = "auto",
    interpret: bool = False,
) -> LongSeqResult:
    """Score one (long) pair with rows sharded over ``axis_name``.

    ``s1e`` length must be divisible by the axis size; ``s2e`` length
    by ``n_blocks`` (defaults to the axis size). Pad with
    ``PAD_S1``/``PAD_S2`` and pass true lengths in ``m``/``n``.
    """
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "scan"
    P_ = mesh.shape[axis_name]
    C = n_blocks or P_
    m = jnp.asarray(m, jnp.int32)
    n = jnp.asarray(n, jnp.int32)

    fn = _sharded_fn(
        mesh, axis_name, C, engine, interpret, is_local, scores.as_tuple()
    )
    return fn(s1e, s2e, m, n)


@functools.lru_cache(maxsize=64)
def _sharded_fn(
    mesh, axis_name, C, engine, interpret, is_local, scores_tuple
):
    """Build-and-cache the jitted sharded pipeline.

    Rebuilding ``shard_map`` per call would re-trace and re-lower the
    whole pipeline (including a remote Mosaic lowering round-trip on
    this environment's tunnel) on EVERY invocation — measured ~1000x
    over the kernel's steady-state cost. The cache key is the static
    configuration; arrays flow through the jitted callee.
    """
    from genomics_rs_tpu.config import Scores

    scores = Scores(*scores_tuple)
    return jax.jit(
        jax.shard_map(
            partial(
                _seq_core,
                scores=scores,
                is_local=is_local,
                axis_name=axis_name,
                n_blocks=C,
                engine=engine,
                interpret=interpret,
                vma_axes=(axis_name,),
            ),
            mesh=mesh,
            in_specs=(P(axis_name), P(), P(), P()),
            out_specs=LongSeqResult(score=P(), best=P()),
            # See batched_sharded_scores: vma checking stays on except
            # for the pallas-interpret test combination (JAX
            # limitation).
            check_vma=not (engine == "pallas" and interpret),
        )
    )
