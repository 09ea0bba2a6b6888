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
SURVEY §2.4-9) can hold.

Round 5 — **full traceback across the mesh** (``align_sharded``), not
just scores: the same tile pipeline runs a checkpointing forward
(``sharded_fill_checkpoints``) in which every device retains the top
row and left column of each tile it fills — exactly the boundary
values that already flow through the pipeline (tops arrive by
``ppermute`` from the row-shard above; lefts are the previous tile's
streamed right column), so the capture costs no extra collective or
kernel work. The backward pass then walks the path shard by shard:
each crossed row-shard refills a narrow column WINDOW (left boundary
= the captured tile-entry column at stride B, top boundary = the
shard's captured top row sliced to the window) with packed dirs and
chases it on device — the single-chip windowed scheme
(``models/longalign``) with the checkpoint stride set by the tile
grid. A walk that out-runs its window exits LEFT and resumes one
stride wider; an upward exit hands off to the shard above. Path and
stats are bit-identical to the single-chip aligner (pinned by
``tests/test_longseq.py`` on the CPU mesh and the driver's
``dryrun_multichip``). Reference anchor: ``algo.rs:287-441`` — the
alignment, not just the score, is the product.
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


class ShardedFill(NamedTuple):
    """Checkpointing sharded forward result (see ``align_sharded``).

    tops: (P*C, 3, B+1) — tile (p, c) entry TOP row (row p*R, cols
      c*B..(c+1)*B) at index p*C + c.
    lefts: (P*C, 3, R) — tile (p, c) entry LEFT column (col c*B, rows
      p*R+1..(p+1)*R).
    """

    score: jax.Array
    best: jax.Array
    tops: jax.Array
    lefts: jax.Array


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
    emit_ckpt: bool = False,
):
    """Per-device pipeline body (call inside shard_map over axis_name).

    ``engine="pallas"`` fills each tile with the streamed-boundary
    Pallas wavefront kernel (``gotoh_tile_pallas`` with
    ``emit_bottom``/``emit_right``) — the flagship single-chip engine
    driving the multi-chip pipeline; ``"scan"`` uses the plain-JAX
    ``tile_fill`` oracle (CPU/tests fallback).

    ``emit_ckpt``: additionally return each tile's entry (top, left)
    boundaries — the values already flowing through the pipeline —
    keyed by column-block index (``ShardedFill``); the backward pass
    of ``align_sharded`` refills traceback windows from them.
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
    top_steps: list[jax.Array] = []
    left_steps: list[jax.Array] = []

    for t in range(P_ + C - 1):
        c = t - p
        j0 = vary(c * B, vma_axes)
        j0c = jnp.clip(j0, 0, N - B)
        top0 = global_boundary_top(j0, B, scores)
        top = jnp.where(p == 0, top0, top_recv)
        if emit_ckpt:
            # Tile c of this device runs at step t = p + c: record the
            # boundaries in use; a post-loop gather at p + arange(C)
            # picks exactly the active steps.
            top_steps.append(top)
            left_steps.append(left)
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
    if emit_ckpt:
        idx = p + jnp.arange(C, dtype=jnp.int32)
        tops_dev = jnp.take(jnp.stack(top_steps), idx, axis=0)
        lefts_dev = jnp.take(jnp.stack(left_steps), idx, axis=0)
        return ShardedFill(
            score=score,
            best=jnp.stack([bv, bi, bj]),
            tops=tops_dev,
            lefts=lefts_dev,
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


@functools.lru_cache(maxsize=64)
def _sharded_ckpt_fn(
    mesh, axis_name, C, engine, interpret, is_local, scores_tuple
):
    """Cached jitted checkpointing forward (see ``_sharded_fn``)."""
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
                emit_ckpt=True,
            ),
            mesh=mesh,
            in_specs=(P(axis_name), P(), P(), P()),
            out_specs=ShardedFill(
                score=P(),
                best=P(),
                tops=P(axis_name),
                lefts=P(axis_name),
            ),
            check_vma=not (engine == "pallas" and interpret),
        )
    )


def sharded_fill_checkpoints(
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
) -> ShardedFill:
    """The checkpointing sharded forward under ``align_sharded``.

    Same contract as :func:`sharded_gotoh_score` plus per-tile entry
    boundary captures (``ShardedFill.tops``/``lefts``).
    """
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "scan"
    P_ = mesh.shape[axis_name]
    C = n_blocks or P_
    fn = _sharded_ckpt_fn(
        mesh, axis_name, C, engine, interpret, is_local,
        scores.as_tuple(),
    )
    return fn(
        s1e, s2e, jnp.asarray(m, jnp.int32), jnp.asarray(n, jnp.int32)
    )


def _refill_and_walk_shard(
    s1_rows: "object",
    s2_win: "object",
    top_w: "object",
    left_col: "object",
    m: int,
    i0: int,
    jc: int,
    Bt: int,
    i: int,
    j: int,
    scores: Scores,
    is_local: bool,
    interpret: bool,
    sub_rows: int,
):
    """Refill one row-shard's traceback window and walk it.

    When the shard is taller than ``sub_rows`` (the windowed refill's
    VMEM budget), a window-local sub-forward (no dirs) first rebuilds
    the sub-block top rows from the shard's captured boundaries, then
    the walk proceeds bottom-up through per-sub-block dirs refills —
    the single-chip two-level scheme confined to the window. Returns
    ``(codes_list, i, j, done)`` with (i, j) global.
    """
    import numpy as np

    from genomics_rs_tpu.ops.gotoh_rowblock import gotoh_rowblock_pallas
    from genomics_rs_tpu.ops.traceback_device import device_walk
    from genomics_rs_tpu.sequence import round_up

    R = int(np.shape(s1_rows)[0])
    codes: list = []
    if R <= sub_rows:
        sub_tops = [top_w]
        subs = [(0, R)]
    else:
        Rs = sub_rows
        NBs = -(-R // Rs)
        subs = [(k * Rs, min(Rs, R - k * Rs)) for k in range(NBs)]
        sub_tops = [top_w]
        top_cur = jnp.asarray(top_w, jnp.int32)
        for k, (r0, rk) in enumerate(subs[:-1]):
            res = gotoh_rowblock_pallas(
                s1_rows[r0 : r0 + rk],
                s2_win,
                top_cur,
                np.int32(m),
                np.int32(Bt),
                np.int32(i0 + r0),
                scores,
                is_local,
                emit_dirs=False,
                emit_bottom=True,
                left=(
                    jnp.asarray(left_col[:, r0 : r0 + rk], jnp.int32)
                    if jc > 0
                    else None
                ),
                interpret=interpret,
            )
            top_cur = res.bottom
            sub_tops.append(top_cur)

    # Walk sub-blocks bottom-up from (i, j).
    kb = next(
        kk
        for kk, (r0, rk) in enumerate(subs)
        if i0 + r0 < max(i, 1) <= i0 + r0 + rk
    )
    while True:
        r0, rk = subs[kb]
        V = max(round_up(rk + 1, 1024), 1024)
        res = gotoh_rowblock_pallas(
            s1_rows[r0 : r0 + rk],
            s2_win,
            jnp.asarray(sub_tops[kb], jnp.int32),
            np.int32(m),
            np.int32(Bt),
            np.int32(i0 + r0),
            scores,
            is_local,
            emit_dirs=True,
            emit_bottom=False,
            left=(
                jnp.asarray(left_col[:, r0 : r0 + rk], jnp.int32)
                if jc > 0
                else None
            ),
            interpret=interpret,
        )
        blk_codes, i_f, j_f, done = device_walk(
            res.dirs,
            np.int32(i - (i0 + r0)),
            np.int32(j - jc),
            np.int32(i0 + r0),
            max_steps=rk + 2 * V + 1,
            interpret=interpret,
            j0=jc,
        )
        codes.append(np.asarray(blk_codes))
        i = int(i_f)
        j = int(j_f) + jc
        if bool(done):
            return codes, i, j, True
        if i < i0 + r0:
            if kb == 0:
                return codes, i, j, False  # exits the shard upward
            kb -= 1
        elif int(j_f) == 0 and jc > 0:
            return codes, i, j, False  # left exit: caller widens
        else:
            raise RuntimeError(
                f"sharded traceback stalled at ({i}, {j})"
            )


def align_sharded(
    mesh: jax.sharding.Mesh,
    seq1,
    seq2,
    scores: Scores,
    is_local: bool = False,
    axis_name: str = SEQ_AXIS,
    n_blocks: int | None = None,
    engine: str = "auto",
    interpret: bool = False,
    sub_rows: int = 65535,
):
    """FULL alignment (path + stats) of one long pair with its DP rows
    sharded over ``axis_name`` — the multi-chip counterpart of
    ``models/longalign.align_checkpointed`` (module docstring; round 5,
    closing the "multi-chip is score-only" gap). Bit-identical to the
    single-chip aligners.

    The forward is the collective tile pipeline
    (:func:`sharded_fill_checkpoints`); the backward walks shard by
    shard through narrow windowed dirs refills seeded by the captured
    tile boundaries. ``sub_rows`` bounds one refill's lane vector
    (VMEM); taller shards rebuild sub-block tops inside the window
    first.
    """
    import numpy as np

    from genomics_rs_tpu.ops.traceback import classify_moves
    from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, round_up

    P_ = mesh.shape[axis_name]
    C = n_blocks or P_
    m, n = len(seq1), len(seq2)
    R = max(round_up(m, 128 * P_), 128 * P_) // P_
    Lm = R * P_
    Ln = max(round_up(n, 128 * C), 128 * C)
    B = Ln // C
    s1e = seq1.encoded(pad_to=Lm, pad_value=PAD_S1)
    s2e = seq2.encoded(pad_to=Ln, pad_value=PAD_S2)

    fill = sharded_fill_checkpoints(
        mesh, s1e, s2e, m, n, scores,
        is_local=is_local, axis_name=axis_name, n_blocks=C,
        engine=engine, interpret=interpret,
    )
    tops = np.asarray(fill.tops)  # (P*C, 3, B+1) host copies: cheap
    lefts = np.asarray(fill.lefts)  # (P*C, 3, R)
    if is_local:
        score, start_i, start_j = (int(x) for x in np.asarray(fill.best))
    else:
        score, start_i, start_j = int(fill.score), m, n

    # Full top row per shard: tile tops overlap by one column (tile
    # c's col B == tile c+1's col 0) — concatenate the first B of
    # each plus the final column.
    def shard_top_full(p: int) -> np.ndarray:
        parts = [tops[p * C + c][:, :B] for c in range(C)]
        parts.append(tops[p * C + C - 1][:, B:])
        return np.concatenate(parts, axis=1)  # (3, Ln+1)

    codes_all: list[np.ndarray] = []
    i, j = start_i, start_j
    done = i == 0 and j == 0
    shard = max(0, (i - 1) // R) if not done else 0
    top_cache: dict[int, np.ndarray] = {}
    while not done:
        i0 = shard * R
        jc = max(0, (j // B - 1) * B)
        Bt = min(Ln - jc, round_up(max(j - jc, 1), B))
        if shard not in top_cache:
            top_cache[shard] = shard_top_full(shard)
        top_w = top_cache[shard][:, jc : jc + Bt + 1]
        left_col = lefts[shard * C + jc // B]
        codes, i, j, term = _refill_and_walk_shard(
            s1e[i0 : i0 + R],
            s2e[jc : jc + Bt],
            top_w,
            left_col,
            m,
            i0,
            jc,
            Bt,
            i,
            j,
            scores,
            is_local,
            interpret,
            sub_rows,
        )
        codes_all.extend(codes)
        if term:
            break
        if i < i0:
            if shard == 0:
                raise RuntimeError(
                    f"sharded traceback left shard 0 at ({i}, {j})"
                )
            shard -= 1
        elif j == jc and jc > 0:
            pass  # left exit: loop recomputes a wider window
        elif j <= jc and jc == 0:
            raise RuntimeError(
                f"sharded traceback hit the left edge at ({i}, {j})"
            )

    all_codes = (
        np.concatenate(codes_all) if codes_all else np.zeros(0, np.uint8)
    )
    return classify_moves(
        all_codes, start_i, start_j, score, seq1, seq2
    )
