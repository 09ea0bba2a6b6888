"""Pallas TPU wavefront kernel for the Gotoh affine-gap fill.

Same semantics as the ``lax.scan`` oracle (``gotoh_scan.py`` — which
itself mirrors ``/root/reference/src/alignment/algo.rs:151-282`` and
its quirks, SURVEY §2.4), but engineered for the TPU VPU:

* The anti-diagonal state (I/S/D of the previous two diagonals) lives
  in VMEM scratch for the whole sweep — no HBM round-trips between
  diagonals.
* Flat diagonal vectors of length ``V`` are laid out as ``(8, V//8)``
  (sublane x lane), so every vector op uses all 8 sublanes of the VPU
  instead of 1/8 of them. The DP shift "cell (i-1, *)" becomes a
  lane-roll plus a sublane-roll fixup for the 8 row-boundary lanes.
* ``s2[k-1-i]`` (the base consumed on diagonal k at row i) is *not* a
  gather: it is carried as a vector that shifts together with the
  wavefront, with one scalar injected per step.
* Carries are factored through max (which commutes with the shift):
  I, D, P = max(S, D), Q = max(I, S) are carried and the (i-1, j-1)
  predecessor max arrives as shift(M) = max(shQ, shD) cached from the
  previous step — two flat shifts per step instead of three, and a
  third fewer max-tree ops.
* The local-alignment argmax is tracked *per lane* (value + diagonal
  index) with pure vector ops; the cross-lane reduction to the
  reference's "last row-major argmax" (``algo.rs:311-322``) happens
  once, outside the kernel.
* Direction codes are written as uint8 to a ``(CHUNK, 8, V//8)``
  output block per grid step, streaming the 2-bit traceback bitmap to
  HBM while the next chunk computes.

The grid is 1-D over chunks of ``CHUNK`` anti-diagonals; TPU grid
iterations are sequential on a core, so VMEM scratch carries the
wavefront across grid steps.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_scan import (
    DIR_DEL,
    DIR_INS,
    DIR_STOP,
    DIR_SUB,
    INT_MIN,
    NEG_INF,
    FillResult,
)
from genomics_rs_tpu.ops.subst import (
    encode_chars,
    kimura_active,
    sentinel,
    sub_score,
)

#: sublane count of the flat diagonal layout.
ROWS = 8
#: direction codes packed per int32 word along the diagonal axis.
PACK = 16


def drift_rate_or_none(scores) -> int | None:
    """Worst-case per-diagonal drift of an unclamped garbage lane, or
    None when the scoring params are traced (guards must then be
    skipped and the caller fall back / trust the clamped path).

    Shared by the flat, streamed and row-stacked wrappers so the int32
    headroom bound lives in one place.
    """
    try:
        st = getattr(scores, "s_transition", None)
        return (
            abs(int(scores.g))
            + abs(int(scores.h))
            + abs(int(scores.s_mismatch))
            + abs(int(scores.s_match))
            + (abs(int(st)) if st is not None else 0)
            + 1
        )
    except jax.errors.ConcretizationTypeError:
        return None


def concrete_lengths_or_none(ms, ns):
    """``(ms, ns)`` as int64 numpy, or None when traced — the streamed
    wrappers place probes from concrete lengths and must fall back to
    a traced-length kernel otherwise."""
    try:
        return (
            np.asarray(ms, dtype=np.int64),
            np.asarray(ns, dtype=np.int64),
        )
    except (
        jax.errors.ConcretizationTypeError,
        jax.errors.TracerArrayConversionError,
    ):
        return None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _Shapes(NamedTuple):
    V: int  # flat diagonal vector length (multiple of 1024)
    C: int  # V // 8 (lane count per sublane row, multiple of 128)
    K: int  # true number of anti-diagonals = Lm + Ln + 1
    Kp: int  # K rounded up to a CHUNK multiple
    chunk: int  # diagonals per grid step
    s2len: int  # padded s2 injection buffer length


def _plan(Lm: int, Ln: int, emit_dirs: bool) -> _Shapes:
    V = max(_round_up(Lm + 1, 1024), 1024)
    K = Lm + Ln + 1
    # VMEM budget: state vectors + 2x dirs block.
    state_bytes = 11 * V * 4
    budget = 12 * 1024 * 1024
    chunk = 256 if emit_dirs else 512
    if emit_dirs:
        # chunk must stay a multiple of PACK (16) for dirs packing;
        # dirs blocks are chunk*V/4 bytes (packed).
        while chunk > 16 and state_bytes + 2 * chunk * V // 4 > budget:
            chunk //= 2
    Kp = _round_up(K, chunk)
    s2len = _round_up(K + 1, 128)
    return _Shapes(
        V=V, C=V // ROWS, K=K, Kp=Kp, chunk=chunk, s2len=s2len
    )


def _shift_down_flat(x, incoming, row_idx, col_idx, C):
    """Flat-index shift: y[v] = x[v-1], y[0] = incoming.

    x is (8, C) holding flat element v = s*C + l at (s, l).

    Element-efficient: the row-boundary fixup only needs column C-1 of
    the row-rolled array, so that roll runs on an (8, 1) slice instead
    of the full (8, C) pane — 2 full-pane ops per shift (roll +
    select) instead of 4.
    """
    r = pltpu.roll(x, shift=1, axis=1)  # y[s, l] = x[s, l-1] (wraps l=0)
    col = x[:, C - 1 : C]  # (8, 1) last lane of each row
    colr = pltpu.roll(col, shift=1, axis=0)  # colr[s] = x[s-1, C-1]
    fix = jnp.where(row_idx[:, :1] == 0, incoming, colr)  # (8, 1)
    return jnp.where(col_idx == 0, fix, r)


def _kernel_tile(
    scalars,  # SMEM int32[8(+1)]: m, n, sm, sx, g, h, i0, j0 [, st] (global coords)
    s1m_ref,  # VMEM int32 (8, C): s1m[l] = s1_block[l-1]
    s2i_ref,  # SMEM int32 (1, chunk): s2inj chunk
    top_ref,  # SMEM int32 (3, chunk): I/S/D of tile row 0 at col k
    left_ref,  # SMEM int32 (3, chunk): I/S/D of tile col 0 at row k
    *refs,  # [dirs_ref] [botI, botS, botD] bv_ref bk_ref fin_ref scratch...
    shapes: _Shapes,
    B_cols: int,
    R_rows: int,
    is_local: bool,
    emit_dirs: bool,
    emit_bottom: bool,
    emit_right: bool = False,
    kimura: bool = False,
):
    """Streamed-boundary wavefront tile fill.

    Generalizes the global fill: the tile's top row and left column
    values arrive as per-diagonal SMEM streams (consumed at step k by
    lane 0 and lane k respectively), so the same kernel fills (a) the
    whole table (streams = the reference boundary conditions,
    algo.rs:193-220), or (b) any full-width row block given the
    previous block's bottom row — the unit of the checkpointed
    linear-space traceback (models/longalign.py).

    ``emit_bottom`` streams the last row (lane R) to an HBM output:
    at step k the three lane-R scalars are broadcast-stored to
    ``bot_ref[t]`` ((chunk, 3, 128) blocks), so the bottom row lands
    at rows R..R+B of the output regardless of B — O(1) VMEM, which
    is what lets row blocks span chromosome-length columns.
    """
    C = shapes.C
    idx = 0
    dirs_ref = None
    if emit_dirs:
        dirs_ref = refs[idx]
        idx += 1
    bot_ref = None
    if emit_bottom:
        bot_ref = refs[idx]
        idx += 1
    right_refs = None
    if emit_right:
        right_refs = refs[idx : idx + 3]
        idx += 3
    bv_ref, bk_ref, fin_ref = refs[idx : idx + 3]
    idx += 3
    (Ip, Sp, Dp, Ish, Ssh, Dsh, s2j_ref, bv_s, bk_s, fin_s) = refs[
        idx : idx + 10
    ]
    idx += 10
    acc_ref = None
    if emit_dirs:
        acc_ref = refs[idx]
        idx += 1
    right_s = None
    if emit_right:
        right_s = refs[idx : idx + 3]
        idx += 3
    # Factored carries (shift commutes with max; see _kernel_batch):
    # Ip=I, Dp=D, Sp=P=max(S,D), Ish=Q=max(I,S), Ssh=shift(M) cache.
    Qp, shM = Ish, Ssh

    g_id = pl.program_id(0)
    m = scalars[0]
    n = scalars[1]
    sm = scalars[2]
    sx = scalars[3]
    gg = scalars[4]
    hh = scalars[5]
    i0 = scalars[6]
    j0 = scalars[7]
    st = scalars[8] if kimura else None
    hg = hh + gg

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1)
    iv = row_idx * C + col_idx
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)

    @pl.when(g_id == 0)
    def _init():
        full_neg = jnp.full((ROWS, C), neg, dtype=jnp.int32)
        Ip[:] = full_neg
        Sp[:] = full_neg
        Dp[:] = full_neg
        Ish[:] = full_neg
        Ssh[:] = full_neg
        Dsh[:] = full_neg
        s2j_ref[:] = jnp.full((ROWS, C), 0xFF, dtype=jnp.int32)
        bv_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        bk_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
        fin_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        if emit_right:
            for r in right_s:
                r[:] = full_neg

    zero_lane = jnp.int32(0) if is_local else neg
    # Loop-invariant lane masks (hoisted out of the diagonal loop).
    row0_mask = iv == 0
    nz_mask = iv > 0
    gtR_mask = iv > R_rows
    m_i0 = m - i0  # tile-local row of the global (m, n) probe
    n_j0 = n - j0  # tile-local col of the probe

    def body(t, _):
        k = g_id * shapes.chunk + t

        @pl.when(k < shapes.K)
        def _step():
            inj = s2i_ref[0, t]
            s2j = _shift_down_flat(s2j_ref[:], inj, row_idx, col_idx, C)
            s2j_ref[:] = s2j

            shQ = _shift_down_flat(Qp[:], neg, row_idx, col_idx, C)
            shD = _shift_down_flat(Dp[:], neg, row_idx, col_idx, C)

            if is_local:
                Inew = jnp.maximum(
                    jnp.maximum(Ip[:] + gg, Sp[:] + hg), zero_lane
                )
                Dnew = jnp.maximum(
                    jnp.maximum(shQ + hg, shD + gg), zero_lane
                )
                sub = sub_score(s1m_ref[:], s2j, sm, sx, st)
                Snew = sub + jnp.maximum(shM[:], zero_lane)
            else:
                # The invalid mask below re-clamps dead lanes to neg
                # every step, so the NEG_INF re-clamp maxes are pure
                # no-ops in global mode — dropped.
                Inew = jnp.maximum(Ip[:] + gg, Sp[:] + hg)
                Dnew = jnp.maximum(shQ + hg, shD + gg)
                sub = sub_score(s1m_ref[:], s2j, sm, sx, st)
                Snew = sub + shM[:]

            # Boundary injection from the streams; lane conditions
            # factor into two per-step compares (iv == k, iv > k) and
            # one (iv < k - B) plus static masks.
            eq = iv == k
            gt = iv > k
            is_left = eq & nz_mask
            invalid = gt | (iv < k - B_cols) | gtR_mask
            Inew = jnp.where(row0_mask, top_ref[0, t], Inew)
            Snew = jnp.where(row0_mask, top_ref[1, t], Snew)
            Dnew = jnp.where(row0_mask, top_ref[2, t], Dnew)
            Inew = jnp.where(is_left, left_ref[0, t], Inew)
            Snew = jnp.where(is_left, left_ref[1, t], Snew)
            Dnew = jnp.where(is_left, left_ref[2, t], Dnew)
            # Lanes beyond the tile's true rows are padding: without
            # this bound their garbage can alias real global coords in
            # the argmax/(m,n) probes.
            Inew = jnp.where(invalid, neg, Inew)
            Snew = jnp.where(invalid, neg, Snew)
            Dnew = jnp.where(invalid, neg, Dnew)

            cm = jnp.maximum(jnp.maximum(Inew, Snew), Dnew)
            if is_local:
                cm = jnp.maximum(cm, 0)

            if emit_dirs:
                code = jnp.where(
                    cm == Snew,
                    DIR_SUB,
                    jnp.where(
                        cm == Inew,
                        DIR_INS,
                        jnp.where(cm == Dnew, DIR_DEL, DIR_STOP),
                    ),
                )
                # Pack 16 codes per int32 along the diagonal axis:
                # word k//16, bits 2*(k%16). Accumulate in scratch,
                # flush per word (and at the final true diagonal so a
                # partial last word still lands).
                s = t % PACK
                acc_ref[:] = jnp.where(s == 0, 0, acc_ref[:]) | (
                    code << (2 * s)
                )

                @pl.when((s == PACK - 1) | (k == shapes.K - 1))
                def _flush():
                    dirs_ref[t // PACK] = acc_ref[:]

            if is_local:
                # in_true: i0+iv <= m, 0 <= j, j0+j <= n (j = k-iv).
                in_true = (~invalid) & (iv <= m_i0) & (iv >= k - n_j0)
                val = jnp.where(in_true, cm, int_min)
                upd = val >= bv_s[:]
                bv_s[:] = jnp.where(upd, val, bv_s[:])
                bk_s[:] = jnp.where(upd, (j0 + k) - iv, bk_s[:])

            # The (m, n) probe lies on tile diagonal (m-i0)+(n-j0):
            # capture under a scalar pl.when instead of per-step
            # vector compares.
            @pl.when(k == m_i0 + n_j0)
            def _probe():
                fin_s[:] = jnp.where(
                    (iv == m_i0) & (~invalid), cm, fin_s[:]
                )

            if emit_bottom:
                lane_r, lane_c = divmod(R_rows, C)
                vals = jnp.stack(
                    [
                        Inew[lane_r, lane_c],
                        Snew[lane_r, lane_c],
                        Dnew[lane_r, lane_c],
                    ]
                )
                bot_ref[t] = jnp.broadcast_to(vals[:, None], (3, 128))

            if emit_right:
                # Tile col B cells (i, B) lie on diagonal k = i + B:
                # capture lane k-B with a masked vector update (no
                # dynamic lane indexing, which Mosaic rejects).
                on_right = iv == (k - B_cols)
                right_s[0][:] = jnp.where(on_right, Inew, right_s[0][:])
                right_s[1][:] = jnp.where(on_right, Snew, right_s[1][:])
                right_s[2][:] = jnp.where(on_right, Dnew, right_s[2][:])

            # Rotate factored carries.
            shM[:] = jnp.maximum(shQ, shD)
            Ip[:] = Inew
            Sp[:] = jnp.maximum(Snew, Dnew)
            Dp[:] = Dnew
            Qp[:] = jnp.maximum(Inew, Snew)

        return 0

    jax.lax.fori_loop(0, shapes.chunk, body, 0)

    @pl.when(g_id == pl.num_programs(0) - 1)
    def _finalize():
        bv_ref[:] = bv_s[:]
        bk_ref[:] = bk_s[:]
        fin_ref[:] = fin_s[:]
        if emit_right:
            for out, s in zip(right_refs, right_s):
                out[:] = s[:]


class TileFillResult(NamedTuple):
    """best is in global coordinates; bottom is (3, B+1) I/S/D of the
    tile's last row (cols 0..B) or None.

    dirs is PACKED: int32 (Kp/PACK, V) words with the move code of
    tile cell (li, j) at
    ``(dirs[(li+j) // PACK, li] >> (2 * ((li+j) % PACK))) & 3``.
    Use :func:`unpack_dirs` for the uint8 per-cell layout.

    right is (3, R) I/S/D of the tile's last column (rows 1..R) or
    None — the boundary carried to the next column-block in the
    sequence-parallel pipeline (``parallel/longseq.py``)."""

    dirs: jax.Array | None
    score_at_mn: jax.Array
    best: tuple[jax.Array, jax.Array, jax.Array]
    bottom: jax.Array | None
    right: jax.Array | None = None
    #: (NC, 3, V) I/S/D of every stride-V column checkpoint (the
    #: row-block kernel's ``emit_cols``; entry c, lane iv = cell
    #: (i0+iv, c*V), lane 0 and columns > n are junk) or None.
    cols: jax.Array | None = None


def unpack_dirs(packed: jax.Array, Kp: int) -> jax.Array:
    """(Kp/PACK, V) packed words -> (Kp, V) uint8 per-cell codes."""
    shifts = 2 * jnp.arange(PACK, dtype=jnp.int32)[None, :, None]
    codes = (packed[:, None, :] >> shifts) & 3
    return codes.reshape(Kp, packed.shape[1]).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_local",
        "emit_dirs",
        "emit_bottom",
        "emit_right",
        "interpret",
        "vma_axes",
    ),
)
def gotoh_tile_pallas(
    s1_block: jax.Array,
    s2e: jax.Array,
    top: jax.Array,
    left: jax.Array,
    m: jax.Array,
    n: jax.Array,
    i0: jax.Array,
    j0: jax.Array,
    scores: Scores,
    is_local: bool,
    emit_dirs: bool = True,
    emit_bottom: bool = False,
    emit_right: bool = False,
    interpret: bool = False,
    vma_axes: tuple[str, ...] = (),
) -> TileFillResult:
    """Fill tile rows [i0+1, i0+R] x cols [j0+1, j0+B] on TPU.

    Pallas counterpart of ``ops/gotoh_tile.tile_fill`` (same boundary
    semantics): ``top`` (3, B+1) are I/S/D at tile row 0 cols 0..B
    (element 0 = corner), ``left`` (3, R) at tile col 0 rows 1..R.

    ``vma_axes``: mesh axes the outputs vary over when called inside a
    ``shard_map`` with ``check_vma=True`` (pallas_call requires the
    out avals to declare their varying manual axes explicitly).
    """
    from genomics_rs_tpu.ops.gotoh_scan import vary

    R = s1_block.shape[0]
    B = s2e.shape[0]
    shapes = _plan(R, B, emit_dirs)
    V, C = shapes.V, shapes.C
    vma = frozenset(vma_axes) if vma_axes else None

    def out_struct(shape):
        return jax.ShapeDtypeStruct(shape, jnp.int32, vma=vma)

    # Under shard_map+check_vma, dynamic_update_slice/gather operands
    # must share varying axes with their updates/indices — cast every
    # constant buffer and input up front (no-op outside shard_map).
    s1_block, s2e, top, left = vary(
        (s1_block, s2e, top, left), vma_axes
    )

    s1m = vary(
        jnp.full((V,), sentinel(0xFD, scores), dtype=jnp.int32), vma_axes
    )
    s1m = jax.lax.dynamic_update_slice(
        s1m, encode_chars(s1_block, scores), (jnp.int32(1),)
    )
    s1m2d = s1m.reshape(ROWS, C)

    ks = jnp.arange(shapes.Kp, dtype=jnp.int32)
    s2inj = jnp.take(
        encode_chars(s2e, scores), vary(jnp.clip(ks - 1, 0, B - 1), vma_axes)
    )
    s2inj = jnp.where(ks - 1 >= B, sentinel(0xFF, scores), s2inj)[None, :]

    neg = jnp.int32(NEG_INF)
    # Stream layouts: top consumed at step k (k <= B), left[k-1] at
    # step k (1 <= k <= R).
    top_stream = vary(
        jnp.full((3, shapes.Kp), neg, dtype=jnp.int32), vma_axes
    )
    top_stream = jax.lax.dynamic_update_slice(
        top_stream, top.astype(jnp.int32), (jnp.int32(0), jnp.int32(0))
    )
    left_stream = vary(
        jnp.full((3, shapes.Kp), neg, dtype=jnp.int32), vma_axes
    )
    left_stream = jax.lax.dynamic_update_slice(
        left_stream, left.astype(jnp.int32), (jnp.int32(0), jnp.int32(1))
    )

    kim = kimura_active(scores)
    scalars = jnp.stack(
        vary(
            [
                jnp.asarray(m, jnp.int32),
                jnp.asarray(n, jnp.int32),
                jnp.int32(scores.s_match),
                jnp.int32(scores.s_mismatch),
                jnp.int32(scores.g),
                jnp.int32(scores.h),
                jnp.asarray(i0, jnp.int32),
                jnp.asarray(j0, jnp.int32),
            ]
            + ([jnp.int32(scores.s_transition)] if kim else []),
            vma_axes,
        )
    )

    grid = shapes.Kp // shapes.chunk
    vec_spec = pl.BlockSpec(
        (ROWS, C), lambda g, s: (0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = []
    out_specs = []
    if emit_dirs:
        out_shapes.append(out_struct((shapes.Kp // PACK, ROWS, C)))
        out_specs.append(
            pl.BlockSpec(
                (shapes.chunk // PACK, ROWS, C),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    if emit_bottom:
        out_shapes.append(out_struct((shapes.Kp, 3, 128)))
        out_specs.append(
            pl.BlockSpec(
                (shapes.chunk, 3, 128),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    if emit_right:
        out_shapes += [out_struct((ROWS, C))] * 3
        out_specs += [vec_spec] * 3
    out_shapes += [out_struct((ROWS, C))] * 3
    out_specs += [vec_spec] * 3

    smem_chunk = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, shapes.chunk), lambda g, s: (0, g), memory_space=pltpu.SMEM
    )
    scratch = [pltpu.VMEM((ROWS, C), jnp.int32)] * 10
    if emit_dirs:
        scratch.append(pltpu.VMEM((ROWS, C), jnp.int32))  # pack acc
    if emit_right:
        scratch += [pltpu.VMEM((ROWS, C), jnp.int32)] * 3  # right I/S/D

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (ROWS, C), lambda g, s: (0, 0), memory_space=pltpu.VMEM
            ),
            smem_chunk(1),
            smem_chunk(3),
            smem_chunk(3),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel_tile,
        shapes=shapes,
        B_cols=B,
        R_rows=R,
        is_local=is_local,
        emit_dirs=emit_dirs,
        emit_bottom=emit_bottom,
        emit_right=emit_right,
        kimura=kim,
    )
    outs = list(
        pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(scalars, s1m2d, s2inj, top_stream, left_stream)
    )

    dirs = None
    if emit_dirs:
        # Packed words: code(k, lane) = (dirs[k // PACK, lane]
        #                                >> (2 * (k % PACK))) & 3.
        dirs = outs.pop(0).reshape(shapes.Kp // PACK, V)
    bottom = None
    if emit_bottom:
        # bot[k, c, 0] = matrix-c value of cell (R, k - R).
        bot = outs.pop(0)
        bottom = jnp.transpose(bot[R : R + B + 1, :, 0], (1, 0))
    right = None
    if emit_right:
        rI, rS, rD = outs[:3]
        outs = outs[3:]
        # right_s lane i holds cell (i, B); rows 1..R.
        right = jnp.stack(
            [rI.reshape(V)[1 : R + 1], rS.reshape(V)[1 : R + 1],
             rD.reshape(V)[1 : R + 1]]
        )
    bv, bk, fin = outs

    iv = jnp.arange(V, dtype=jnp.int32)
    bvf = bv.reshape(V)
    bkf = bk.reshape(V)
    vmax = jnp.max(bvf)
    ig = jnp.asarray(i0, jnp.int32) + iv
    i_best = jnp.max(jnp.where(bvf == vmax, ig, -1))
    j_best = jnp.max(jnp.where((bvf == vmax) & (ig == i_best), bkf, -1))
    return TileFillResult(
        dirs=dirs,
        score_at_mn=jnp.max(fin.reshape(V)),
        best=(vmax, i_best, j_best),
        bottom=bottom,
        right=right,
    )


def _kernel_tile_batch(
    scalars,  # SMEM int32 (B, 8): m, n, sm, sx, g, h, i0, st|pad per pair
    s1m_ref,  # VMEM int32 (1, 8, C) block: this pair's block rows
    s2i_ref,  # SMEM int32 (1, 1, chunk): this pair's s2inj chunk
    top_ref,  # SMEM int32 (1, 3, chunk): this pair's top-row stream
    *refs,  # bot_ref, fin_ref, [bv_ref, bk_ref], scratches...
    shapes: _Shapes,
    B_cols: int,
    R_rows: int,
    is_local: bool,
    kimura: bool = False,
):
    """Batched full-width row-block fill: grid (pairs, diag-chunks).

    The rhomboid counterpart of ``_kernel_batch``: every pair's table
    is cut into R-row blocks driven from the host by a ``lax.scan``
    (ops/… ``gotoh_scores_blocked``), so the wavefront vector is only
    R+1 lanes instead of m+1 — the diagonal-ramp waste drops from
    ~2x to ~(V/(R+1)) * ((R+n)/n). Score-only; global mode probes
    (m, n), local mode additionally tracks the per-lane keep-last
    argmax (value + global j) so the caller can reduce to the
    reference's exact local start cell (``algo.rs:311-322``);
    boundaries: top row streamed per pair, left column = global col-0
    formula (full-width blocks), bottom row captured to HBM.
    """
    C = shapes.C
    idx = 0
    bot_ref = refs[idx]
    idx += 1
    fin_ref = refs[idx]
    idx += 1
    bv_ref = bk_ref = None
    if is_local:
        bv_ref, bk_ref = refs[idx : idx + 2]
        idx += 2
    Ip, Sp, Dp, Qp_r, shM_r, s2j_ref, fin_s = refs[idx : idx + 7]
    idx += 7
    bv_s = bk_s = None
    if is_local:
        bv_s, bk_s = refs[idx : idx + 2]
        idx += 2
    b_id = pl.program_id(0)
    g_id = pl.program_id(1)
    Qp, shM = Qp_r, shM_r

    m = scalars[b_id, 0]
    n = scalars[b_id, 1]
    sm = scalars[b_id, 2]
    sx = scalars[b_id, 3]
    gg = scalars[b_id, 4]
    hh = scalars[b_id, 5]
    i0 = scalars[b_id, 6]
    st = scalars[b_id, 7] if kimura else None
    hg = hh + gg

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1)
    iv = row_idx * C + col_idx
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)

    @pl.when(g_id == 0)
    def _init():
        full_neg = jnp.full((ROWS, C), neg, dtype=jnp.int32)
        Ip[:] = full_neg
        Sp[:] = full_neg
        Dp[:] = full_neg
        Qp[:] = full_neg
        shM[:] = full_neg
        s2j_ref[:] = jnp.full((ROWS, C), 0xFF, dtype=jnp.int32)
        fin_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        if is_local:
            bv_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
            bk_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)

    zero_lane = jnp.int32(0) if is_local else neg
    # Loop-invariant lane vectors.
    row0_mask = iv == 0
    nz_mask = iv > 0
    gtR_mask = iv > R_rows
    Dcol = hh + (i0 + iv) * gg  # col-0 boundary D values per lane
    m_i0 = m - i0
    if is_local:
        lem_mask = iv <= m_i0

    def body(t, _):
        k = g_id * shapes.chunk + t

        @pl.when(k < shapes.K)
        def _step():
            inj = s2i_ref[0, 0, t]
            s2j = _shift_down_flat(s2j_ref[:], inj, row_idx, col_idx, C)
            s2j_ref[:] = s2j

            shQ = _shift_down_flat(Qp[:], neg, row_idx, col_idx, C)
            shD = _shift_down_flat(Dp[:], neg, row_idx, col_idx, C)

            if is_local:
                Inew = jnp.maximum(
                    jnp.maximum(Ip[:] + gg, Sp[:] + hg), zero_lane
                )
                Dnew = jnp.maximum(
                    jnp.maximum(shQ + hg, shD + gg), zero_lane
                )
                sub = sub_score(s1m_ref[0], s2j, sm, sx, st)
                Snew = sub + jnp.maximum(shM[:], zero_lane)
            else:
                # invalid re-clamps dead lanes every step, so the
                # NEG_INF re-clamps are no-ops in global mode.
                Inew = jnp.maximum(Ip[:] + gg, Sp[:] + hg)
                Dnew = jnp.maximum(shQ + hg, shD + gg)
                sub = sub_score(s1m_ref[0], s2j, sm, sx, st)
                Snew = sub + shM[:]

            # Boundaries: top row streamed; left col = global col-0
            # (D = h + (i0+i)*g); lanes beyond R or j<0 invalid.
            eq = iv == k
            gt = iv > k
            is_left = eq & nz_mask
            dead_IS = is_left | gt
            invalid = gt | (iv < k - B_cols) | gtR_mask
            Inew = jnp.where(row0_mask, top_ref[0, 0, t], Inew)
            Snew = jnp.where(row0_mask, top_ref[0, 1, t], Snew)
            Dnew = jnp.where(row0_mask, top_ref[0, 2, t], Dnew)
            Inew = jnp.where(dead_IS, neg, Inew)
            Snew = jnp.where(dead_IS, neg, Snew)
            Dnew = jnp.where(is_left, Dcol, Dnew)
            Inew = jnp.where(invalid, neg, Inew)
            Snew = jnp.where(invalid, neg, Snew)
            Dnew = jnp.where(invalid, neg, Dnew)

            Qnew = jnp.maximum(Inew, Snew)
            if is_local:
                cm = jnp.maximum(jnp.maximum(Qnew, Dnew), 0)
                # Keep-last per-lane argmax (>= keeps the later
                # diagonal = larger j at fixed i), exactly like
                # _kernel_batch; global i is i0 + lane, recovered by
                # the caller's cross-block reduce.
                in_true = (~invalid) & lem_mask & (iv >= k - n)
                val = jnp.where(in_true, cm, int_min)
                upd = val >= bv_s[:]
                bv_s[:] = jnp.where(upd, val, bv_s[:])
                bk_s[:] = jnp.where(upd, k - iv, bk_s[:])
                fin_s[:] = jnp.maximum(fin_s[:], val)
            else:

                @pl.when(k == m_i0 + n)
                def _probe():
                    cm = jnp.maximum(Qnew, Dnew)
                    fin_s[:] = jnp.where(
                        (iv == m_i0) & (~invalid), cm, fin_s[:]
                    )

            lane_r, lane_c = divmod(R_rows, C)
            vals = jnp.stack(
                [
                    Inew[lane_r, lane_c],
                    Snew[lane_r, lane_c],
                    Dnew[lane_r, lane_c],
                ]
            )
            bot_ref[0, t] = jnp.broadcast_to(vals[:, None], (3, 128))

            shM[:] = jnp.maximum(shQ, shD)
            Ip[:] = Inew
            Sp[:] = jnp.maximum(Snew, Dnew)
            Dp[:] = Dnew
            Qp[:] = Qnew

        return 0

    jax.lax.fori_loop(0, shapes.chunk, body, 0)

    @pl.when(g_id == pl.num_programs(1) - 1)
    def _finalize():
        fin_ref[0] = fin_s[:]
        if is_local:
            bv_ref[0] = bv_s[:]
            bk_ref[0] = bk_s[:]


@functools.partial(jax.jit, static_argnames=("is_local", "interpret", "R"))
def gotoh_scores_blocked(
    s1eb: jax.Array,
    s2eb: jax.Array,
    ms: jax.Array,
    ns: jax.Array,
    scores: Scores,
    is_local: bool,
    R: int = 4096,
    interpret: bool = False,
):
    """Batch scores via row-block pipelining.

    One jitted ``lax.scan`` over row blocks; each block is a single
    batched tile dispatch with bottom rows carried between iterations.

    Niche: BATCHES OF LONG PAIRS — the flat batched kernel needs
    ~11*(m+1)*4 bytes of VMEM state per pair (m <= ~250k); this one
    needs only O(R), so a batch of chromosome-scale pairs still runs.
    For pairs that fit the flat kernel, prefer
    ``gotoh_scores_pallas_batch``: measured on 30 kb pairs the flat
    kernel is ~2.4x faster — its larger per-step vectors amortize the
    fixed per-step cost better than the smaller ramp waste here saves
    (4.5x more, cheaper steps lose).

    Returns (score, start_i, start_j) of shape (B,) — (m, n) for
    global; local mode returns the true reference start cell (last
    row-major argmax, ``algo.rs:311-322``), carried per block and
    merged with the keep-last tie-break.
    """
    B, Lm = s1eb.shape
    _, Ln = s2eb.shape
    R = min(R, Lm)
    NB = -(-Lm // R)
    Lmp = NB * R
    if Lmp != Lm:
        padm = jnp.full((B, Lmp - Lm), 0xFE, dtype=s1eb.dtype)
        s1eb = jnp.concatenate([s1eb.astype(jnp.uint8), padm], axis=1)
    shapes = _plan(R, Ln, emit_dirs=False)
    V, C = shapes.V, shapes.C

    ms = jnp.asarray(ms, jnp.int32)
    ns = jnp.asarray(ns, jnp.int32)

    # Per-pair, per-block s1m panes: (NB, B, 8, C).
    s1m = jnp.full((B, NB, V), sentinel(0xFD, scores), dtype=jnp.int32)
    blocks = encode_chars(s1eb, scores).reshape(B, NB, R)
    s1m = jax.lax.dynamic_update_slice(
        s1m, blocks, (jnp.int32(0), jnp.int32(0), jnp.int32(1))
    )
    s1m = jnp.transpose(s1m, (1, 0, 2)).reshape(NB, B, ROWS, C)

    ks = jnp.arange(shapes.Kp, dtype=jnp.int32)
    idx = jnp.clip(ks - 1, 0, Ln - 1)
    s2inj = jnp.take_along_axis(
        encode_chars(s2eb, scores), jnp.broadcast_to(idx, (B, shapes.Kp)), axis=1
    )
    s2inj = jnp.where(
        ks - 1 >= Ln, sentinel(0xFF, scores), s2inj
    )[:, None, :]

    from genomics_rs_tpu.ops.gotoh_tile import global_boundary_top

    neg = jnp.int32(NEG_INF)
    top0 = jnp.broadcast_to(
        global_boundary_top(0, Ln, scores)[None], (B, 3, Ln + 1)
    )

    pair_out = pl.BlockSpec(
        (1, ROWS, C), lambda b, g, s: (b, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, shapes.Kp // shapes.chunk),
        in_specs=[
            pl.BlockSpec(
                (1, ROWS, C),
                lambda b, g, s: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, shapes.chunk),
                lambda b, g, s: (b, 0, g),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 3, shapes.chunk),
                lambda b, g, s: (b, 0, g),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, shapes.chunk, 3, 128),
                lambda b, g, s: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pair_out,
        )
        + ((pair_out, pair_out) if is_local else ()),
        scratch_shapes=[pltpu.VMEM((ROWS, C), jnp.int32)]
        * (9 if is_local else 7),
    )
    kim = kimura_active(scores)
    kernel = functools.partial(
        _kernel_tile_batch,
        shapes=shapes,
        B_cols=Ln,
        R_rows=R,
        is_local=is_local,
        kimura=kim,
    )

    def block_step(top, xs):
        s1m_blk, b_idx = xs
        i0 = b_idx * R
        # Stream layout: top[k] consumed at step k (cols 0..Ln).
        top_stream = jnp.full((B, 3, shapes.Kp), neg, dtype=jnp.int32)
        top_stream = jax.lax.dynamic_update_slice(
            top_stream, top, (jnp.int32(0),) * 3
        )
        scalars = jnp.stack(
            [
                ms,
                ns,
                jnp.full((B,), scores.s_match, jnp.int32),
                jnp.full((B,), scores.s_mismatch, jnp.int32),
                jnp.full((B,), scores.g, jnp.int32),
                jnp.full((B,), scores.h, jnp.int32),
                jnp.full((B,), 1, jnp.int32) * i0,
                # st rides the spare column in kimura variants.
                jnp.full(
                    (B,), scores.s_transition if kim else 0, jnp.int32
                ),
            ],
            axis=1,
        )
        out_shape = (
            jax.ShapeDtypeStruct((B, shapes.Kp, 3, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, ROWS, C), jnp.int32),
        )
        if is_local:
            out_shape += (
                jax.ShapeDtypeStruct((B, ROWS, C), jnp.int32),
            ) * 2
        bot, fin, *rest = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(scalars, s1m_blk, s2inj, top_stream)
        new_top = jnp.transpose(bot[:, R : R + Ln + 1, :, 0], (0, 2, 1))
        fin_max = jnp.max(fin.reshape(B, V), axis=1)
        if not is_local:
            return new_top, (fin_max,)
        # Per-block reduce to (value, global i, global j) with the
        # reference tie-break (larger value, then larger i, then
        # larger j).
        bv, bk = rest
        bvf = bv.reshape(B, V)
        bkf = bk.reshape(B, V)
        ig = i0 + jnp.arange(V, dtype=jnp.int32)[None, :]
        vmax = jnp.max(bvf, axis=1)
        i_best = jnp.max(
            jnp.where(bvf == vmax[:, None], ig, -1), axis=1
        )
        j_best = jnp.max(
            jnp.where(
                (bvf == vmax[:, None]) & (ig == i_best[:, None]), bkf, -1
            ),
            axis=1,
        )
        return new_top, (fin_max, vmax, i_best, j_best)

    _, outs = jax.lax.scan(
        block_step, top0, (s1m, jnp.arange(NB, dtype=jnp.int32))
    )
    if not is_local:
        return jnp.max(outs[0], axis=0), ms, ns
    # Cross-block merge: blocks are ordered by increasing global i, so
    # the keep-last (row-major) tie-break is again value > i > j max.
    _, vs, is_, js = outs
    vm = jnp.max(vs, axis=0)
    im = jnp.max(jnp.where(vs == vm[None, :], is_, -1), axis=0)
    jm = jnp.max(
        jnp.where((vs == vm[None, :]) & (is_ == im[None, :]), js, -1),
        axis=0,
    )
    return vm, im, jm


def _kernel_batch(
    scalars,  # SMEM int32 (B, 8): per-pair m, n, sm, sx, g, h, st|pad, pad
    s1m_ref,  # VMEM int32 (1, 8, C) block: this pair's s1m
    s2i_ref,  # SMEM int32 (1, 1, chunk) block: this pair's s2inj chunk
    bv_ref,  # int32 (1, 8, C) out block
    bk_ref,
    fin_ref,
    Ip, Sp, Dp, Ish, Ssh, Dsh, s2j_ref, bv_s, bk_s, fin_s,
    *,
    shapes: _Shapes,
    is_local: bool,
    kimura: bool = False,
):
    """Batched score-only wavefront: grid (pairs, diag-chunks).

    TPU grid iteration is (b-major, g-minor) and sequential, so the
    per-pair scratch state re-initialises at every g == 0 and carries
    across the chunk dimension only. One dispatch scores the whole
    batch — amortising host/tunnel round-trips that dominate when
    pairs are launched one by one.

    Score-only lets the step shed work relative to the dirs kernel:

    * shift commutes with max, so the carried state is factored as
      I, D, P = max(S, D), Q = max(I, S) and only TWO flat shifts per
      step are needed (shift(Q), shift(D)) — the (i-1, j-1)
      predecessor max arrives as shift(M) = max(shQ, shD) cached from
      the previous step;
    * global mode skips the local-argmax tracker entirely (only the
      (m, n) capture matters), captures the (m, n) probe under a
      scalar ``pl.when(k == m + n)`` instead of a per-step vector
      compare, and drops the NEG_INF re-clamp maxes: padded-lane
      values then drift downward unclamped, but padding lanes only
      ever feed other padding lanes (DP flow is down-right) and every
      output read is masked to the true region — see the int32
      headroom guard in ``gotoh_scores_pallas_batch``;
    * boundary masks are factored into two per-step compares
      (``iv == k``, ``iv > k``) plus static lane masks, with the
      row-0 boundary values computed as *scalars* per step.

    The factoring reproduces the exact reference recurrence:
    I' = max(I+g, P+h+g, 0?), D' = max(shQ+h+g, shD+g, 0?),
    S' = sub + max(shM, 0?).
    """
    C = shapes.C
    b_id = pl.program_id(0)
    g_id = pl.program_id(1)

    # Scratch reuse (names kept for the shared signature): Ip=I, Dp=D,
    # Sp=P=max(S,D), Ish=Q=max(I,S), Ssh=shift(M) for the next step,
    # s2j_ref as usual; Dsh unused spare.
    Qp, shM = Ish, Ssh

    m = scalars[b_id, 0]
    n = scalars[b_id, 1]
    sm = scalars[b_id, 2]
    sx = scalars[b_id, 3]
    gg = scalars[b_id, 4]
    hh = scalars[b_id, 5]
    st = scalars[b_id, 6] if kimura else None
    hg = hh + gg

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1)
    iv = row_idx * C + col_idx
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)

    @pl.when(g_id == 0)
    def _init():
        full_neg = jnp.full((ROWS, C), neg, dtype=jnp.int32)
        Ip[:] = full_neg
        Sp[:] = full_neg
        Dp[:] = full_neg
        Qp[:] = full_neg
        shM[:] = full_neg
        s2j_ref[:] = jnp.full((ROWS, C), 0xFF, dtype=jnp.int32)
        if is_local:
            bv_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
            bk_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
        fin_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)

    zero_lane = jnp.int32(0) if is_local else neg
    # Loop-invariant lane vectors (hoisted out of the diagonal loop).
    row0_mask = iv == 0
    nz_mask = iv > 0
    Dcol = hh + iv * gg  # col-0 boundary D values per lane
    if is_local:
        lem_mask = iv <= m

    def step_ssa(state, k, inj):
        """One diagonal, pure SSA in/out (no scratch traffic)."""
        s2j0, I0, P0, D0, Q0, M0, bv0, bk0 = state
        s2j = _shift_down_flat(s2j0, inj, row_idx, col_idx, C)
        shQ = _shift_down_flat(Q0, neg, row_idx, col_idx, C)
        shD = _shift_down_flat(D0, neg, row_idx, col_idx, C)

        if is_local:
            Inew = jnp.maximum(jnp.maximum(I0 + gg, P0 + hg), zero_lane)
            Dnew = jnp.maximum(jnp.maximum(shQ + hg, shD + gg), zero_lane)
            sub = sub_score(s1m_ref[0], s2j, sm, sx, st)
            Snew = sub + jnp.maximum(M0, zero_lane)
        else:
            Inew = jnp.maximum(I0 + gg, P0 + hg)
            Dnew = jnp.maximum(shQ + hg, shD + gg)
            sub = sub_score(s1m_ref[0], s2j, sm, sx, st)
            Snew = sub + M0

        # Boundary injection. Lane conditions factor into two
        # per-step vector compares (iv == k -> col 0; iv > k ->
        # left of col 0) plus static masks; the row-0 values are
        # scalars (cell (0, k)).
        eq = iv == k
        gt = iv > k
        col0 = eq & nz_mask
        dead_IS = col0 | gt  # lanes where I and S are neg
        topI_s = jnp.where(k == 0, 0, hh + k * gg)
        topSD_s = jnp.where(k == 0, 0, neg)
        Inew = jnp.where(row0_mask, topI_s, Inew)
        Inew = jnp.where(dead_IS, neg, Inew)
        Snew = jnp.where(row0_mask, topSD_s, Snew)
        Snew = jnp.where(dead_IS, neg, Snew)
        Dnew = jnp.where(col0, Dcol, Dnew)
        Dnew = jnp.where(row0_mask, topSD_s, Dnew)
        Dnew = jnp.where(gt, neg, Dnew)

        Qnew = jnp.maximum(Inew, Snew)
        if is_local:
            cm = jnp.maximum(Qnew, Dnew)
            cmc = jnp.maximum(cm, 0)
            # in_true: i <= m, 0 <= j <= n  (j = k - iv).
            in_true = lem_mask & (~gt) & (iv >= k - n)
            val = jnp.where(in_true, cmc, int_min)
            upd = val >= bv0
            bv0 = jnp.where(upd, val, bv0)
            bk0 = jnp.where(upd, k, bk0)

            @pl.when(k == m + n)
            def _probe():
                fin_s[:] = jnp.where(iv == m, cmc, fin_s[:])

        else:

            @pl.when(k == m + n)
            def _probe():
                cm = jnp.maximum(Qnew, Dnew)
                fin_s[:] = jnp.where(iv == m, cm, fin_s[:])

        return (
            s2j,
            Inew,
            jnp.maximum(Snew, Dnew),
            Dnew,
            Qnew,
            jnp.maximum(shQ, shD),
            bv0,
            bk0,
        )

    # Unrolled x2: one scratch load + one store per TWO diagonals —
    # measured issue-slot-bound (a 1.6x ALU cut left throughput
    # unchanged), so halving VMEM round-trips is the remaining lever.
    # Steps beyond K run harmlessly (pad injections never match, the
    # probes/argmax are masked; see the drift headroom guard).
    UNROLL = 2

    def body(t, _):
        k0 = g_id * shapes.chunk + UNROLL * t
        state = (
            s2j_ref[:],
            Ip[:],
            Sp[:],
            Dp[:],
            Qp[:],
            shM[:],
            bv_s[:] if is_local else None,
            bk_s[:] if is_local else None,
        )
        for sub in range(UNROLL):
            state = step_ssa(state, k0 + sub, s2i_ref[0, 0, UNROLL * t + sub])
        (s2j_ref[:], Ip[:], Sp[:], Dp[:], Qp[:], shM[:]) = state[:6]
        if is_local:
            bv_s[:], bk_s[:] = state[6], state[7]
        return 0

    jax.lax.fori_loop(0, shapes.chunk // UNROLL, body, 0)

    @pl.when(g_id == pl.num_programs(1) - 1)
    def _finalize():
        bv_ref[0] = bv_s[:]
        bk_ref[0] = bk_s[:]
        fin_ref[0] = fin_s[:]


@functools.partial(
    jax.jit, static_argnames=("is_local", "interpret", "vma_axes")
)
def gotoh_scores_pallas_batch(
    s1eb: jax.Array,
    s2eb: jax.Array,
    ms: jax.Array,
    ns: jax.Array,
    scores: Scores,
    is_local: bool,
    interpret: bool = False,
    vma_axes: tuple[str, ...] = (),
):
    """Score a batch of pairs in ONE kernel dispatch (no dirs).

    Returns (score, start_i, start_j) arrays of shape (B,). Shapes:
    s1eb (B, Lm), s2eb (B, Ln) — all pairs padded alike.

    ``vma_axes``: mesh axes the outputs vary over when called inside a
    ``shard_map`` with ``check_vma=True`` (``pallas_call`` requires the
    out avals to declare their varying manual axes explicitly; every
    other op auto-promotes).
    """
    B, Lm = s1eb.shape
    _, Ln = s2eb.shape
    shapes = _plan(Lm, Ln, emit_dirs=False)
    V, C = shapes.V, shapes.C

    # Global mode drops the per-step NEG_INF re-clamp (see
    # _kernel_batch): padded-lane values drift down by at most
    # drift_rate per diagonal and must stay above INT32_MIN. The
    # guard only fires when the scoring params are concrete (they are
    # traced when this jit is nested under another trace; CLI/library
    # entry points always pass concrete ints).
    drift_rate = drift_rate_or_none(scores)
    if drift_rate is not None and shapes.K * drift_rate >= 1 << 30:
        raise ValueError(
            f"scoring magnitudes too large for {shapes.K} diagonals "
            "(int32 padded-lane drift headroom exceeded)"
        )

    ms = jnp.asarray(ms, jnp.int32)
    ns = jnp.asarray(ns, jnp.int32)

    s1m = jnp.full((B, V), sentinel(0xFD, scores), dtype=jnp.int32)
    s1m = jax.lax.dynamic_update_slice(
        s1m, encode_chars(s1eb, scores), (jnp.int32(0), jnp.int32(1))
    )
    s1m3d = s1m.reshape(B, ROWS, C)

    ks = jnp.arange(shapes.Kp, dtype=jnp.int32)
    idx = jnp.clip(ks - 1, 0, Ln - 1)
    s2inj = jnp.take_along_axis(
        encode_chars(s2eb, scores), jnp.broadcast_to(idx, (B, shapes.Kp)), axis=1
    )
    s2inj = jnp.where(
        ks - 1 >= Ln, sentinel(0xFF, scores), s2inj
    )[:, None, :]

    kim = kimura_active(scores)
    scalars = jnp.stack(
        [
            ms,
            ns,
            jnp.full((B,), scores.s_match, jnp.int32),
            jnp.full((B,), scores.s_mismatch, jnp.int32),
            jnp.full((B,), scores.g, jnp.int32),
            jnp.full((B,), scores.h, jnp.int32),
            # st rides the spare column in kimura variants.
            jnp.full((B,), scores.s_transition if kim else 0, jnp.int32),
            jnp.zeros((B,), jnp.int32),
        ],
        axis=1,
    )

    grid = (B, shapes.Kp // shapes.chunk)
    vec_out = pl.BlockSpec(
        (1, ROWS, C), lambda b, g, s: (b, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, ROWS, C), lambda b, g, s: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, shapes.chunk),
                lambda b, g, s: (b, 0, g),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=(vec_out, vec_out, vec_out),
        scratch_shapes=[pltpu.VMEM((ROWS, C), jnp.int32)] * 10,
    )
    kernel = functools.partial(
        _kernel_batch, shapes=shapes, is_local=is_local, kimura=kim
    )
    out_vma = frozenset(vma_axes) if vma_axes else None
    bv, bk, fin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((B, ROWS, C), jnp.int32, vma=out_vma)]
            * 3
        ),
        interpret=interpret,
    )(scalars, s1m3d, s2inj)

    iv = jnp.arange(V, dtype=jnp.int32)[None, :]
    bvf = bv.reshape(B, V)
    bkf = bk.reshape(B, V)
    finf = fin.reshape(B, V)

    if is_local:
        vmax = jnp.max(bvf, axis=1, keepdims=True)
        i_best = jnp.max(jnp.where(bvf == vmax, iv, -1), axis=1)
        k_best = jnp.max(
            jnp.where((bvf == vmax) & (iv == i_best[:, None]), bkf, -1),
            axis=1,
        )
        return vmax[:, 0], i_best, k_best - i_best
    return jnp.max(finf, axis=1), ms, ns


@functools.partial(
    jax.jit,
    static_argnames=("is_local", "emit_dirs", "packed_dirs", "interpret"),
)
def gotoh_fill_pallas(
    s1e: jax.Array,
    s2e: jax.Array,
    m: jax.Array,
    n: jax.Array,
    scores: Scores,
    is_local: bool,
    emit_dirs: bool = True,
    packed_dirs: bool = False,
    interpret: bool = False,
) -> FillResult:
    """Pallas-kernel wavefront fill; drop-in for ``gotoh_fill_scan``.

    A thin wrapper over the streamed-boundary tile kernel with the
    whole table as one tile and the reference's global boundary
    conditions as the streams (algo.rs:193-220).

    Returns ``FillResult`` whose ``dirs`` is shaped ``(Kp, V)`` with
    ``dirs[i + j, i]`` = move code at table cell (i, j) — the same
    indexing contract as the scan engine (V >= Lm + 1; rows beyond the
    true diagonal count and lanes beyond row m are garbage/unreached).

    With ``packed_dirs=True`` the per-cell unpack is skipped and
    ``dirs`` stays the kernel's packed int32 words ``(Kp/16, V)``
    (code at (i, j) = ``(dirs[(i+j)//16, i] >> (2*((i+j)%16))) & 3``)
    — 4x smaller and directly consumable by the on-device walker
    (``ops/traceback_device.walk_block``), so a full retrace never
    materialises or transfers a per-cell table.
    """
    from genomics_rs_tpu.ops.gotoh_tile import (
        global_boundary_left,
        global_boundary_top,
    )

    Lm = s1e.shape[0]
    Ln = s2e.shape[0]
    m = jnp.asarray(m, jnp.int32)
    n = jnp.asarray(n, jnp.int32)

    if emit_dirs:
        # The lean forward row-block kernel also packs dirs and is
        # ~1.5x the general tile kernel on forward fills (no left
        # stream, SSA-unrolled steps); one full-height block covers
        # the monolithic table.
        from genomics_rs_tpu.ops.gotoh_rowblock import (
            gotoh_rowblock_pallas,
        )

        res = gotoh_rowblock_pallas(
            s1e,
            s2e,
            global_boundary_top(0, Ln, scores),
            m,
            n,
            jnp.int32(0),
            scores,
            is_local,
            emit_dirs=True,
            emit_bottom=False,
            interpret=interpret,
        )
        if packed_dirs:
            dirs = res.dirs
        else:
            # Unpack on device to keep FillResult's per-cell uint8
            # contract for the host traceback (budget-routed pairs
            # keep this array small; the aligner and the checkpointed
            # path consume the packed words directly instead).
            dirs = unpack_dirs(res.dirs, res.dirs.shape[0] * PACK)
    else:
        res = gotoh_tile_pallas(
            s1e,
            s2e,
            global_boundary_top(0, Ln, scores),
            global_boundary_left(0, Lm, scores),
            m,
            n,
            jnp.int32(0),
            jnp.int32(0),
            scores,
            is_local,
            emit_dirs=False,
            emit_bottom=False,
            interpret=interpret,
        )
        dirs = jnp.zeros((0, 0), dtype=jnp.uint8)
    if is_local:
        v, bi, bj = res.best
        return FillResult(dirs=dirs, score=v, start_i=bi, start_j=bj)
    return FillResult(
        dirs=dirs, score=res.score_at_mn, start_i=m, start_j=n
    )
