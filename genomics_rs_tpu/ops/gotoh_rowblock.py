"""Lean full-width row-block Gotoh kernel (score + bottom emission).

The rolling-block engines (``models/longalign.score_long`` for
chromosome-scale scores, ``align_checkpointed``'s forward pass) fill a
pair as full-width row blocks, carrying only each block's bottom
boundary row — the TPU-native replacement for the reference's
all-in-memory fill (``/root/reference/src/alignment/algo.rs:151-282``)
at sizes the reference cannot touch. Their per-block engine was the
general streamed-boundary tile kernel (``gotoh_pallas._kernel_tile``),
which pays for machinery a forward score pass never uses: direction
emission plumbing, a per-step ``k < K`` guard, left-column streams,
and one scratch load/store set per diagonal.

This kernel is the forward-pass specialization, built like the
streamed batch kernel (``gotoh_stream``): pure-SSA step bodies
unrolled ``UNROLL``-fold so scratch round-trips amortize, the col-0
left boundary computed in-register from ``h + (i0 + i) * g`` (no left
stream), and the (m, n) probe under a scalar ``pl.when``.

The recurrence uses the *pre-shift* carry factoring: because the lane
shift commutes with elementwise ops, the two post-shift combines of
the older kernels (``D' = max(shQ+h+g, shD+g)``, ``shM = max(shQ,
shD)``) are computed one diagonal early as carries ``A = max(Q+h+g,
D+g)`` and ``M = max(Q, D)`` so the step body is just ``D' =
shift(A)`` and ``SM' = shift(M)`` — the same three shifts per step,
but the combines price into ops the step already pays (A doubles as
the open/extend predecessor max, M as the cell max that feeds the
probe, the local argmax and the direction codes). Boundary masking is
a single ``iv == k`` compare: lanes ahead of the wavefront carry
bounded garbage that every lane's col-0 overwrite firewalls before
its first true cell (the stream kernel's drift argument; pre-start
garbage is only ever *shifted into* a lane on the step its col-0 fix
lands, never read by a true cell).  Semantics are identical to
``gotoh_tile_pallas(emit_dirs=False, emit_bottom=True, j0=0)`` —
pinned by tests in both modes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_pallas import (
    PACK,
    ROWS,
    TileFillResult,
    _round_up,
    _shift_down_flat,
)
from genomics_rs_tpu.ops.subst import (
    encode_chars,
    kimura_active,
    sentinel,
    sub_score,
)
from genomics_rs_tpu.ops.gotoh_scan import (
    DIR_DEL,
    DIR_INS,
    DIR_STOP,
    DIR_SUB,
    INT_MIN,
    NEG_INF,
)

#: diagonals per grid step. Env-overridable
#: (GENOMICS_TPU_CHUNK_ROWBLOCK) for hardware sweeps. Default 256
#: with UNROLL 32 from a v5e chr12 sweep (512/16 -> 256/32 is
#: +1.3%, 9.80 -> 9.92 e10 cells/s).
CHUNK = int(os.environ.get("GENOMICS_TPU_CHUNK_ROWBLOCK", "256"))
#: SSA unroll factor (one scratch load/store set per UNROLL diagonals).
#: Env-overridable (GENOMICS_TPU_UNROLL_ROWBLOCK, falling back to the
#: shared GENOMICS_TPU_UNROLL) for hardware sweeps. Default 32 from
#: v5e chr12 sweeps of the pre-shift-carry body (2/4/8/16/32 ->
#: 8.3/8.9/9.4/9.6/9.75 e10 cells/s at CHUNK=512; 256/32 lands
#: 9.92 e10).
UNROLL = int(
    os.environ.get(
        "GENOMICS_TPU_UNROLL_ROWBLOCK",
        os.environ.get("GENOMICS_TPU_UNROLL", "32"),
    )
)

# The chunk loop runs chunk // UNROLL blocks — a non-divisor sweep
# value would silently skip CHUNK % UNROLL diagonals per chunk.
if UNROLL < 1 or CHUNK % UNROLL:
    raise ValueError(
        f"GENOMICS_TPU_UNROLL={UNROLL} must be >= 1 and divide "
        f"CHUNK={CHUNK}"
    )
# emit_dirs packs PACK (16) codes per int32 word along the diagonal
# axis and sizes the dirs out-block as (CHUNK // PACK, ...): a CHUNK
# that PACK doesn't divide would write past the block / misalign the
# (Kp // PACK, V) layout — corrupt tracebacks from a sweep knob.
if CHUNK < PACK or CHUNK % PACK:
    raise ValueError(
        f"GENOMICS_TPU_CHUNK_ROWBLOCK={CHUNK} must be a multiple of "
        f"the dirs pack width ({PACK})"
    )


def _kernel_rows(
    scalars,  # SMEM int32[8]: m, n, sm, sx, g, h, i0, st|pad
    s1m_ref,  # VMEM int32 (8, C): s1m[v] = s1_block[v-1]
    s2i_ref,  # SMEM int32 (1, chunk): injected s2 chars
    top_ref,  # SMEM int32 (3, chunk): row-0 I/S/D stream
    *rest,  # [left_ref], [bot_ref], fin_ref, [bv, bk], [dirs], [cols], scratch
    C: int,
    K: int,
    R: int,
    chunk: int,
    is_local: bool,
    emit_dirs: bool,
    emit_bottom: bool,
    has_left: bool,
    emit_cols: bool,
    unroll: int,
    kimura: bool = False,
):
    idx = 0
    if has_left:
        left_ref = rest[idx]  # SMEM (3, chunk): col-j0 I/S/D at row k
        idx += 1
    if emit_bottom:
        bot_ref = rest[idx]
        idx += 1
    fin_ref = rest[idx]
    idx += 1
    if is_local:
        bv_ref, bk_ref = rest[idx], rest[idx + 1]
        idx += 2
    if emit_dirs:
        dirs_ref = rest[idx]
        idx += 1
    if emit_cols:
        cols_ref = rest[idx]  # (1, 3, ROWS, C) out block: window pane
        idx += 1
    s2j_ref, Ip, Pp, Ap, Mp, SMp, fin_s = rest[idx : idx + 7]
    idx += 7
    if is_local:
        bv_s, bk_s = rest[idx], rest[idx + 1]
        idx += 2
    if emit_dirs:
        acc_s = rest[idx]
        idx += 1
    if emit_cols:
        cI_s, cS_s, cD_s = rest[idx : idx + 3]

    g_id = pl.program_id(0)
    m = scalars[0]
    n = scalars[1]
    sm = scalars[2]
    sx = scalars[3]
    gg = scalars[4]
    hh = scalars[5]
    i0 = scalars[6]
    st = scalars[7] if kimura else None
    hg = hh + gg
    mi0 = m - i0  # tile-local probe lane (may be out of [0, R])

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1)
    iv = row_idx * C + col_idx
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)
    zero = jnp.int32(0)

    @pl.when(g_id == 0)
    def _init():
        full_neg = jnp.full((ROWS, C), neg, dtype=jnp.int32)
        Ip[:] = full_neg
        Pp[:] = full_neg
        Ap[:] = full_neg
        Mp[:] = full_neg
        SMp[:] = full_neg
        s2j_ref[:] = jnp.full((ROWS, C), 0xFF, dtype=jnp.int32)
        fin_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        if is_local:
            bv_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
            bk_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
        if emit_dirs:
            acc_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
        if emit_cols:
            cI_s[:] = full_neg
            cS_s[:] = full_neg
            cD_s[:] = full_neg

    row0_mask = iv == 0
    # Lanes beyond the block's true rows are padding; without this
    # guard their garbage could alias the probe lane or enter the
    # local argmax when a NON-final block has m - i0 < V (the tile
    # kernel's gtR_mask).
    leR_mask = iv <= R
    # Col-0 left boundary: D(i0+iv, 0) = h + (i0+iv)*g, I/S = -inf
    # (global_boundary_left semantics, computed in-register).
    Dcol = (hh + i0 * gg) + iv * gg
    if is_local:
        lem_mask = (iv <= mi0) & leR_mask
    probe_mask = (iv == mi0) & leR_mask
    lane_r, lane_c = divmod(R, C)

    V = ROWS * C

    def step_ssa(state, t, k):
        (s2j0, I0, P0, A0, M0, SM0, bv0, bk0, acc0, cI0, cS0, cD0) = state
        inj = s2i_ref[0, t]
        s2j = _shift_down_flat(s2j0, inj, row_idx, col_idx, C)
        # Pre-shift carries: D' = shift(A), S' = sub + SM where SM is
        # the one-step-delayed shift(M) (M of diagonal k-2, shifted).
        Dnew = _shift_down_flat(A0, neg, row_idx, col_idx, C)
        SMnew = _shift_down_flat(M0, neg, row_idx, col_idx, C)

        sub = sub_score(s1m_ref[:], s2j, sm, sx, st)
        if is_local:
            Inew = jnp.maximum(jnp.maximum(I0 + gg, P0 + hg), zero)
        else:
            Inew = jnp.maximum(I0 + gg, P0 + hg)
        # Local zero floors on D and on the S predecessor max ride in
        # the A/M carries (folded before their shift), so S/D are one
        # op each here in both modes.
        Snew = sub + SM0

        # Boundary: the col-0 lane (iv == k) gets the left boundary;
        # lane 0 gets the top stream. Lanes ahead of the wavefront
        # (iv > k) carry garbage that this same col-0 overwrite
        # firewalls before any true cell reads it; right-of-column
        # garbage drifts unclamped (int32 headroom argument as the
        # flat batch kernel — both windows are <= K steps).
        col0 = iv == k
        if has_left:
            # Windowed fill: the left boundary is a checkpointed
            # interior column streamed in like the tile kernel's
            # (gotoh_pallas._kernel_tile left_ref fix).
            Inew = jnp.where(col0, left_ref[0, t], Inew)
            Snew = jnp.where(col0, left_ref[1, t], Snew)
            Dnew = jnp.where(col0, left_ref[2, t], Dnew)
        else:
            Inew = jnp.where(col0, neg, Inew)
            Snew = jnp.where(col0, neg, Snew)
            Dnew = jnp.where(col0, Dcol, Dnew)
        Qnew = jnp.maximum(Inew, Snew)
        # Row-0 fixes only land on Q and D: lane 0's I/P are never
        # read (lane 0 is re-fixed every step) and S/P feed nothing
        # the Q/D fixes don't already cover. topQ is a scalar max of
        # two SMEM reads — scalar-unit work, no vector slot.
        topQ = jnp.maximum(top_ref[0, t], top_ref[1, t])
        Qnew = jnp.where(row0_mask, topQ, Qnew)
        Dnew = jnp.where(row0_mask, top_ref[2, t], Dnew)
        Mnew = jnp.maximum(Qnew, Dnew)
        if is_local:
            Mnew = jnp.maximum(Mnew, zero)

        if emit_cols:
            # Column checkpoints at stride V: cell (iv, j) with
            # j = k - iv is on a checkpointed column exactly when
            # k mod V == iv (stride == lane count, so exactly one
            # lane captures per step, and a window's V capture steps
            # are contiguous — the pane completes right at a chunk
            # boundary since V % chunk == 0). Lane 0 (the block's top
            # row) is junk here (row-0 fixes land on Q/D only) but is
            # never consumed: windowed refills take row i0 from the
            # row checkpoints. Panes beyond the last true diagonal
            # keep stale values — those columns are > n and never
            # consumed either.
            cmask = iv == jax.lax.rem(k, jnp.int32(V))
            cI0 = jnp.where(cmask, Inew, cI0)
            cS0 = jnp.where(cmask, Snew, cS0)
            cD0 = jnp.where(cmask, Dnew, cD0)

        if emit_dirs:
            # Same code chain (and tie order SUB > INS > DEL > STOP)
            # as the tile kernel; packed 16 codes per int32 word along
            # the diagonal axis, flushed per word and at the final
            # true diagonal (a partial last word still lands). Row-0
            # codes are walked (e.g. the monolithic fill's top row),
            # so dirs mode also fixes I/S at lane 0 to keep the code
            # comparisons exact there.
            Id = jnp.where(row0_mask, top_ref[0, t], Inew)
            Sd = jnp.where(row0_mask, top_ref[1, t], Snew)
            dcode = jnp.where(
                Mnew == Sd,
                DIR_SUB,
                jnp.where(
                    Mnew == Id,
                    DIR_INS,
                    jnp.where(Mnew == Dnew, DIR_DEL, DIR_STOP),
                ),
            )
            sp = t % PACK
            acc0 = jnp.where(sp == 0, 0, acc0) | (dcode << (2 * sp))

            @pl.when((sp == PACK - 1) | (k == K - 1))
            def _flush():
                dirs_ref[t // PACK] = acc0

        if is_local:
            # in_true: lane started (iv <= k), iv <= m-i0, 0 <= j <= n
            # (j = k - iv).
            val = jnp.where(
                lem_mask & (iv <= k) & (iv >= k - n), Mnew, int_min
            )
            upd = val >= bv0
            bv0 = jnp.where(upd, val, bv0)
            bk0 = jnp.where(upd, k - iv, bk0)

        @pl.when(k == mi0 + n)
        def _probe():
            fin_s[:] = jnp.where(probe_mask, Mnew, fin_s[:])

        if emit_bottom:
            # Bottom row: cell (R, k - R) — three scalars broadcast
            # into this step's (3, 128) row of the bottom output block.
            vals = jnp.stack(
                [
                    Inew[lane_r, lane_c],
                    Snew[lane_r, lane_c],
                    Dnew[lane_r, lane_c],
                ]
            )
            bot_ref[t] = jnp.broadcast_to(vals[:, None], (3, 128))

        if is_local:
            Anew = jnp.maximum(
                jnp.maximum(Qnew + hg, Dnew + gg), zero
            )
        else:
            Anew = jnp.maximum(Qnew + hg, Dnew + gg)
        return (
            s2j,
            Inew,
            jnp.maximum(Snew, Dnew),
            Anew,
            Mnew,
            SMnew,
            bv0,
            bk0,
            acc0,
            cI0,
            cS0,
            cD0,
        )

    none3 = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    none2 = (jnp.int32(0), jnp.int32(0))
    none1 = (jnp.int32(0),)

    def body(tt, _):
        k0 = g_id * chunk + unroll * tt
        state = (
            (
                s2j_ref[:],
                Ip[:],
                Pp[:],
                Ap[:],
                Mp[:],
                SMp[:],
            )
            + ((bv_s[:], bk_s[:]) if is_local else none2)
            + ((acc_s[:],) if emit_dirs else none1)
            + ((cI_s[:], cS_s[:], cD_s[:]) if emit_cols else none3)
        )
        for sub in range(unroll):
            state = step_ssa(state, unroll * tt + sub, k0 + sub)
        (s2j_ref[:], Ip[:], Pp[:], Ap[:], Mp[:], SMp[:]) = state[:6]
        if is_local:
            bv_s[:], bk_s[:] = state[6], state[7]
        if emit_dirs:
            acc_s[:] = state[8]
        if emit_cols:
            cI_s[:], cS_s[:], cD_s[:] = state[9], state[10], state[11]
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)

    if emit_cols:
        # The out block for the window this chunk ends in stays
        # VMEM-resident until its index changes (Pallas revisiting),
        # so writing the pane once per chunk costs 3 VMEM stores and
        # the HBM DMA only fires once per completed window.
        cols_ref[0, 0] = cI_s[:]
        cols_ref[0, 1] = cS_s[:]
        cols_ref[0, 2] = cD_s[:]

    @pl.when(g_id == pl.num_programs(0) - 1)
    def _finalize():
        fin_ref[:] = fin_s[:]
        if is_local:
            bv_ref[:] = bv_s[:]
            bk_ref[:] = bk_s[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "is_local", "emit_dirs", "emit_bottom", "emit_cols", "interpret"
    ),
)
def gotoh_rowblock_pallas(
    s1_block: jax.Array,
    s2e: jax.Array,
    top: jax.Array,
    m: jax.Array,
    n: jax.Array,
    i0: jax.Array,
    scores: Scores,
    is_local: bool,
    emit_dirs: bool = False,
    emit_bottom: bool = True,
    emit_cols: bool = False,
    left: jax.Array | None = None,
    interpret: bool = False,
) -> TileFillResult:
    """Fill full-width rows [i0+1, i0+R] given the row-i0 boundary.

    Drop-in for ``gotoh_tile_pallas(..., j0=0, emit_bottom=True)``:
    returns ``TileFillResult`` with ``bottom`` (3, B+1) I/S/D of row
    i0+R, ``score_at_mn`` (captured when the block contains row m),
    local-mode ``best`` in global coords, and — with ``emit_dirs`` —
    the packed direction words (Kp/16, V) in the tile kernel's exact
    layout (``walk_block`` / ``unpack_dirs`` compatible; codes at
    padded lanes/steps are garbage the walker never visits).
    ``emit_bottom=False`` drops the bottom-row output and its
    per-step HBM store — use it when only dirs/score are consumed
    (the monolithic fill, the checkpointed backward refills).
    Callers should size R so R+1 is a multiple of 1024 (e.g. 16383):
    the lane vector covers R+1 rows rounded up to 1024.

    Round-4 windowed-traceback extensions:

    * ``emit_cols`` — additionally checkpoint the I/S/D of every
      column at stride V (one compare + three selects per step;
      ``TileFillResult.cols`` (NC, 3, V)). These are the left
      boundaries that let the backward pass refill narrow column
      WINDOWS instead of [0, n] (``models/longalign``).
    * ``left`` — (3, R) I/S/D of the fill's column-0 boundary at rows
      i0+1..i0+R, replacing the in-register global col-0 formula:
      pass a checkpointed column to fill the window starting there.
      With ``left`` the caller's ``s2e``/``n``/``top`` are
      window-local (``top`` starts at the window corner); row
      coordinates (m, i0) stay global.
    """
    R = s1_block.shape[0]
    B = s2e.shape[0]
    V = max(_round_up(R + 1, 1024), 1024)
    C = V // ROWS
    K = R + B + 1
    Kp = _round_up(K, CHUNK)
    if emit_cols and V % CHUNK:
        # Window panes must complete exactly at chunk boundaries (the
        # cols out-block index flips at window boundaries).
        raise ValueError(
            f"emit_cols needs V ({V}) to be a multiple of CHUNK "
            f"({CHUNK})"
        )

    s1m = jnp.full((V,), sentinel(0xFD, scores), dtype=jnp.int32)
    s1m = jax.lax.dynamic_update_slice(
        s1m, encode_chars(s1_block, scores), (jnp.int32(1),)
    )
    s1m2d = s1m.reshape(ROWS, C)

    ks = jnp.arange(Kp, dtype=jnp.int32)
    s2inj = jnp.take(encode_chars(s2e, scores), jnp.clip(ks - 1, 0, B - 1))
    s2inj = jnp.where(ks - 1 >= B, sentinel(0xFF, scores), s2inj)[None, :]

    neg = jnp.int32(NEG_INF)
    top_stream = jnp.full((3, Kp), neg, dtype=jnp.int32)
    top_stream = jax.lax.dynamic_update_slice(
        top_stream, top.astype(jnp.int32), (jnp.int32(0), jnp.int32(0))
    )
    if left is not None:
        # Lane k's col-0 fix lands at step k: stream positions 1..R
        # hold the left-boundary rows i0+1..i0+R (position 0 is the
        # corner, covered by the top stream's row-0 fix at lane 0).
        left_stream = jnp.full((3, Kp), neg, dtype=jnp.int32)
        left_stream = jax.lax.dynamic_update_slice(
            left_stream,
            left.astype(jnp.int32),
            (jnp.int32(0), jnp.int32(1)),
        )

    kim = kimura_active(scores)
    scalars = jnp.stack(
        [
            jnp.asarray(m, jnp.int32),
            jnp.asarray(n, jnp.int32),
            jnp.int32(scores.s_match),
            jnp.int32(scores.s_mismatch),
            jnp.int32(scores.g),
            jnp.int32(scores.h),
            jnp.asarray(i0, jnp.int32),
            # st rides the spare slot in kimura variants.
            jnp.int32(scores.s_transition if kim else 0),
        ]
    )

    G = Kp // CHUNK
    vec_spec = pl.BlockSpec(
        (ROWS, C), lambda g, s: (0, 0), memory_space=pltpu.VMEM
    )
    vec_out = jax.ShapeDtypeStruct((ROWS, C), jnp.int32)
    n_panes = 4 if is_local else 2
    out_specs: list = []
    out_shapes: list = []
    if emit_bottom:
        out_specs.append(
            pl.BlockSpec(
                (CHUNK, 3, 128),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((Kp, 3, 128), jnp.int32))
    out_specs += [vec_spec] * (n_panes - 1)
    out_shapes += [vec_out] * (n_panes - 1)
    n_scratch = 9 if is_local else 7
    if emit_dirs:
        out_specs.append(
            pl.BlockSpec(
                (CHUNK // PACK, ROWS, C),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((Kp // PACK, ROWS, C), jnp.int32)
        )
        n_scratch += 1  # pack accumulator
    NC = (Kp + V - 1) // V
    if emit_cols:
        out_specs.append(
            pl.BlockSpec(
                (1, 3, ROWS, C),
                lambda g, s: ((g * CHUNK) // V, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((NC, 3, ROWS, C), jnp.int32)
        )
        n_scratch += 3  # I/S/D capture panes
    in_specs = [
        vec_spec,
        pl.BlockSpec(
            (1, CHUNK), lambda g, s: (0, g), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (3, CHUNK), lambda g, s: (0, g), memory_space=pltpu.SMEM
        ),
    ]
    ins = [scalars, s1m2d, s2inj, top_stream]
    if left is not None:
        in_specs.append(
            pl.BlockSpec(
                (3, CHUNK), lambda g, s: (0, g), memory_space=pltpu.SMEM
            )
        )
        ins.append(left_stream)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((ROWS, C), jnp.int32)] * n_scratch,
    )
    # Interpret mode (CPU tests) evaluates the traced body per
    # primitive — a wide SSA body is pure tracing/eval overhead
    # there, so interpret runs keep a tiny unroll (semantics are
    # unroll-invariant; pinned by the parity tests either way).
    unroll = min(UNROLL, 2) if interpret else UNROLL
    kernel = functools.partial(
        _kernel_rows,
        C=C,
        K=K,
        R=R,
        chunk=CHUNK,
        is_local=is_local,
        emit_dirs=emit_dirs,
        emit_bottom=emit_bottom,
        has_left=left is not None,
        emit_cols=emit_cols,
        unroll=unroll,
        kimura=kim,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*ins)

    oi = 0
    if emit_bottom:
        bot = outs[oi]
        oi += 1
        bottom = jnp.transpose(bot[R : R + B + 1, :, 0], (1, 0))
    else:
        bottom = None
    fin = outs[oi]
    if is_local:
        bv, bk = outs[oi + 1], outs[oi + 2]
        oi += 2
    oi += 1
    if emit_dirs:
        dirs = outs[oi].reshape(Kp // PACK, V)
        oi += 1
    else:
        dirs = None
    cols = outs[oi].reshape(NC, 3, V) if emit_cols else None
    if not is_local:
        return TileFillResult(
            dirs=dirs,
            score_at_mn=jnp.max(fin.reshape(V)),
            best=(jnp.int32(INT_MIN), jnp.int32(0), jnp.int32(0)),
            bottom=bottom,
            cols=cols,
        )
    ivf = jnp.arange(V, dtype=jnp.int32)
    bvf = bv.reshape(V)
    bkf = bk.reshape(V)
    vmax = jnp.max(bvf)
    ig = jnp.asarray(i0, jnp.int32) + ivf
    i_best = jnp.max(jnp.where(bvf == vmax, ig, -1))
    j_best = jnp.max(jnp.where((bvf == vmax) & (ig == i_best), bkf, -1))
    return TileFillResult(
        dirs=dirs,
        score_at_mn=jnp.max(fin.reshape(V)),
        best=(vmax, i_best, j_best),
        bottom=bottom,
        cols=cols,
    )
