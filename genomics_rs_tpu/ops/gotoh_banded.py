"""Banded Gotoh kernel: full affine-gap alignment inside a diagonal band.

A capability the reference does not have (its only modes are the full
O(mn) global/local fills, ``/root/reference/src/alignment/algo.rs:151-282``):
when two sequences are known to be similar — resequenced samples,
same-species chromosomes, long reads against a reference window — the
optimal path stays near the main diagonal and the O(mn) fill wastes
almost all of its cells. This kernel fills only a width-``V`` band
around the length-proportional diagonal: O(m*V) cells, O(m*V/16)
packed direction words — chr12 x chr12 full alignment drops from
1.16e12 cells / 41 s (hierarchical checkpoints) to 2.2e9 cells at
V=2048.

Formulation (vs the wavefront kernels' anti-diagonal vectors): lanes
are BAND OFFSETS. Lane ``v`` of row ``i`` holds column
``j = off(i) + v + 1`` where::

    off(i) = clamp((i * n) // m - V // 2, 0, max(0, n - V))

so the window tracks the (i * n / m) diagonal and ``delta(i) =
off(i) - off(i-1)`` is 0 or 1 whenever ``n <= m`` (the wrapper
enforces this; swap the pair otherwise). Per row:

* D (vertical, consume s1) reads the previous row at the same column:
  the pre-shift carry ``A = max(max(I, S) + h + g, D + g)`` is
  computed on the producing row and aligned by ``delta`` on the
  consuming row (one conditional lane shift, ``gotoh_rowblock``'s
  carry trick);
* S (diagonal) likewise via the carried row max ``M``, aligned by
  ``delta - 1``;
* I (horizontal, consume s2) is a first-order (max, +) recurrence
  along the row — solved by a three-phase hierarchical prefix scan
  over the (8, C) lane pane (within-sublane doubling rounds, a
  cross-sublane scan of the 8 row aggregates, then a broadcast
  combine), the same trick as ``gotoh_shortread`` restated for the
  flat single-pair lane space.

Out-of-band predecessors are -inf (strict banded semantics: the
result equals the full DP iff an optimal path stays inside the band;
with ``V >= n`` the band covers everything and the output is
bit-identical to the monolithic fill — pinned by tests). Direction
codes use the reference tie order (S > I > D) and are packed 16
consecutive ROWS per int32 word at each lane (``dirs[(i-1)//16, v]``),
walked by :func:`walk_banded` which re-derives ``off(i)`` per step.

Global mode only: the banded use case is end-to-end alignment of
similar sequences (local alignment of similar pairs is served by the
full kernels and the mapper's seed-and-extend).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_pallas import (
    ROWS,
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

#: rows per grid step (SMEM stream block width); a multiple of the
#: 16-row dirs pack so chunks never split a packed word.
RC = 256
#: 2-bit codes per packed word (rows per int32).
PACK = 16
#: SSA unroll (rows per scratch round-trip). Env knob for sweeps;
#: RC % BAND_UNROLL must be 0.
import os as _os

BAND_UNROLL = int(_os.environ.get("GENOMICS_TPU_UNROLL_BANDED", "16"))
if BAND_UNROLL < 1 or RC % BAND_UNROLL:
    raise ValueError(
        f"GENOMICS_TPU_UNROLL_BANDED={BAND_UNROLL} must divide RC={RC}"
    )


def band_offset(i, m: int, n: int, V: int):
    """Window start of row ``i``: columns ``off+1 .. off+V`` are in
    band. Host-side planning math (numpy); the device walker
    re-derives the same integer formula."""
    lo = (np.asarray(i, np.int64) * n) // m - V // 2
    return np.clip(lo, 0, max(0, n - V))


def _shift_up_flat(x, incoming, row_idx, col_idx, C):
    """y[v] = x[v+1] over the flat (8, C) lane space; y[V-1] = incoming.

    ``pltpu.roll`` only takes non-negative shifts — an up-shift by one
    is a roll by size-1.
    """
    r = pltpu.roll(x, shift=C - 1, axis=1)
    col = x[:, 0:1]
    colr = pltpu.roll(col, shift=ROWS - 1, axis=0)
    fix = jnp.where(row_idx[:, :1] == ROWS - 1, incoming, colr)
    return jnp.where(col_idx == C - 1, fix, r)


def _kernel_banded(
    scalars,  # SMEM int32[8]: sm, sx, g, h, m, n, v_mn, pad
    s2init_ref,  # VMEM int32 (8, C): s2 chars of the row-0 window
    s1c_ref,  # SMEM int32 (1, RC): s1 char per row
    delta_ref,  # SMEM int32 (1, RC): window slide per row (0/1)
    s2in_ref,  # SMEM int32 (1, RC): char entering the window (delta=1)
    fillM_ref,  # SMEM int32 (1, RC): M-shift left fill per row
    fillN_ref,  # SMEM int32 (1, RC): I-seed left fill per row
    dirs_ref,  # VMEM out (RC//16, 8, C): packed codes, 16 rows/word
    fin_ref,  # VMEM out (8, C): probe capture at (m, n)
    s2w,  # scratch (8, C): window s2 chars
    Ap,  # scratch: pre-shift D carry of the previous row
    Mp,  # scratch: previous row's cell max
    fin_s,  # scratch: running probe capture
    acc_s,  # scratch: dirs pack accumulator
    *,
    C: int,
    chunk: int,
    unroll: int,
    kimura: bool = False,
):
    g_id = pl.program_id(0)
    sm = scalars[0]
    sx = scalars[1]
    gg = scalars[2]
    hh = scalars[3]
    m = scalars[4]
    v_mn = scalars[6]
    st = scalars[7] if kimura else None
    hg = hh + gg

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1)
    iv = row_idx * C + col_idx
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)

    @pl.when(g_id == 0)
    def _init():
        # Row 0 (off = 0, j = v + 1): I = h + j*g, S = D = -inf, so
        # M(0, j) = h + j*g and A = max(M + h + g, -inf) = M + h + g.
        M0 = hh + (iv + 1) * gg
        Mp[:] = M0
        Ap[:] = M0 + hg
        s2w[:] = s2init_ref[:]
        fin_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        acc_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)

    def scan_maxplus(x):
        """In-row (max, +) prefix: out[v] = max_{t<=v} x[t] + (v-t)*g.

        Phase A doubles within sublane rows, phase B scans the 8 row
        aggregates across sublanes, phase C combines the previous
        rows' aggregate into every lane.
        """
        d = 1
        while d < C:
            r = pltpu.roll(x, shift=d, axis=1)
            r = jnp.where(col_idx < d, neg, r)
            x = jnp.maximum(x, r + d * gg)
            d *= 2
        agg = x[:, C - 1 : C]  # (8, 1) per-sublane-row totals
        d = 1
        while d < ROWS:
            ra = pltpu.roll(agg, shift=d, axis=0)
            ra = jnp.where(row_idx[:, :1] < d, neg, ra)
            agg = jnp.maximum(agg, ra + d * C * gg)
            d *= 2
        prev = pltpu.roll(agg, shift=1, axis=0)
        prev = jnp.where(row_idx[:, :1] == 0, neg, prev)
        return jnp.maximum(x, prev + (col_idx + 1) * gg)

    def step(state, t, i):
        s2w0, A0, M0, fin0, acc0 = state
        dlt = delta_ref[0, t]
        is1 = dlt == 1
        # Align the previous row's carries to this row's window:
        # D reads the SAME column (shift up by delta), S reads the
        # PREVIOUS column (shift down by 1 - delta).
        A_up = _shift_up_flat(A0, neg, row_idx, col_idx, C)
        Dn = jnp.where(is1, A_up, A0)
        M_dn = _shift_down_flat(
            M0, fillM_ref[0, t], row_idx, col_idx, C
        )
        M_al = jnp.where(is1, M0, M_dn)
        s2_up = _shift_up_flat(
            s2w0, s2in_ref[0, t], row_idx, col_idx, C
        )
        s2w1 = jnp.where(is1, s2_up, s2w0)

        sub = sub_score(s1c_ref[0, t], s2w1, sm, sx, st)
        Sn = sub + M_al
        P = jnp.maximum(Sn, Dn)
        seed = _shift_down_flat(
            P + hg, fillN_ref[0, t], row_idx, col_idx, C
        )
        In = scan_maxplus(seed)
        cm = jnp.maximum(In, P)

        code = jnp.where(
            cm == Sn,
            DIR_SUB,
            jnp.where(
                cm == In,
                DIR_INS,
                jnp.where(cm == Dn, DIR_DEL, DIR_STOP),
            ),
        )
        sp = (i - 1) % PACK
        acc1 = jnp.where(sp == 0, 0, acc0) | (code << (2 * sp))

        @pl.when(sp == PACK - 1)
        def _flush():
            dirs_ref[(t // PACK)] = acc1

        fin1 = jnp.where((i == m) & (iv == v_mn), cm, fin0)

        An = jnp.maximum(jnp.maximum(In, Sn) + hg, Dn + gg)
        return s2w1, An, cm, fin1, acc1

    refs = (s2w, Ap, Mp, fin_s, acc_s)

    def body(tt, _):
        state = tuple(r[:] for r in refs)
        base = tt * unroll
        for sub_t in range(unroll):
            t = base + sub_t
            i = g_id * chunk + t + 1
            state = step(state, t, i)
        for r, v in zip(refs, state):
            r[:] = v
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)

    @pl.when(g_id == pl.num_programs(0) - 1)
    def _finalize():
        fin_ref[:] = fin_s[:]


@functools.partial(
    jax.jit, static_argnames=("V", "m", "n", "interpret")
)
def _banded_call(
    s1e: jax.Array,
    s2e: jax.Array,
    scores: Scores,
    V: int,
    m: int,
    n: int,
    interpret: bool,
):
    C = V // ROWS
    Mp = _round_up(m, RC)
    neg = jnp.int32(NEG_INF)
    gg = jnp.int32(scores.g)
    hh = jnp.int32(scores.h)

    # Host-side per-row streams (numpy: m/n/V are static here).
    rows = np.arange(1, Mp + 1, dtype=np.int64)
    off = band_offset(rows, m, n, V).astype(np.int64)
    off_prev = band_offset(rows - 1, m, n, V).astype(np.int64)
    delta = (off - off_prev).astype(np.int32)
    if delta.max(initial=0) > 1 or delta.min(initial=0) < 0:
        raise ValueError(
            f"band window slides by more than one column per row "
            f"(m={m}, n={n}): banded alignment needs n <= m"
        )

    s1_idx = np.minimum(rows - 1, s1e.shape[0] - 1).astype(np.int32)
    s1c = jnp.take(
        encode_chars(jnp.asarray(s1e), scores), jnp.asarray(s1_idx)
    )[None, :]
    # Char entering the window on the right when delta == 1:
    # column off(i) + V, i.e. s2e[off(i) + V - 1].
    in_idx = np.minimum(off + V - 1, s2e.shape[0] - 1).astype(np.int32)
    s2in = jnp.take(
        encode_chars(jnp.asarray(s2e), scores), jnp.asarray(in_idx)
    )[None, :]
    # Left fills: real col-0 boundary values while the window still
    # touches column 0, -inf once the band has moved past it. (jnp:
    # the scores ride through the jit as traced scalars.)
    at0 = jnp.asarray(off == 0)
    rj = jnp.asarray(rows, jnp.int32)
    fillM = jnp.where(
        at0,
        jnp.where(rj == 1, 0, hh + (rj - 1) * gg),
        neg,
    )[None, :]
    fillN = jnp.where(at0, hh + rj * gg + hh + gg, neg)[None, :]

    s2init = jnp.full((V,), sentinel(0xFF, scores), dtype=jnp.int32)
    take_n = min(V, len(s2e))
    s2init = jax.lax.dynamic_update_slice(
        s2init,
        encode_chars(jnp.asarray(s2e[:take_n]), scores),
        (jnp.int32(0),),
    ).reshape(ROWS, C)

    v_mn = int(n - int(band_offset(m, m, n, V)) - 1)
    scalars = jnp.stack(
        [
            jnp.int32(scores.s_match),
            jnp.int32(scores.s_mismatch),
            gg,
            hh,
            jnp.int32(m),
            jnp.int32(n),
            jnp.int32(v_mn),
            # st rides the spare slot in kimura variants.
            jnp.int32(
                scores.s_transition if kimura_active(scores) else 0
            ),
        ]
    )

    G = Mp // RC
    smem_row = pl.BlockSpec(
        (1, RC), lambda g, s: (0, g), memory_space=pltpu.SMEM
    )
    unroll = 2 if interpret else BAND_UNROLL
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (ROWS, C), lambda g, s: (0, 0), memory_space=pltpu.VMEM
            ),
            smem_row,
            smem_row,
            smem_row,
            smem_row,
            smem_row,
        ],
        out_specs=(
            pl.BlockSpec(
                (RC // PACK, ROWS, C),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ROWS, C), lambda g, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[pltpu.VMEM((ROWS, C), jnp.int32)] * 5,
    )
    kernel = functools.partial(
        _kernel_banded,
        C=C,
        chunk=RC,
        unroll=unroll,
        kimura=kimura_active(scores),
    )
    dirs, fin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Mp // PACK, ROWS, C), jnp.int32),
            jax.ShapeDtypeStruct((ROWS, C), jnp.int32),
        ),
        interpret=interpret,
    )(
        scalars,
        s2init,
        s1c,
        jnp.asarray(delta)[None, :],
        s2in,
        jnp.asarray(fillM),
        jnp.asarray(fillN),
    )
    return jnp.max(fin.reshape(V)), dirs.reshape(Mp // PACK, V)


def gotoh_banded(
    s1e, s2e, m: int, n: int, scores: Scores, V: int,
    interpret: bool = False,
):
    """Banded global fill. Returns ``(score, dirs)`` with ``dirs``
    the packed direction words (``dirs[(i-1)//16, j - off(i) - 1]``,
    16 rows per int32). ``m``/``n`` must be concrete (the band
    geometry is planned host-side); requires ``1 <= n <= m`` and
    ``V`` a multiple of 1024."""
    if V < 1024 or V % 1024:
        raise ValueError(f"band width V={V} must be a multiple of 1024")
    if not 1 <= n <= m:
        raise ValueError(
            f"banded alignment needs 1 <= n ({n}) <= m ({m}); swap "
            "the pair (the band tracks the length-proportional "
            "diagonal, which must slide at most one column per row)"
        )
    return _banded_call(
        s1e, s2e, scores, V=int(V), m=int(m), n=int(n),
        interpret=bool(interpret),
    )


#: dependent walk steps per while-loop iteration (see
#: ops/traceback_device.walk_block — same amortization). Env knob
#: for hardware sweeps.
WALK_UNROLL = int(_os.environ.get("GENOMICS_TPU_WALK_UNROLL", "8"))

# ---- Mosaic hardware-loop banded walker -----------------------------
# The XLA while_loop walker below costs ~1.5 us/move; at chr12 scale
# the ~2.16M-move chase is the banded path's biggest cost after the
# fill. This is ops/traceback_pallas._kernel_walk re-derived for the
# banded layout: words are ROW-packed (dirs[(i-1)//16, v], v = j -
# off(i) - 1), so the SMEM window follows (row word, band lane) and a
# second window of the per-row deltas rides along to track off(i)
# incrementally.

#: kwords per DMA window (the lane window is spelled 2 * 128 at its
#: use sites). NOTE: the deltas window (dpatch, 4 x 128 rows = 512
#: entries) must cover rows [16*dkb, ...]; dbase can sit up to 112
#: rows below the dirs window start (the >>7 floor), so the deltas
#: index reaches 112 + 16*_PKW - 1 and _PKW must stay <= 25 — the
#: full walker's sweep (traceback_pallas.PKW = 34) does NOT transfer
#: here.
_PKW = 18
_MPW = 16
_MAX_STEPS_CAP = 65536


def _kernel_walk_banded(
    scalars,  # SMEM int32[4]: m, n, off_m
    dirs_ref,  # ANY (KW, V/128, 128) packed words (HBM)
    deltas_ref,  # ANY (D, 128): delta entering row i at [.//128, .%128]
    words_ref,  # VMEM (NW, 128): packed move codes (column 0)
    meta_ref,  # VMEM (8, 128): pos, i, j, done, oob (column 0)
    patch_ref,  # SMEM (PKW, 2, 128): dirs window
    dpatch_ref,  # SMEM (4, 128): deltas window (128-lane rows — a
    #   16-wide last dim violates the DMA tiling at scale)
    sem,
    sem2,
    *,
    KW: int,
    VG: int,
    V: int,
    D: int,
    max_steps: int,
):
    m = scalars[0]
    off_m = scalars[2]

    def outer_cond(st):
        i, j, off, pos, done, oob, acc = st
        return (done == 0) & (oob == 0) & (pos < max_steps)

    def outer_body(st):
        i, j, off, pos, done, oob, acc = st
        # A state already outside the band (v out of [0, V) with both
        # coords interior) can never re-enter ANY window: flag oob
        # here instead of re-windowing forever — the in-window `bad`
        # check is suppressed by `halted` for such states, so without
        # this the kernel would spin with pos frozen (corrupt-bitmap
        # walks must surface as the wrapper's oob error, not a wedged
        # scalar core).
        v_cur = j - off - 1
        oob = jnp.where(
            (done == 0)
            & (i > 0)
            & (j > 0)
            & ((v_cur < 0) | (v_cur >= V)),
            1,
            oob,
        )
        row0 = jnp.maximum(i - 1, 0) >> 4
        kb = jnp.maximum(row0 - (_PKW - 2), 0)
        kb = jnp.minimum(kb, KW - _PKW)
        v0 = jnp.clip(j - off - 1, 0, V - 1)
        lbi = jnp.maximum(v0 >> 7, 1) - 1
        lbi = jnp.minimum(lbi, VG - 2)
        dma = pltpu.make_async_copy(
            dirs_ref.at[pl.ds(kb, _PKW), pl.ds(lbi, 2), :],
            patch_ref,
            sem,
        )
        dma.start()
        # Deltas for the window's rows [16*kb, 16*kb + 16*PKW) live in
        # <= 4 consecutive 128-wide rows of the (D, 128) layout.
        dkb = jnp.minimum((16 * kb) >> 7, D - 4)
        dma2 = pltpu.make_async_copy(
            deltas_ref.at[pl.ds(dkb, 4), :], dpatch_ref, sem2
        )
        dma2.start()
        dma.wait()
        dma2.wait()
        lb = lbi * 128
        dbase = dkb * 128

        def in_window(i, j, v):
            row = (i - 1) >> 4
            return (
                (i == 0)
                | (j == 0)
                | (
                    (row >= kb)
                    & (row < kb + _PKW)
                    & (v >= lb)
                    & (v < lb + 2 * 128)
                )
            )

        def in_cond(st2):
            i, j, off, pos, done, oob, acc = st2
            return (
                (done == 0)
                & (oob == 0)
                & (pos < max_steps)
                & in_window(i, j, j - off - 1)
            )

        def in_sub(st2):
            i, j, off, pos, done, oob, acc = st2
            v = j - off - 1
            halted = (
                (done != 0)
                | (oob != 0)
                | (pos >= max_steps)
                | (~in_window(i, j, v))
            )
            row = jnp.clip(((i - 1) >> 4) - kb, 0, _PKW - 1)
            lane = jnp.clip(v - lb, 0, 2 * 128 - 1)
            word = patch_ref[row, lane >> 7, lane & 127]
            code = (word >> (2 * ((i - 1) & 15))) & 3
            code = jnp.where(
                i == 0, DIR_INS, jnp.where(j == 0, DIR_DEL, code)
            )
            bad = (
                (~halted)
                & (i > 0)
                & (j > 0)
                & ((v < 0) | (v >= V) | (code == DIR_STOP))
            )
            di = jnp.where(code == DIR_INS, 0, 1)
            dj = jnp.where(code == DIR_DEL, 0, 1)
            i_new = jnp.maximum(i - di, 0)
            j_new = jnp.maximum(j - dj, 0)
            write = (~halted) & (~bad)
            sp = pos & (_MPW - 1)
            acc = jnp.where(
                write,
                jnp.where(sp == 0, 0, acc) | (code << (2 * sp)),
                acc,
            )

            @pl.when(write & (sp == _MPW - 1))
            def _flush():
                words_ref[pl.ds(pos >> 4, 1)] = jnp.full(
                    (1, 128), acc, dtype=jnp.int32
                )

            pos = jnp.where(write, pos + 1, pos)
            done_now = write & (i_new == 0) & (j_new == 0)
            keep = halted | bad
            moved_up = (~keep) & (i_new < i)
            q = jnp.clip((i - 1) - dbase, 0, 4 * 128 - 1)
            off_new = off - dpatch_ref[q >> 7, q & 127]
            return (
                jnp.where(keep, i, i_new),
                jnp.where(keep, j, j_new),
                jnp.where(moved_up, off_new, off),
                pos,
                jnp.where(done_now, 1, done),
                jnp.where(bad, 1, oob),
                acc,
            )

        def in_body(st2):
            for _ in range(WALK_UNROLL):
                st2 = in_sub(st2)
            return st2

        return jax.lax.while_loop(
            in_cond, in_body, (i, j, off, pos, done, oob, acc)
        )

    init = (
        m,
        scalars[1],
        off_m,
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
    )
    i, j, off, pos, done, oob, acc = jax.lax.while_loop(
        outer_cond, outer_body, init
    )

    @pl.when(pos % _MPW != 0)
    def _flush_partial():
        words_ref[pl.ds(pos // _MPW, 1)] = jnp.full(
            (1, 128), acc, dtype=jnp.int32
        )

    for row, val in enumerate((pos, i, j, done, oob)):
        meta_ref[pl.ds(row, 1)] = jnp.full(
            (1, 128), val, dtype=jnp.int32
        )


@functools.partial(
    jax.jit, static_argnames=("V", "max_steps", "interpret")
)
def _walk_banded_pallas(
    dirs, deltas2d, start_i, start_j, off0, V: int, max_steps: int,
    interpret: bool = False,
):
    """One bounded Mosaic chase; returns (words, pos, i, j, done, oob).

    ``deltas2d`` is the per-row slide stream viewed (D, 128) (the
    last dim must be tile-aligned for the DMA); its windows cover the
    dirs window's rows.
    """
    KW, Vd = dirs.shape
    VG = Vd // 128
    D = deltas2d.shape[0]
    NW = -(-max_steps // _MPW)
    scalars = jnp.stack(
        [
            jnp.asarray(start_i, jnp.int32),
            jnp.asarray(start_j, jnp.int32),
            jnp.asarray(off0, jnp.int32),
            jnp.int32(0),
        ]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (NW, 128), lambda g, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, 128), lambda g, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.SMEM((_PKW, 2, 128), jnp.int32),
            pltpu.SMEM((4, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel_walk_banded, KW=KW, VG=VG, V=V, D=D,
        max_steps=max_steps,
    )
    words, meta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((NW, 128), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(scalars, dirs.reshape(KW, VG, 128), deltas2d)
    return (
        words[:, 0],
        meta[0, 0],
        meta[1, 0],
        meta[2, 0],
        meta[3, 0] != 0,
        meta[4, 0] != 0,
    )


@functools.partial(jax.jit, static_argnames=("m", "n", "V", "max_steps"))
def _walk_banded_jit(dirs, deltas, off_m: jax.Array, m: int, n: int,
                     V: int, max_steps: int):
    """``deltas[i-1]`` = window slide entering row ``i``; the walker
    tracks ``off(i)`` incrementally (the closed form ``(i*n)//m``
    overflows int32 at chromosome scale and x64 is disabled)."""

    def substep(st):
        i, j, off, pos, done, oob, moves = st
        halt = done | oob | (pos >= max_steps)
        # Boundary rows/columns synthesize the reference's codes
        # (row 0 = all-INS, col 0 = all-DEL); interior cells read the
        # packed word at band lane v = j - off(i) - 1.
        v = j - off - 1
        vc = jnp.clip(v, 0, V - 1)
        word = dirs[jnp.maximum(i - 1, 0) // PACK, vc]
        code = (word >> (2 * ((i - 1) % PACK))) & 3
        code = jnp.where(i == 0, DIR_INS, jnp.where(j == 0, DIR_DEL, code))
        # A walked interior cell outside the band — or one carrying a
        # stop code in this global-mode table — is corrupt data
        # (finite-score paths never cross -inf provenance).
        bad = (
            (~halt)
            & (i > 0)
            & (j > 0)
            & ((v < 0) | (v >= V) | (code == DIR_STOP))
        )

        di = jnp.where(code == DIR_INS, 0, 1)
        dj = jnp.where(code == DIR_DEL, 0, 1)
        i_new = jnp.maximum(i - di, 0)
        j_new = jnp.maximum(j - dj, 0)
        write = (~halt) & (~bad)
        # Entering row i-1 undoes that row's window slide.
        off_new = off - deltas[jnp.maximum(i - 1, 0)]
        moves = jnp.where(
            write,
            moves.at[jnp.minimum(pos, max_steps - 1)].set(
                code.astype(jnp.uint8)
            ),
            moves,
        )
        pos = jnp.where(write, pos + 1, pos)
        done_now = write & (i_new == 0) & (j_new == 0)
        keep = halt | bad
        moved_up = (~keep) & (i_new < i)
        return (
            jnp.where(keep, i, i_new),
            jnp.where(keep, j, j_new),
            jnp.where(moved_up, off_new, off),
            pos,
            done | done_now,
            oob | bad,
            moves,
        )

    def cond(st):
        i, j, off, pos, done, oob, moves = st
        return (~done) & (~oob) & (pos < max_steps)

    def body(st):
        for _ in range(WALK_UNROLL):
            st = substep(st)
        return st

    init = (
        jnp.int32(m),
        jnp.int32(n),
        jnp.asarray(off_m, jnp.int32),
        jnp.int32(0),
        jnp.asarray(False),
        jnp.asarray(False),
        jnp.zeros((max_steps,), dtype=jnp.uint8),
    )
    i, j, off, pos, done, oob, moves = jax.lax.while_loop(
        cond, body, init
    )
    return moves, pos, done, oob


def walk_banded(
    dirs, m: int, n: int, V: int, geom: tuple[int, int] | None = None
):
    """Chase the banded direction words from (m, n) to the origin;
    returns the move codes in walk order (uint8). Raises on a path
    that leaves the band (corrupt words) or fails to terminate.

    On TPU the chase runs as a Mosaic scalar-core hardware loop with
    the bitmap left in HBM (``_walk_banded_pallas``, the banded
    sibling of ``ops/traceback_pallas``), resumed per move-buffer
    fill; elsewhere as the XLA ``while_loop``.

    ``geom``: optional (M, N) window geometry override — the batched
    kernel (``gotoh_banded_batch``) rides a SHARED window planned
    from the batch maxima, so the walk of a shorter pair derives
    ``off(i)`` from the batch geometry while starting at the pair's
    own (m, n).
    """
    gM, gN = geom if geom is not None else (m, n)
    # deltas[i-1] = off(i) - off(i-1) for rows 1..m (host int64 math).
    rows = np.arange(0, max(m, gM) + 1, dtype=np.int64)
    offs = band_offset(rows, gM, gN, V)
    deltas_h = np.diff(offs).astype(np.int32)

    KW, Vd = dirs.shape
    if (
        jax.default_backend() == "tpu"
        and KW >= _PKW
        and Vd >= 2 * 128
    ):
        from genomics_rs_tpu.ops.traceback_pallas import unpack_moves

        cap = min(_round_up(m + n + 1, 8192), _MAX_STEPS_CAP)
        D = max(-(-(KW * 16) // 128), 4)
        dl = np.zeros(D * 128, np.int32)
        dl[: len(deltas_h)] = deltas_h
        deltas2d = jnp.asarray(dl.reshape(D, 128))
        chunks = []
        i, j = int(m), int(n)
        off = int(offs[m])
        while True:
            out = _walk_banded_pallas(
                dirs, deltas2d, np.int32(i), np.int32(j),
                np.int32(off), V=int(V), max_steps=cap,
            )
            words, pos, i_f, j_f, done, oob = jax.device_get(out)
            if bool(oob):
                raise RuntimeError(
                    "banded traceback left the band or hit a stop "
                    "code — corrupt direction data"
                )
            chunks.append(unpack_moves(words, int(pos)))
            if bool(done):
                return np.concatenate(chunks)
            if (int(i_f), int(j_f)) == (i, j):
                raise RuntimeError(
                    f"banded traceback made no progress at ({i}, {j})"
                )
            i, j = int(i_f), int(j_f)
            off = int(offs[i])

    max_steps = _round_up(m + n + 1, 8192)
    moves, pos, done, oob = _walk_banded_jit(
        dirs,
        jnp.asarray(deltas_h),
        np.int32(offs[m]),
        m=int(m),
        n=int(n),
        V=int(V),
        max_steps=max_steps,
    )
    moves, pos, done, oob = jax.device_get((moves, pos, done, oob))
    if bool(oob):
        raise RuntimeError(
            "banded traceback left the band or hit a stop code — "
            "corrupt direction data"
        )
    if not bool(done):
        raise RuntimeError(
            f"banded traceback did not terminate within {max_steps} moves"
        )
    return np.asarray(moves[: int(pos)])
