"""Row-stacked streamed batch kernel: 8 independent wavefronts.

The streamed multi-segment kernel (``gotoh_stream``) removes the
per-pair diagonal ramp but keeps ONE wavefront: its lane vector covers
a single pair's rows, so short/mid pairs leave the VPU latency-bound —
per-diagonal step time is nearly constant (~0.35-1 µs) regardless of
lane count (measured, see ``gotoh_stream``'s band table), and
throughput collapses with pair length.

This kernel stacks EIGHT independent sub-streams, one per sublane row
of the (8, C) register pane: sub-stream r processes segments
``r, r+8, r+16, ...`` of the batch, all rows in lockstep (same
segment-local step), so a batch of B pairs runs ``ceil(B/8)`` cycles
of one stride instead of B — the effective lane count is ``8*C`` and
the latency floor is amortized 8-fold. Lane (r, c) holds DP row c of
sub-stream r's current segment:

* the anti-diagonal shift never crosses sublane rows — one lane roll
  plus a column-0 select with a per-row (8, 1) injection vector;
* per-row step streams (s2 char, row-0 I and S/D boundary, probe
  lane; local: segment m/n) arrive as (8, CHUNK) VMEM blocks that are
  copied to scratch panes once per chunk and ROLLED once per UNROLL
  block (by UNROLL columns), so unrolled step ``sub`` consumes column
  ``sub`` with a static slice (no dynamic lane indexing, which Mosaic
  rejects; rolling per block instead of per step cuts the pane-roll
  cost by the unroll factor);
* the column counter needs no carried pane: all rows share the
  segment-local phase ``kmod = k % L1``, a per-step scalar, and a
  lane is at DP column 0 exactly when ``col_idx == kmod``;
* segment seams re-inject the reference column-0 boundary
  (I/S = -inf, D = h + i*g with i = col_idx) exactly like
  ``gotoh_stream``; local mode flushes per-lane keep-last argmax
  registers at the seam and reduces per-row chunk candidates (same
  machinery, but the per-row layout makes every reduction a plain
  axis-1 reduce).

Semantics (global probe capture, local keep-last argmax with the
reference tie-break ``algo.rs:311-322``, zero-floor placement
``algo.rs:103``) are identical to the other batch kernels — pinned by
interpret tests vs the scan oracle and the hardware smoke gate.

Measured vs the row-segmented kernel (v5e chip, batches sized ~2e9
true cells, lengths drawn from [0.9L, L])::

    L      global            local
    512    2.15e9  (0.94x)   1.77e9  (0.67x)
    1024   7.81e9  (1.04x)   5.99e9  (0.86x)
    2048   2.30e10 (1.32x)   1.61e10 (0.97x)
    4096   2.60e10 (1.16x)   2.16e10 (1.03x)
    8192   2.69e10 (1.19x)   1.98e10 (0.93x)

The win is the GLOBAL upper mid band — one probe capture per segment
is cheap, while local mode pays ~6 extra pane ops per step for the
candidate mask + keep-last registers, eating the stacking gain. Auto
routing (``parallel.batch.STREAM8_MIN_LEN``) sends global-mode
1 kb < L <= 8 kb batches here and keeps everything else segmented.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.subst import (
    encode_chars,
    kimura_active,
    sentinel,
    sub_score,
)
from genomics_rs_tpu.ops.gotoh_pallas import (
    ROWS,
    _round_up,
    concrete_lengths_or_none,
    drift_rate_or_none,
)
from genomics_rs_tpu.ops.gotoh_scan import INT_MIN, NEG_INF

#: diagonals per grid step.
CHUNK = 512
#: SSA unroll factor (one scratch load/store set per UNROLL diagonals).
#: Env-overridable (GENOMICS_TPU_UNROLL) for hardware sweeps.
UNROLL = int(os.environ.get("GENOMICS_TPU_UNROLL", "2"))

# The chunk loop runs chunk // UNROLL blocks — a non-divisor sweep
# value would silently skip CHUNK % UNROLL diagonals per chunk.
if UNROLL < 1 or CHUNK % UNROLL:
    raise ValueError(
        f"GENOMICS_TPU_UNROLL={UNROLL} must be >= 1 and divide "
        f"CHUNK={CHUNK}"
    )


def _plan_stream8(Lm: int, Ln: int, P: int):
    """(C, L1, Q, K, Kp): per-row lane count, segment stride, cycle
    count, true/padded step counts for a P-segment row-stacked stream.

    L1 mirrors ``gotoh_stream``'s constraints per sub-stream: cover
    Ln+1 columns, exceed C + CHUNK (seam separation + non-overlapping
    local flush windows), CHUNK-aligned. K runs to ``Q*L1 + C`` so the
    final cycle's lanes all cross one more seam and flush.
    """
    C = max(_round_up(Lm + 1, 128), 128)
    L1 = _round_up(max(Ln + 1, C + CHUNK), CHUNK)
    Q = -(-P // ROWS)
    K = max((Q - 1) * L1 + Lm + Ln + 1, Q * L1 + C)
    Kp = _round_up(K, CHUNK)
    return C, L1, Q, K, Kp


def _kernel_stream8(
    scalars,  # SMEM int32[4(+1)]: sm, sx, g, h [, st]
    s1pane_ref,  # VMEM int32 (1, 8, C): s1 panes of the cycle's segments
    lofs_ref,  # SMEM int32 (1, G): kmod at each chunk's first step
    s2i_in,  # VMEM int32 (1, 8, chunk): per-row injected s2 chars
    topI_in,  # VMEM int32 (1, 8, chunk): per-row row-0 I boundary
    topSD_in,  # VMEM int32 (1, 8, chunk): per-row row-0 S/D boundary
    aux_in,  # VMEM int32 (1, 8, chunk): probe lane (global) / m (local)
    *rest,
    C: int,
    L1: int,
    chunk: int,
    is_local: bool,
    kimura: bool = False,
):
    if is_local:
        (
            nseg_in,  # VMEM int32 (1, 8, chunk): per-row segment n
            val_out,  # (1, 8, 128): chunk flush best value per row
            i_out,  # (1, 8, 128): its DP row (pane column index)
            j_out,  # (1, 8, 128): its DP column
            s2j_ref,
            Ip,
            Pp,
            Dp,
            Qp,
            shM,
            s1cur,
            bv_s,
            bj_s,
            mc_s,
            nc_s,
            cv_s,
            cj_s,
            s2i_s,
            topI_s,
            topSD_s,
            aux_s,
            nseg_s,
        ) = rest
        stream_pairs = (
            (s2i_s, s2i_in),
            (topI_s, topI_in),
            (topSD_s, topSD_in),
            (aux_s, aux_in),
            (nseg_s, nseg_in),
        )
    else:
        (
            fin_out,  # (1, 8, 128): chunk probe capture per row
            s2j_ref,
            Ip,
            Pp,
            Dp,
            Qp,
            shM,
            s1cur,
            fin_s,
            s2i_s,
            topI_s,
            topSD_s,
            aux_s,
        ) = rest
        stream_pairs = (
            (s2i_s, s2i_in),
            (topI_s, topI_in),
            (topSD_s, topSD_in),
            (aux_s, aux_in),
        )

    g_id = pl.program_id(0)
    sm = scalars[0]
    sx = scalars[1]
    gg = scalars[2]
    hh = scalars[3]
    st = scalars[4] if kimura else None
    hg = hh + gg

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1)
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)
    zero = jnp.int32(0)

    @pl.when(g_id == 0)
    def _init():
        full_neg = jnp.full((ROWS, C), neg, dtype=jnp.int32)
        Ip[:] = full_neg
        Pp[:] = full_neg
        Dp[:] = full_neg
        Qp[:] = full_neg
        shM[:] = full_neg
        s2j_ref[:] = jnp.full((ROWS, C), 0xFF, dtype=jnp.int32)
        s1cur[:] = s1pane_ref[0]
        if is_local:
            bv_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
            bj_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
            mc_s[:] = jnp.full((ROWS, C), -1, dtype=jnp.int32)
            nc_s[:] = jnp.full((ROWS, C), -1, dtype=jnp.int32)

    # Per-chunk stream panes (rolled one column per step; column 0 is
    # the step's per-row value) and flush accumulators.
    for s, ref in stream_pairs:
        s[:] = ref[0]
    if is_local:
        cv_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        cj_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
    else:
        fin_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)

    kmod0 = lofs_ref[0, g_id]
    col0_static = col_idx == 0
    Dcol = hh + col_idx * gg  # col-0 boundary D = h + i*g (i = col_idx)

    def step_ssa(state, t, streams, sub):
        if is_local:
            (
                s2j0, I0, P0, D0, Q0, M0, s1c0,
                bv0, bj0, mc0, nc0, cv0, cj0,
            ) = state
            p_s2i, p_topI, p_topSD, p_aux, p_nseg = streams
        else:
            (s2j0, I0, P0, D0, Q0, M0, s1c0, bfin) = state
            p_s2i, p_topI, p_topSD, p_aux = streams
        kmod = kmod0 + t
        col0 = col_idx == kmod  # DP column 0 of the entered segment
        s1c1 = jnp.where(col0, s1pane_ref[0], s1c0)

        # Stream consumption: the panes are rolled once per UNROLL
        # block (not per step), so the unrolled step ``sub`` reads the
        # STATIC column ``sub`` — Mosaic allows static lane slices, and
        # this cuts the per-step pane rolls by the unroll factor.
        injv = p_s2i[:, sub : sub + 1]
        topIv = p_topI[:, sub : sub + 1]
        topSDv = p_topSD[:, sub : sub + 1]
        auxv = p_aux[:, sub : sub + 1]

        if is_local:
            nsegv = p_nseg[:, sub : sub + 1]
            cv0 = jnp.where(col0, bv0, cv0)
            cj0 = jnp.where(col0, bj0, cj0)
            bv0 = jnp.where(col0, int_min, bv0)
            mc0 = jnp.where(col0, auxv, mc0)
            nc0 = jnp.where(col0, nsegv, nc0)

        # Row-confined anti-diagonal shifts (no cross-row carry).
        s2j = jnp.where(col0_static, injv, pltpu.roll(s2j0, 1, 1))
        shQ = jnp.where(col0_static, neg, pltpu.roll(Q0, 1, 1))
        shD = jnp.where(col0_static, neg, pltpu.roll(D0, 1, 1))

        # `subst`, not `sub`: the unroll index `sub` is still live for
        # static pane-column slices — shadowing it would turn a later
        # slice into a traced-lane index Mosaic rejects.
        subst = sub_score(s1c1, s2j, sm, sx, st)
        if is_local:
            Inew = jnp.maximum(jnp.maximum(I0 + gg, P0 + hg), zero)
            Dnew = jnp.maximum(jnp.maximum(shQ + hg, shD + gg), zero)
            Snew = subst + jnp.maximum(M0, zero)
        else:
            Inew = jnp.maximum(I0 + gg, P0 + hg)
            Dnew = jnp.maximum(shQ + hg, shD + gg)
            Snew = subst + M0

        # Segment col-0 boundary, then DP row 0 from the top streams.
        Inew = jnp.where(col0, neg, Inew)
        Snew = jnp.where(col0, neg, Snew)
        Dnew = jnp.where(col0, Dcol, Dnew)
        Inew = jnp.where(col0_static, topIv, Inew)
        Snew = jnp.where(col0_static, topSDv, Snew)
        Dnew = jnp.where(col0_static, topSDv, Dnew)

        Qnew = jnp.maximum(Inew, Snew)
        if is_local:
            cmc = jnp.maximum(jnp.maximum(Qnew, Dnew), zero)
            # DP column: lanes with col_idx > kmod are still working the
            # PREVIOUS window's segment (windows overlap by design —
            # cells with i + j >= L1 are computed after the next
            # window's col-0 sweep started, with kmod wrapped), so
            # un-wrap their column. n < L1 bounds the overlap to one
            # window; pre-entry lanes (first window / dummy rows) have
            # nc0 == -1 and stay masked.
            jj = kmod - col_idx
            jj = jnp.where(jj < 0, jj + L1, jj)
            val = jnp.where(
                (jj >= 0) & (jj <= nc0) & (col_idx <= mc0),
                cmc,
                int_min,
            )
            upd = val >= bv0
            bv0 = jnp.where(upd, val, bv0)
            bj0 = jnp.where(upd, jj, bj0)
            tail = (bv0, bj0, mc0, nc0, cv0, cj0)
        else:
            bfin = jnp.where(
                col_idx == auxv, jnp.maximum(Qnew, Dnew), bfin
            )
            tail = (bfin,)

        return (
            s2j,
            Inew,
            jnp.maximum(Snew, Dnew),
            Dnew,
            Qnew,
            jnp.maximum(shQ, shD),
            s1c1,
        ) + tail

    core_refs = (s2j_ref, Ip, Pp, Dp, Qp, shM, s1cur)
    if is_local:
        tail_refs = (bv_s, bj_s, mc_s, nc_s, cv_s, cj_s)
        roll_refs = (s2i_s, topI_s, topSD_s, aux_s, nseg_s)
    else:
        tail_refs = (fin_s,)
        roll_refs = (s2i_s, topI_s, topSD_s, aux_s)
    state_refs = core_refs + tail_refs

    def body(tt, _):
        state = tuple(r[:] for r in state_refs)
        streams = tuple(r[:] for r in roll_refs)
        for sub in range(UNROLL):
            state = step_ssa(state, UNROLL * tt + sub, streams, sub)
        for r, v in zip(state_refs, state):
            r[:] = v
        # One roll per UNROLL block: advance every stream pane so the
        # next block's values again sit at columns [0, UNROLL).
        for r, p in zip(roll_refs, streams):
            r[:] = pltpu.roll(p, chunk - UNROLL, 1)
        return 0

    jax.lax.fori_loop(0, chunk // UNROLL, body, 0)

    if is_local:
        cv = cv_s[:]
        rmax = jnp.max(cv, axis=1, keepdims=True)
        ri = jnp.max(
            jnp.where(cv == rmax, col_idx, -1), axis=1, keepdims=True
        )
        rj = jnp.max(
            jnp.where((cv == rmax) & (col_idx == ri), cj_s[:], -1),
            axis=1,
            keepdims=True,
        )
        val_out[0] = jnp.broadcast_to(rmax, (ROWS, 128))
        i_out[0] = jnp.broadcast_to(ri, (ROWS, 128))
        j_out[0] = jnp.broadcast_to(rj, (ROWS, 128))
    else:
        fin_out[0] = jnp.broadcast_to(
            jnp.max(fin_s[:], axis=1, keepdims=True), (ROWS, 128)
        )


@functools.partial(
    jax.jit, static_argnames=("P", "Lm", "Ln", "is_local", "interpret")
)
def _stream8_call(
    s1eb: jax.Array,
    s2eb: jax.Array,
    ms: jax.Array,
    ns: jax.Array,
    scores: Scores,
    P: int,
    Lm: int,
    Ln: int,
    is_local: bool,
    interpret: bool,
):
    C, L1, Q, K, Kp = _plan_stream8(Lm, Ln, P)
    P8 = Q * ROWS
    neg = jnp.int32(NEG_INF)
    G = Kp // CHUNK

    ms = jnp.asarray(ms, jnp.int32)
    ns = jnp.asarray(ns, jnp.int32)
    # Pad the batch to a whole number of cycles with 1x1 dummies.
    if P8 > P:
        pad = P8 - P
        s1eb = jnp.concatenate(
            [s1eb, jnp.full((pad, Lm), 0xFD, s1eb.dtype)]
        )
        s2eb = jnp.concatenate(
            [s2eb, jnp.full((pad, Ln), 0xFF, s2eb.dtype)]
        )
        ms = jnp.concatenate([ms, jnp.ones(pad, jnp.int32)])
        ns = jnp.concatenate([ns, jnp.ones(pad, jnp.int32)])

    # s1 panes, one (8, C) per cycle: row r = segment q*8+r, flat
    # column c holds s1[c-1].
    s1m = jnp.full((P8, C), sentinel(0xFD, scores), dtype=jnp.int32)
    s1m = jax.lax.dynamic_update_slice(
        s1m, encode_chars(s1eb, scores), (jnp.int32(0), jnp.int32(1))
    )
    s1panes = s1m.reshape(Q, ROWS, C)

    # Per-row step streams over (8, Kp): at step k, cycle q = k//L1,
    # local column c = k - q*L1; row r serves segment q*8 + r.
    ks = jnp.arange(Kp, dtype=jnp.int32)
    q = ks // L1
    c = ks - q * L1
    seg = q[None, :] * ROWS + jnp.arange(ROWS, dtype=jnp.int32)[:, None]
    live = seg < P8
    segc = jnp.clip(seg, 0, P8 - 1)

    charidx = jnp.clip(c - 1, 0, Ln - 1)[None, :]
    inj = jnp.take(
        encode_chars(s2eb, scores).reshape(-1), segc * Ln + charidx
    )
    inj = jnp.where(
        (c >= 1)[None, :] & (c <= Ln)[None, :] & live,
        inj,
        sentinel(0xFF, scores),
    )

    gg = jnp.int32(scores.g)
    hh = jnp.int32(scores.h)
    topI = jnp.where(c == 0, 0, hh + c * gg)[None, :]
    topI = jnp.where(live, topI, neg)
    topSD = jnp.where((c == 0)[None, :] & live, 0, neg)

    if is_local:
        aux = jnp.where(live, ms[segc], -1)  # segment m per row/step
        nseg = jnp.where(live, ns[segc], -1)
    else:
        # Probe: segment q*8+r probes lane (r, m) at step
        # q*L1 + m + n. Only REAL pairs get probes — a padding dummy's
        # probe could share a (row, chunk) with a real pair's (the
        # wrapper's collision check can't see dummies) and its score
        # would win the chunk-end max reduce.
        probe_ks = ms + ns + (jnp.arange(P8) // ROWS) * L1
        rows = jnp.arange(P8, dtype=jnp.int32) % ROWS
        aux = (
            jnp.full((ROWS, Kp), -1, jnp.int32)
            .at[rows[:P], probe_ks[:P]]
            .set(ms[:P])
        )
        extra = ()

    def chunked(x):
        # (8, Kp) -> (G, 8, CHUNK) blocks.
        return x.reshape(ROWS, G, CHUNK).swapaxes(0, 1)

    s2i_b = chunked(inj)
    topI_b = chunked(topI)
    topSD_b = chunked(topSD)
    aux_b = chunked(aux)
    if is_local:
        extra = (chunked(nseg),)

    # kmod at each chunk's first step (chunks never straddle L1
    # windows, so kmod increments without wrap inside a chunk).
    lofs = (
        (jnp.arange(G, dtype=jnp.int32) * CHUNK) % L1
    )[None, :]

    kim = kimura_active(scores)
    scalars = jnp.stack(
        [
            jnp.int32(scores.s_match),
            jnp.int32(scores.s_mismatch),
            gg,
            hh,
        ]
        + ([jnp.int32(scores.s_transition)] if kim else [])
    )

    vmem_chunk = pl.BlockSpec(
        (1, ROWS, CHUNK), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM
    )
    out_block = pl.BlockSpec(
        (1, ROWS, 128), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM
    )
    out_arr = jax.ShapeDtypeStruct((G, ROWS, 128), jnp.int32)
    n_out = 3 if is_local else 1
    # scratch: core 7 + (local: bv,bj,mc,nc,cv,cj | global: fin) +
    # stream panes (5 local / 4 global), all (8, C) except streams
    # (8, CHUNK).
    scratch = (
        [pltpu.VMEM((ROWS, C), jnp.int32)]
        * (13 if is_local else 8)
        + [pltpu.VMEM((ROWS, CHUNK), jnp.int32)]
        * (5 if is_local else 4)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, ROWS, C),
                lambda g, s: (jnp.minimum(g * CHUNK // L1, Q - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, G), lambda g, s: (0, 0), memory_space=pltpu.SMEM
            ),
            vmem_chunk,
            vmem_chunk,
            vmem_chunk,
            vmem_chunk,
        ]
        + ([vmem_chunk] if is_local else []),
        out_specs=tuple([out_block] * n_out),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel_stream8,
        C=C,
        L1=L1,
        chunk=CHUNK,
        is_local=is_local,
        kimura=kim,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple([out_arr] * n_out),
        interpret=interpret,
    )(scalars, s1panes, lofs, s2i_b, topI_b, topSD_b, aux_b, *extra)

    rows = jnp.arange(P8, dtype=jnp.int32) % ROWS
    if not is_local:
        probe_ks = ms + ns + (jnp.arange(P8) // ROWS) * L1
        sc = outs[0][probe_ks // CHUNK, rows, 0]
        return sc[:P]

    # Local: segment q*8+r flushes at steps (q+1)*L1 + c (lane (r, c)
    # crossing the seam), i.e. chunks [(q+1)*L1/CHUNK, + C/CHUNK - 1],
    # all on row r. Windows of consecutive cycles never overlap
    # (L1 >= C + CHUNK). Reduce with the keep-last tie-break: larger
    # chunk = larger DP row; the kernel kept larger row then larger
    # column inside each chunk.
    vals, iouts, jouts = outs
    W = -(-C // CHUNK)
    qs = jnp.arange(P8, dtype=jnp.int32) // ROWS
    base = (qs + 1) * (L1 // CHUNK)
    win = base[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    cv = vals[win, rows[:, None], 0]
    ci = iouts[win, rows[:, None], 0]
    cj = jouts[win, rows[:, None], 0]
    vmax = jnp.max(cv, axis=1)
    tied = cv == vmax[:, None]
    ibest = jnp.max(jnp.where(tied, ci, -1), axis=1)
    jbest = jnp.max(
        jnp.where(tied & (ci == ibest[:, None]), cj, -1), axis=1
    )
    return vmax[:P], ibest[:P], jbest[:P]


def gotoh_scores_stream8(
    s1eb,
    s2eb,
    ms,
    ns,
    scores: Scores,
    is_local: bool = False,
    interpret: bool = False,
):
    """Score a batch through eight row-stacked wavefront streams.

    Same contract as ``gotoh_scores_pallas_batch``: returns
    ``(score, start_i, start_j)`` of shape (B,). Host-level entry —
    ``ms``/``ns`` must be concrete. Falls back to the row-segmented
    kernel when the stacked-stream layout doesn't apply (tiny
    batches, global-mode per-row probe-chunk collisions, scoring
    magnitudes beyond the int32 drift headroom, traced lengths).
    """
    from genomics_rs_tpu.ops.gotoh_segmented import gotoh_scores_segmented

    def fallback():
        return gotoh_scores_segmented(
            s1eb, s2eb, ms, ns, scores, is_local, interpret=interpret
        )

    B, Lm = s1eb.shape
    _, Ln = s2eb.shape
    if B < 2:
        return fallback()
    lengths = concrete_lengths_or_none(ms, ns)
    drift_rate = drift_rate_or_none(scores)
    if lengths is None or drift_rate is None:
        return fallback()
    ms_np, ns_np = lengths
    _, L1, _, _, _ = _plan_stream8(Lm, Ln, B)
    if 2 * L1 * drift_rate >= 1 << 30:
        return fallback()
    if np.any(ms_np < 1) or np.any(ns_np < 1):
        return fallback()
    if not is_local:
        probe_chunks = (
            ms_np + ns_np + (np.arange(B) // ROWS) * L1
        ) // CHUNK
        rows_np = np.arange(B) % ROWS
        if len({(r, int(pc)) for r, pc in zip(rows_np, probe_chunks)}) < B:
            return fallback()
    out = _stream8_call(
        s1eb,
        s2eb,
        ms,
        ns,
        scores,
        P=B,
        Lm=Lm,
        Ln=Ln,
        is_local=is_local,
        interpret=interpret,
    )
    if is_local:
        return out
    return out, jnp.asarray(ms, jnp.int32), jnp.asarray(ns, jnp.int32)
