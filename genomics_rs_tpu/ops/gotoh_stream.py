"""Streamed multi-segment Gotoh score kernel: many pairs, ONE wavefront.

The flat batched kernel (``gotoh_pallas.gotoh_scores_pallas_batch``)
pays the anti-diagonal ramp per pair: lane i is only active for
diagonals ``k in [i, i+n]``, so over a pair's ``m+n+1`` steps the
V-lane vector is ~50% idle for square pairs (the measured 2.05x
"ramp factor" in ``bench.py``). This kernel removes that waste for a
*batch* by concatenating every pair's columns into one continuous
stream: segment t occupies global columns ``[t*L1, t*L1 + Ln]`` and the
col-0 boundary of the next pair is re-injected per lane the moment that
lane finishes the previous pair — lane utilization approaches
``true_cells / (V * Kp)`` ~ 85-95% instead of ~49%.

How a pair boundary works (vs the reference's per-pair fresh loops,
``/root/reference/src/alignment/algo.rs:151-282``):

* each lane carries a column counter ``c = (k - lane) mod L1``;
  ``c == 0`` marks the lane entering column 0 of its next segment and
  overwrites I/S = -inf, D = h + i*g (the reference's boundary column,
  ``algo.rs:204-219``) — the overwrite is also the firewall that stops
  any padded-column garbage from leaking across segments;
* the lane's s1 character swaps at the same moment from the next
  pair's s1 pane (at any step at most ONE lane crosses a seam, because
  the segment stride L1 exceeds the lane count V; ``L1 % chunk == 0``
  additionally pins each grid chunk inside a single segment window so
  the pane block index is a pure function of the grid step);
* row 0 (lane 0) consumes precomputed top-boundary scalars per step,
  exactly like the single-pair kernel's boundary stream;
* the (m_t, n_t) probe of segment t fires at the known step
  ``t*L1 + m_t + n_t``: the probed value is captured into a scratch
  pane, reduced over sublanes and flushed to HBM once per chunk (the
  wrapper guarantees at most one probe per chunk, else it falls back
  to the flat batch kernel).

Local mode streams too: each lane carries a running (best value,
best column) pair for its *current* segment plus that segment's
(m, n) bounds (swapped at the seam from per-chunk SMEM scalars, like
the s1 character). When the lane crosses a seam the finished
segment's best is flushed into a per-chunk candidate accumulator,
reduced to (value, lane, column) rows at chunk end; the wrapper
re-assembles each segment's argmax from its flush window of
``V/CHUNK`` chunks with the reference's keep-last row-major tie-break
(``algo.rs:311-322``: larger i wins, then larger j). The stream runs
``P*L1 + V`` steps so the final segment's lanes all cross one more
seam and flush.

The recurrence, factored carries and flat (8, V/8) diagonal layout
are identical to ``_kernel_batch`` — see that kernel's docstring for
the algebra (including the local zero-floor placement inside every
predecessor max, reference quirk ``algo.rs:103``).

Measured band (v5e, vs the row-segmented kernel; 90-100%-full
batches): the wavefront kernels are dependency-latency bound at small
lane counts — per-step time is nearly constant (~2.2-2.5M diagonal
steps/s) regardless of V — so throughput scales with V and the stream
kernel only wins once pairs are long enough to fill a big lane
vector:

    Lm      512    1k     2k     4k     8k     30k
    seg   2.5e9  6.8e9  1.6e10 2.1e10 2.0e10   —
    strm  6.6e8  2.2e9  6.2e9  1.3e10 1.8e10 6.2e10

Routing (``parallel/batch.py``) therefore keeps the segmented kernel
through 8k and switches to the stream kernel beyond.
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
from genomics_rs_tpu.ops.gotoh_pallas import (
    PACK,
    ROWS,
    _round_up,
    _shift_down_flat,
    concrete_lengths_or_none,
    drift_rate_or_none,
)
from genomics_rs_tpu.ops.gotoh_scan import (
    DIR_DEL,
    DIR_INS,
    DIR_STOP,
    DIR_SUB,
    INT_MIN,
    NEG_INF,
)
from genomics_rs_tpu.ops.subst import (
    encode_chars,
    kimura_active,
    sentinel,
    sub_score,
)

#: diagonals per grid step (SMEM stream block width). Env-overridable
#: (GENOMICS_TPU_CHUNK) for hardware sweeps; must stay a multiple of
#: UNROLL and divide the local-flush window constraints in _plan_stream.
#: Default 256 from a v5e all-pairs sweep (512 -> 256 worth ~+1.5%:
#: a smaller chunk also shrinks the L1 segment stride's round-up).
CHUNK = int(os.environ.get("GENOMICS_TPU_CHUNK", "256"))
#: SSA unroll factor: one scratch load/store set per UNROLL diagonals
#: (the flat batch kernel is measured issue-slot bound; same trade).
#: Env-overridable (GENOMICS_TPU_UNROLL) for hardware sweeps — read at
#: import, so it is constant per process and safe under jit caching.
#: Default 64 from a v5e all-pairs sweep of the post-surgery body
#: (16/32/64 at CHUNK=256 -> 7.29/7.35/7.44 e10 cells/s).
UNROLL = int(os.environ.get("GENOMICS_TPU_UNROLL", "64"))

# The chunk loop runs chunk // UNROLL blocks and the local-flush window
# math needs CHUNK | V (V is always a multiple of 1024) — a sweep value
# violating either would silently skip diagonals / corrupt argmax
# flushes, so fail at import instead.
if UNROLL < 1 or CHUNK % UNROLL:
    raise ValueError(
        f"GENOMICS_TPU_UNROLL={UNROLL} must be >= 1 and divide "
        f"CHUNK={CHUNK} (else the last CHUNK % UNROLL diagonals of "
        "every chunk are silently skipped)"
    )
if CHUNK < 1 or 1024 % CHUNK:
    raise ValueError(
        f"GENOMICS_TPU_CHUNK={CHUNK} must divide 1024 (V is a "
        "multiple of 1024; the local flush window is V // CHUNK)"
    )


def _plan_stream(Lm: int, Ln: int, P: int):
    """(V, C, L1, K, Kp) for a P-segment stream of (Lm, Ln) pairs.

    L1 (the segment stride) must (a) cover a segment's Ln+1 columns,
    (b) exceed V + CHUNK so only one seam sweeps the lane space at a
    time, no chunk straddles two segment windows, and consecutive
    segments' local-mode flush windows (V/CHUNK chunks each) never
    overlap, and (c) be a CHUNK multiple so every chunk lies inside
    one segment window.

    K runs to ``P*L1 + V`` (not just the last true cell): lane i
    flushes its segment-t local argmax when it crosses into segment
    t+1 at step ``(t+1)*L1 + i``, so the final segment needs every
    lane to cross one more seam (~0.1% extra steps; also paid in
    global mode to keep the plan single).
    """
    V = max(_round_up(Lm + 1, 1024), 1024)
    L1 = _round_up(max(Ln + 1, V + CHUNK), CHUNK)
    K = max((P - 1) * L1 + Lm + Ln + 1, P * L1 + V)
    Kp = _round_up(K, CHUNK)
    return V, V // ROWS, L1, K, Kp


def _kernel_stream(
    scalars,  # SMEM int32[4]: sm, sx, g, h
    s1pane_ref,  # VMEM int32 (1, 8, C): s1 pane of the active segment
    *rest,  # mode-dependent streams, outputs and scratch (see below)
    C: int,
    L1: int,
    chunk: int,
    is_local: bool,
    unroll: int,
    emit_dirs: bool = False,
    kimura: bool = False,
):
    if is_local:
        (
            cinit_ref,  # VMEM int32 (8, C): per-lane counter, "step -1"
            s2i_ref,  # SMEM int32 (1, chunk): injected s2 chars
            topI_ref,  # SMEM int32 (1, chunk): row-0 I boundary per step
            topSD_ref,  # SMEM int32 (1, chunk): row-0 S/D per step
            mseg_ref,  # SMEM int32 (1, chunk): m of the step's segment
            nseg_ref,  # SMEM int32 (1, chunk): n of the step's segment
            val_out,  # VMEM (1, 8, 128) out: chunk flush best value
            lane_out,  # VMEM (1, 8, 128) out: per-sublane argmax lane
            j_out,  # VMEM (1, 8, 128) out: per-sublane argmax column
            *dtail,  # [dirs_out (chunk/16, 8, C)], scratch...
        ) = rest
        if emit_dirs:
            dirs_out = dtail[0]
            dtail = dtail[1:]
        (
            s2j_ref,
            Ip,
            Pp,
            Dp,
            Qp,
            shM,
            cnt_ref,
            s1cur,
            bv_s,  # running best value, current segment, per lane
            bj_s,  # its column
            mc_s,  # current segment's m, per lane
            nc_s,  # current segment's n, per lane
            cv_s,  # chunk flush accumulator: value
            cj_s,  # chunk flush accumulator: column
            *dtail,
        ) = dtail
        if emit_dirs:
            acc_s = dtail[0]  # packed-codes accumulator pane
    else:
        # Global mode carries NO per-lane counter: L1 > V means at
        # most one lane enters column 0 per step, and that lane's
        # index is simply k mod L1 (when < V) — streamed per step as
        # a scalar, so the seam test is ONE vector compare instead of
        # the counter's increment + wrap-select + compare.
        (
            s2i_ref,  # SMEM int32 (1, chunk): injected s2 chars
            topI_ref,  # SMEM int32 (1, chunk): row-0 I boundary per step
            topSD_ref,  # SMEM int32 (1, chunk): row-0 S/D per step
            seam_ref,  # SMEM int32 (1, chunk): col-0 lane (-1) per step
            probe_ref,  # SMEM int32 (1, chunk): probe lane (-1) per step
            fin_out_ref,  # VMEM int32 (1, 8, 128) out: probe capture
            *dtail,  # [dirs_out (chunk/16, 8, C)], scratch...
        ) = rest
        if emit_dirs:
            dirs_out = dtail[0]
            dtail = dtail[1:]
        (
            s2j_ref,
            Ip,
            Pp,
            Dp,
            Qp,
            shM,
            s1cur,
            fin_s,
            *dtail,
        ) = dtail
        if emit_dirs:
            acc_s = dtail[0]  # packed-codes accumulator pane
    g_id = pl.program_id(0)
    sm = scalars[0]
    sx = scalars[1]
    gg = scalars[2]
    hh = scalars[3]
    st = scalars[4] if kimura else None
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
        Pp[:] = full_neg
        Dp[:] = full_neg
        Qp[:] = full_neg
        shM[:] = full_neg
        s2j_ref[:] = jnp.full((ROWS, C), 0xFF, dtype=jnp.int32)
        s1cur[:] = s1pane_ref[0]
        if is_local:
            cnt_ref[:] = cinit_ref[:]
            bv_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
            bj_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
            # m/n = -1 masks every lane until its first seam crossing
            # loads the real bounds (the pre-start window).
            mc_s[:] = jnp.full((ROWS, C), -1, dtype=jnp.int32)
            nc_s[:] = jnp.full((ROWS, C), -1, dtype=jnp.int32)
        if emit_dirs:
            acc_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)

    # The per-chunk accumulators are flushed and reset every chunk:
    # the probe capture (global) so a stale capture from pair t never
    # outlives its chunk; the seam-flush candidates (local) so each
    # chunk reports only the lanes that crossed during it.
    if is_local:
        cv_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        cj_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
        # Constant across the chunk (chunks never straddle seams).
        mseg = mseg_ref[0, 0]
        nseg = nseg_ref[0, 0]
    else:
        fin_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)

    row0_mask = iv == 0
    Dcol = hh + iv * gg  # col-0 boundary D = h + i*g, per lane
    zero = jnp.int32(0)

    def step_ssa(state, t):
        (s2j0, I0, P0, D0, Q0, M0, s1c0, *loc) = state
        inj = s2i_ref[0, t]
        if is_local:
            # Per-lane segment-local column counter; c == 0 <=> this
            # lane enters column 0 of its next segment at this step
            # (local mode also needs c1 itself for the argmax column
            # and the (m, n) bounds test, so the counter stays).
            c0 = loc[0]
            c1 = c0 + 1
            c1 = jnp.where(c1 == L1, 0, c1)
            col0 = c1 == 0
        else:
            # The seam lane is a per-step scalar (k mod L1 when < V,
            # else -1): one compare replaces the counter entirely.
            col0 = iv == seam_ref[0, t]
        # Seam: swap in the next pair's s1 character for the crossing
        # lane (at most one lane per step; the presented pane is the
        # entered segment's because chunks never straddle seams).
        s1c1 = jnp.where(col0, s1pane_ref[0], s1c0)
        if is_local:
            bv0, bj0, mc0, nc0, cv0, cj0 = loc[1:7]
            # Flush the finished segment's per-lane best into the
            # chunk accumulator, reset the running best, and load the
            # entered segment's (m, n) bounds.
            cv0 = jnp.where(col0, bv0, cv0)
            cj0 = jnp.where(col0, bj0, cj0)
            bv0 = jnp.where(col0, int_min, bv0)
            mc0 = jnp.where(col0, mseg, mc0)
            nc0 = jnp.where(col0, nseg, nc0)

        s2j = _shift_down_flat(s2j0, inj, row_idx, col_idx, C)
        shQ = _shift_down_flat(Q0, neg, row_idx, col_idx, C)
        shD = _shift_down_flat(D0, neg, row_idx, col_idx, C)

        # Identical factored recurrence to _kernel_batch; local mode
        # injects the reference's raw-0 lane inside every predecessor
        # max (algo.rs:103). sub_score adds the kimura transition
        # select (2 vector ops) only in kimura compile variants.
        sub = sub_score(s1c1, s2j, sm, sx, st)
        if is_local:
            Inew = jnp.maximum(jnp.maximum(I0 + gg, P0 + hg), zero)
            Dnew = jnp.maximum(jnp.maximum(shQ + hg, shD + gg), zero)
            Snew = sub + jnp.maximum(M0, zero)
        else:
            Inew = jnp.maximum(I0 + gg, P0 + hg)
            Dnew = jnp.maximum(shQ + hg, shD + gg)
            Snew = sub + M0

        # Column-0 boundary (I/S = -inf, D = h + i*g); the row-0
        # stream then overrides lane 0 (including the (0, 0) corner
        # = 0) — on Q and D only: lane 0's I/S/P are never read (its
        # Q/D feed the shifts into lane 1 and lane 0 itself is
        # re-fixed every step; its I/P only feed its own next I,
        # which the Q fix makes unread, and the shift fill keeps the
        # drift bounded). topQ is a scalar max of two SMEM reads —
        # scalar-unit work, no vector slot (the rowblock kernel's
        # collapse, gotoh_rowblock.py:203-207).
        Inew = jnp.where(col0, neg, Inew)
        Snew = jnp.where(col0, neg, Snew)
        Dnew = jnp.where(col0, Dcol, Dnew)
        topQ = jnp.maximum(topI_ref[0, t], topSD_ref[0, t])
        Dnew = jnp.where(row0_mask, topSD_ref[0, t], Dnew)
        Qnew = jnp.maximum(Inew, Snew)
        Qnew = jnp.where(row0_mask, topQ, Qnew)

        if is_local:
            # Keep-last running argmax over the lane's true cells
            # (boundary cells clamp to 0 exactly like _kernel_batch;
            # see its cmc derivation for why that matches algo.rs).
            # Max-based spelling (round 5): ``val >= bv_old`` iff
            # ``val == max(bv_old, val)``, so bv's loop-carried chain
            # is ONE max (was compare+select) and bj's select hangs
            # off it — bit-identical keep-last semantics, shorter
            # serialized chain (docs/ROUND4.md §8's structural gap).
            cmc = jnp.maximum(jnp.maximum(Qnew, Dnew), zero)
            val = jnp.where((iv <= mc0) & (c1 <= nc0), cmc, int_min)
            bv0 = jnp.maximum(bv0, val)
            bj0 = jnp.where(val == bv0, c1, bj0)
            tail = (c1, bv0, bj0, mc0, nc0, cv0, cj0)
            if emit_dirs:
                # Local dirs: the rowblock kernel's exact chain vs the
                # zero-clamped cell max (cmc) — a 0-max cell that ties
                # none of S/I/D codes STOP, and a 0-max cell equal to
                # sub still codes SUB (reference quirk §2.4-7: the
                # termination check runs after the S/I/D arms).
                acc0 = loc[7]
                Id = jnp.where(row0_mask, topI_ref[0, t], Inew)
                Sd = jnp.where(row0_mask, topSD_ref[0, t], Snew)
                dcode = jnp.where(
                    cmc == Sd,
                    DIR_SUB,
                    jnp.where(
                        cmc == Id,
                        DIR_INS,
                        jnp.where(cmc == Dnew, DIR_DEL, DIR_STOP),
                    ),
                )
                sp = t % PACK
                acc0 = jnp.where(sp == 0, 0, acc0) | (
                    dcode << (2 * sp)
                )

                @pl.when(sp == PACK - 1)
                def _flush_dirs_l():
                    dirs_out[t // PACK] = acc0

                tail = tail + (acc0,)
        else:
            if emit_dirs:
                # Packed direction codes, the rowblock kernel's exact
                # chain and tie order SUB > INS > DEL > STOP
                # (gotoh_rowblock._kernel_rows): row-0 cells are
                # walked, so I/S get the row-0 stream fixes for the
                # code comparisons (the recurrence itself only needs
                # the Q/D fixes above). Cell (i, j) of segment s sits
                # at step k = s*L1 + i + j, and L1 % PACK == 0, so
                # the global word rows [s*L1/PACK, ...] are exactly
                # the per-segment diag16 layout the device walkers
                # consume (wrapper guard).
                (acc0,) = loc
                Mnew = jnp.maximum(Qnew, Dnew)
                Id = jnp.where(row0_mask, topI_ref[0, t], Inew)
                Sd = jnp.where(row0_mask, topSD_ref[0, t], Snew)
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
                acc0 = jnp.where(sp == 0, 0, acc0) | (
                    dcode << (2 * sp)
                )

                @pl.when(sp == PACK - 1)
                def _flush_dirs():
                    dirs_out[t // PACK] = acc0

                tail = (acc0,)
            else:
                tail = ()
            # Probe capture: pr is the probed lane or -1. Under a
            # scalar pl.when the two vector ops only run on the one
            # step per segment that probes (55 of ~1.7M steps in the
            # all-pairs headline) — the capture writes the scratch
            # pane directly instead of riding the SSA state.
            pr = probe_ref[0, t]

            @pl.when(pr >= 0)
            def _probe():
                fin_s[:] = jnp.where(
                    iv == pr,
                    jnp.maximum(Qnew, Dnew),
                    fin_s[:],
                )
        return (
            s2j,
            Inew,
            jnp.maximum(Snew, Dnew),
            Dnew,
            Qnew,
            jnp.maximum(shQ, shD),
            s1c1,
        ) + tail

    if is_local:
        tail_refs = (cnt_ref, bv_s, bj_s, mc_s, nc_s, cv_s, cj_s)
        if emit_dirs:
            tail_refs += (acc_s,)
    elif emit_dirs:
        tail_refs = (acc_s,)  # the packed-codes accumulator rides SSA
    else:
        tail_refs = ()  # fin_s is written in place under the probe when
    core_refs = (s2j_ref, Ip, Pp, Dp, Qp, shM, s1cur)

    def body(tt, _):
        state = tuple(r[:] for r in core_refs + tail_refs)
        for sub in range(unroll):
            state = step_ssa(state, unroll * tt + sub)
        for r, v in zip(core_refs + tail_refs, state):
            r[:] = v
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)
    # Lane-reduce the chunk accumulator to (8, 1) rows and broadcast
    # into the chunk's (1, 8, 128) output block (Mosaic requires the
    # block's trailing dims to be (8, 128)-aligned; (1, C) is not).
    if is_local:
        # Per-sublane-row argmax candidates (value, lane, column);
        # ties keep the largest lane then largest column — the host
        # reduce preserves that order across rows and chunks.
        cv = cv_s[:]
        rmax = jnp.max(cv, axis=1, keepdims=True)
        rlane = jnp.max(
            jnp.where(cv == rmax, iv, -1), axis=1, keepdims=True
        )
        rj = jnp.max(
            jnp.where((cv == rmax) & (iv == rlane), cj_s[:], -1),
            axis=1,
            keepdims=True,
        )
        val_out[0] = jnp.broadcast_to(rmax, (ROWS, 128))
        lane_out[0] = jnp.broadcast_to(rlane, (ROWS, 128))
        j_out[0] = jnp.broadcast_to(rj, (ROWS, 128))
    else:
        fin_out_ref[0] = jnp.broadcast_to(
            jnp.max(fin_s[:], axis=1, keepdims=True), (ROWS, 128)
        )


@functools.partial(
    jax.jit,
    static_argnames=("P", "Lm", "Ln", "is_local", "interpret", "emit_dirs"),
)
def _stream_call(
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
    emit_dirs: bool = False,
):
    V, C, L1, K, Kp = _plan_stream(Lm, Ln, P)
    neg = jnp.int32(NEG_INF)
    if emit_dirs and (L1 % PACK or CHUNK % PACK):
        # The layout equivalence (segment slice == diag16) needs L1
        # and CHUNK to be PACK multiples (always true at the default
        # CHUNK=256).
        raise ValueError(
            "emit_dirs needs PACK-aligned L1/CHUNK "
            f"(L1={L1}, CHUNK={CHUNK})"
        )

    # s1 panes, one per segment: flat index v holds s1[v-1] (0xFD at
    # v=0 and beyond Lm never matches any s2 char or sentinel; chars
    # pass the active substitution encoding, ops/subst.py).
    s1m = jnp.full((P, V), sentinel(0xFD, scores), dtype=jnp.int32)
    s1m = jax.lax.dynamic_update_slice(
        s1m, encode_chars(s1eb, scores), (jnp.int32(0), jnp.int32(1))
    )
    s1panes = s1m.reshape(P, ROWS, C)

    # Streams over global steps: the char entering row 0 at step k is
    # column k of the concatenated layout = segment t = k // L1, local
    # column c = k - t*L1 (char s2eb[t][c-1]); sentinel elsewhere.
    ks = jnp.arange(Kp, dtype=jnp.int32)
    t = ks // L1
    c = ks - t * L1
    tc = jnp.clip(t, 0, P - 1)
    charidx = jnp.clip(c - 1, 0, Ln - 1)
    inj = jnp.take(encode_chars(s2eb, scores).reshape(-1), tc * Ln + charidx)
    inj = jnp.where(
        (c >= 1) & (c <= Ln) & (t < P), inj, sentinel(0xFF, scores)
    )[None, :]

    # Row-0 boundary per step (reference algo.rs:193-219): corner
    # (0, 0) = 0 in all three matrices; I(0, c) = h + c*g, S/D = -inf.
    gg = jnp.int32(scores.g)
    hh = jnp.int32(scores.h)
    topI = jnp.where(c == 0, 0, hh + c * gg)
    topI = jnp.where(t < P, topI, neg)[None, :]
    topSD = jnp.where((c == 0) & (t < P), 0, neg)[None, :]

    ms = jnp.asarray(ms, jnp.int32)
    ns = jnp.asarray(ns, jnp.int32)
    G = Kp // CHUNK

    if is_local:
        # Per-lane counter at "step -1": c_{-1}[lane] = (-1 - lane)
        # mod L1 so the incremented counter hits 0 exactly at step
        # k = lane of segment 0 (and every L1 steps after).
        ivf = jnp.arange(V, dtype=jnp.int32)
        cinit = ((-1 - ivf) % L1).reshape(ROWS, C)
        # Per-step segment bounds: every seam crossing at step k
        # enters segment k // L1, and all steps of a chunk share one
        # segment window, so the kernel reads the chunk's first
        # element. Streamed like the other SMEM step streams (Mosaic
        # rejects sub-(1,1) blocks over a (1, G) array).
        msegs = ms[tc][None, :]
        nsegs = ns[tc][None, :]
        extra_streams = (msegs, nsegs)
    else:
        # Col-0 seam lane per step: lane v crosses when (k - v) mod
        # L1 == 0, i.e. v = k mod L1 (at most one lane since L1 > V;
        # -1 on the L1 - V stride steps with no crossing). Replaces
        # the local mode's per-lane counter — matches its unbounded
        # wrap (no t < P guard): post-final-segment seams re-clamp
        # lanes exactly like the counter did.
        seam = jnp.where(c < V, c, -1)[None, :]
        # Probe steps: segment t's (m_t, n_t) cell lies on lane m_t
        # at step t*L1 + m_t + n_t.
        probe_ks = ms + ns + jnp.arange(P, dtype=jnp.int32) * L1
        probe = (
            jnp.full((Kp,), -1, jnp.int32).at[probe_ks].set(ms)[None, :]
        )
        extra_streams = (seam, probe)

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

    smem_chunk = pl.BlockSpec(
        (1, CHUNK), lambda g, s: (0, g), memory_space=pltpu.SMEM
    )
    out_block = pl.BlockSpec(
        (1, ROWS, 128), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM
    )
    out_arr = jax.ShapeDtypeStruct((G, ROWS, 128), jnp.int32)
    n_out = 3 if is_local else 1
    out_specs: tuple = tuple([out_block] * n_out)
    out_shapes: tuple = tuple([out_arr] * n_out)
    if emit_dirs:
        out_specs += (
            pl.BlockSpec(
                (CHUNK // PACK, ROWS, C),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out_shapes += (
            jax.ShapeDtypeStruct((Kp // PACK, ROWS, C), jnp.int32),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, ROWS, C),
                lambda g, s: (jnp.minimum(g * CHUNK // L1, P - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + (
            [
                pl.BlockSpec(
                    (ROWS, C),
                    lambda g, s: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            if is_local
            else []
        )
        + [smem_chunk] * 5,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((ROWS, C), jnp.int32)]
        * ((14 if is_local else 8) + (1 if emit_dirs else 0)),
    )
    # Interpret mode (CPU tests) evaluates the traced body per
    # primitive: a 64-step SSA body is pure tracing/eval overhead
    # there, so interpret runs keep a tiny unroll (semantics are
    # unroll-invariant — pinned by the parity tests either way).
    unroll = min(UNROLL, 2) if interpret else UNROLL
    kernel = functools.partial(
        _kernel_stream,
        C=C,
        L1=L1,
        chunk=CHUNK,
        is_local=is_local,
        unroll=unroll,
        emit_dirs=emit_dirs,
        kimura=kim,
    )
    operands = (
        (s1panes, cinit, inj, topI, topSD)
        if is_local
        else (s1panes, inj, topI, topSD)
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(scalars, *operands, *extra_streams)

    if not is_local:
        score = jnp.max(outs[0][probe_ks // CHUNK], axis=(-2, -1))
        if emit_dirs:
            return score, outs[1].reshape(Kp // PACK, V)
        return score

    # Re-assemble each segment's argmax from its flush window: lane i
    # flushes segment t at step (t+1)*L1 + i, i.e. chunks
    # [(t+1)*L1/CHUNK, ... + V/CHUNK - 1] (windows never overlap
    # because L1 >= V + CHUNK). Each chunk contributed 8 per-sublane
    # candidates; later chunks/larger lanes flush later, so the
    # keep-last reference tie-break is "largest lane, then largest
    # column among that lane's ties" (the kernel already kept the
    # last column per lane).
    vals, lanes, cols = outs[:3]
    W = V // CHUNK
    base = (jnp.arange(P, dtype=jnp.int32) + 1) * (L1 // CHUNK)
    win = base[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    cv = vals[win][..., 0].reshape(P, W * ROWS)
    cl = lanes[win][..., 0].reshape(P, W * ROWS)
    cj = cols[win][..., 0].reshape(P, W * ROWS)
    vmax = jnp.max(cv, axis=1)
    tied = cv == vmax[:, None]
    lbest = jnp.max(jnp.where(tied, cl, -1), axis=1)
    jbest = jnp.max(
        jnp.where(tied & (cl == lbest[:, None]), cj, -1), axis=1
    )
    if emit_dirs:
        return (vmax, lbest, jbest), outs[3].reshape(Kp // PACK, V)
    return vmax, lbest, jbest


def gotoh_scores_stream(
    s1eb,
    s2eb,
    ms,
    ns,
    scores: Scores,
    is_local: bool = False,
    interpret: bool = False,
):
    """Score a batch of pairs through one continuous wavefront stream.

    Same contract as ``gotoh_scores_pallas_batch``: returns
    ``(score, start_i, start_j)`` of shape (B,); local mode returns
    the reference's exact keep-last argmax start cell
    (``algo.rs:311-322``). Host-level entry — ``ms``/``ns`` must be
    concrete (the probe-placement checks run on the host). Falls back
    to the flat batch kernel when the stream formulation doesn't
    apply: a single pair (no ramp to amortize), global-mode
    probe-chunk collisions (pairs much shorter than their padding),
    or traced lengths.
    """
    from genomics_rs_tpu.ops.gotoh_pallas import gotoh_scores_pallas_batch

    def fallback():
        return gotoh_scores_pallas_batch(
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
    _, _, L1, _, _ = _plan_stream(Lm, Ln, B)
    # Garbage lanes are re-clamped by a boundary write at least every
    # L1 steps (plus the <= V pre-start window); same int32 headroom
    # argument as the flat kernel but with a much smaller window.
    if 2 * L1 * drift_rate >= 1 << 30:
        return fallback()
    if np.any(ms_np < 1) or np.any(ns_np < 1):
        return fallback()
    if not is_local:
        probe_chunks = (
            ms_np + ns_np + np.arange(B, dtype=np.int64) * L1
        ) // CHUNK
        if len(np.unique(probe_chunks)) < B:
            return fallback()
    out = _stream_call(
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


@functools.partial(jax.jit, static_argnames=("KW",))
def _slice_dirs(dirs, word0, KW: int):
    """One compiled dynamic-slice for every segment (traced start,
    static size) — per-constant host slicing would compile a fresh
    executable per segment through the remote tunnel."""
    return jax.lax.dynamic_slice(
        dirs, (word0, jnp.int32(0)), (KW, dirs.shape[1])
    )


class StreamDirsResult:
    """Scores + packed direction words of a streamed multi-pair fill.

    ``dirs`` is the GLOBAL word array (Kp/16, V): the code of cell
    (i, j) of segment t sits at word ((t*L1 + i + j) // 16, i), bit
    2*((i+j) % 16) — because ``L1 % 16 == 0``, rows
    ``[t*L1/16, t*L1/16 + KW)`` are exactly the per-pair diag16
    layout (``gotoh_pallas.TileFillResult.dirs``) that
    ``traceback_device.device_walk`` chases. Adjacent segments'
    windows overlap by construction (a pair's m+n+1 diagonals exceed
    the stride L1); each (step, lane) cell belongs to exactly one
    segment, so the overlap rows carry the neighbour's lanes — cells
    a walk of THIS segment never visits.
    """

    def __init__(
        self, score, dirs, ms, ns, L1: int, KW: int,
        start_i=None, start_j=None,
    ):
        self.score = score
        self.dirs = dirs
        self.ms = np.asarray(ms)
        self.ns = np.asarray(ns)
        self.L1 = L1
        self.KW = KW
        #: per-segment retrace start cells (segment-local coords):
        #: (m, n) in global mode, the reference keep-last argmax in
        #: local mode.
        self.start_i = self.ms if start_i is None else start_i
        self.start_j = self.ns if start_j is None else start_j

    def segment_dirs(self, t: int):
        """Segment ``t``'s diag16 bitmap (device-side slice view)."""
        return _slice_dirs(
            self.dirs, jnp.int32(t * (self.L1 // PACK)), self.KW
        )


def gotoh_stream_fill_dirs(
    s1eb,
    s2eb,
    ms,
    ns,
    scores: Scores,
    is_local: bool = False,
    interpret: bool = False,
) -> StreamDirsResult | None:
    """Streamed fill of a pair batch that also emits the packed
    direction bitmaps — the alignment-returning counterpart of
    :func:`gotoh_scores_stream` (round 4: the star/batched-align fills
    used to pay the per-pair diagonal ramp in the monolithic kernel).
    Local mode additionally returns each segment's reference keep-last
    argmax start cell (``start_i``/``start_j``).

    Returns ``None`` when the stream formulation doesn't apply (single
    pair, traced lengths, global probe-chunk collision, drift
    headroom) — callers fall back to per-pair monolithic fills. Walk
    each segment's bitmap with ``device_walk(res.segment_dirs(t),
    start_i[t], start_j[t], 0, max_steps)``.
    """
    B, Lm = s1eb.shape
    _, Ln = s2eb.shape
    if B < 2:
        return None
    lengths = concrete_lengths_or_none(ms, ns)
    drift_rate = drift_rate_or_none(scores)
    if lengths is None or drift_rate is None:
        return None
    ms_np, ns_np = lengths
    _, _, L1, _, _ = _plan_stream(Lm, Ln, B)
    if L1 % PACK or CHUNK % PACK:
        return None
    if 2 * L1 * drift_rate >= 1 << 30:
        return None
    if np.any(ms_np < 1) or np.any(ns_np < 1):
        return None
    if not is_local:
        probe_chunks = (
            ms_np + ns_np + np.arange(B, dtype=np.int64) * L1
        ) // CHUNK
        if len(np.unique(probe_chunks)) < B:
            return None
    out = _stream_call(
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
        emit_dirs=True,
    )
    KW = (Lm + Ln) // PACK + 1
    if is_local:
        (vmax, lbest, jbest), dirs = out
        return StreamDirsResult(
            vmax, dirs, ms_np, ns_np, L1, KW,
            start_i=np.asarray(lbest),
            start_j=np.asarray(jbest),
        )
    score, dirs = out
    return StreamDirsResult(score, dirs, ms_np, ns_np, L1, KW)
