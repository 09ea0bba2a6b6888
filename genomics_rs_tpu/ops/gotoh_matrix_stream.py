"""Continuous-stream full-matrix (protein) Gotoh kernel: 2-D packing.

The round-4 protein engine (``gotoh_matrix._kernel_matrix_seg``) pays
~5x padding at protein shapes: lanes round the ~400-residue pane up to
128 multiples, steps round to 256-chunks, and every pair pays its own
anti-diagonal ramp. The DNA stream kernel (``gotoh_stream``) removed
the ramp by chaining pairs along the STEP axis — but its geometry puts
ONE pair across the whole lane vector, so short proteins would idle
>90% of a big vector. This kernel packs pairs along BOTH axes:

* **lane groups**: ``G = V // S`` independent pair chains stacked in
  the lane vector with stride ``S = roundup(Lm+1, 128)`` — lane
  ``v = g*S + i`` is DP row ``i`` of group ``g``'s current pair. The
  shift firewall between adjacent groups is the row-0 boundary
  override itself (a group's row-0 lane has every read value replaced
  by the streamed top-boundary scalars, exactly like the stream
  kernel's lane 0 — see ``gotoh_stream._kernel_stream``);
* **step chaining**: each group processes ``T = ceil(B/G)`` pairs
  back-to-back at stride ``L1 = roundup(max(Ln+1, S+CHUNK), CHUNK)``
  with per-lane column-0 re-injection at the seam (the stream
  kernel's trick). All groups share one column phase, so the seam
  lane, the row-0 boundary and the column base remain per-step
  *scalars*;
* **substitution stream**: the per-cell score ``M[a, b]`` arrives as
  a precomputed int8 VMEM pane per step (the segmented matrix
  kernel's device-built diagonal-major stream, relaid into this
  kernel's (step, lane) geometry by masked window overlay) — the DP
  body does no table work at all.

Scores are extracted without the stream kernel's scalar probe (G
probes can collide on one step): every lane carries its current
segment's ``(m, n)`` (loaded at the seam from a per-chain-position
VMEM pane) and captures its ``(m, n)`` cell into a register, flushed
to a per-chunk accumulator pane at the next seam — the local-mode
argmax flush generalized to global mode. Local mode keeps the
reference's exact keep-last row-major argmax (``algo.rs:311-322``):
per-lane keep-last ``(best, column)``, host-side reduce over the
segment's lanes with larger-row-then-larger-column tie-break.

``emit_dirs`` packs the rowblock kernel's exact SUB>INS>DEL>STOP
codes 16-per-word along the global step axis: cell (i, j) of the pair
at chain position t, group g sits at word ``(t*L1 + i + j) // 16``,
lane ``g*S + i`` — rows ``[t*L1/16, ...)`` with a lane offset are a
diag16 bitmap, chased by ``traceback_pallas.walk_many(loffs=...)``
with zero re-layout. This is what gives protein (matrix-mode)
alignment a wavefront dirs path at all — round 4 pinned matrix
alignment to the lax.scan engine (``models/aligner.py`` round-4
routing; reference capability anchor ``algo.rs:151-282`` generalized
beyond ``config.rs:6-18``'s two scores).

Validated against the scan matrix engine (``_matrix_scores_call``)
and the C++ LUT oracle (``native/gotoh_cpu.cpp::gotoh_score_cpu_subst``)
in both modes; alignments bit-identical to the per-pair scan aligner.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_rs_tpu.ops.gotoh_matrix import (
    _alpha_bytes,
    _codes_bytes,
    _ext_matrix,
    _sheared_subs8,
)
from genomics_rs_tpu.ops.gotoh_pallas import (
    PACK,
    ROWS,
    _round_up,
    _shift_down_flat,
)
from genomics_rs_tpu.ops.gotoh_scan import (
    DIR_DEL,
    DIR_INS,
    DIR_STOP,
    DIR_SUB,
    INT_MIN,
    NEG_INF,
)

#: diagonals per grid step. Smaller than the DNA stream's 256: the
#: chain stride L1 is floored at S + CHUNK, so a smaller chunk cuts
#: the padded-column inflation at protein lengths. Must divide 1024
#: and be a PACK multiple.
MCHUNK = int(os.environ.get("GENOMICS_TPU_MCHUNK", "128"))
#: SSA unroll (one scratch load/store set per UNROLL diagonals).
MUNROLL = int(os.environ.get("GENOMICS_TPU_MUNROLL", "16"))
#: lane-vector size target: ~V lanes per step amortize the measured
#: ~300-400 ns dependent-step latency floor (docs/ROUND4.md §8) over
#: many cells; beyond ~16k lanes per-step time starts to grow.
VTARGET = int(os.environ.get("GENOMICS_TPU_MSTREAM_V", "12288"))

if MUNROLL < 1 or MCHUNK % MUNROLL:
    raise ValueError(
        f"GENOMICS_TPU_MUNROLL={MUNROLL} must divide MCHUNK={MCHUNK}"
    )
if MCHUNK < 1 or 1024 % MCHUNK or MCHUNK % PACK:
    raise ValueError(
        f"GENOMICS_TPU_MCHUNK={MCHUNK} must divide 1024 and be a "
        f"multiple of {PACK}"
    )


def _plan_mstream(Lm: int, Ln: int, B: int, vtarget: int | None = None):
    """(S, G, V, C, L1, T, K, Kp) for a B-pair 2-D packed stream.

    S: lane stride per pair (128-aligned so per-segment dirs lane
    slices stay walker-addressable). G: pair chains stacked in the
    vector. L1: chain stride — covers a segment's Ln+1 columns, bounds
    one seam per group per step (L1 > S), keeps consecutive flush
    windows chunk-disjoint (L1 >= S + CHUNK) and chunk-aligned. K runs
    one extra S past the last chain position so every lane crosses a
    final seam and flushes its capture.
    """
    vt = VTARGET if vtarget is None else vtarget
    S = max(_round_up(Lm + 1, 128), 128)
    # G is a multiple of 8 so V = G*S exactly (1024-aligned: S is a
    # 128-multiple) and every pane row holds whole pairs
    # (C = V/8 = (G/8)*S) — the assembler kernel's block geometry
    # requires a pair's S lanes never to straddle a pane row.
    G = 8 * max(1, min(vt // S // 8, -(-B // 8)))
    V = G * S
    L1 = _round_up(max(Ln + 1, S + MCHUNK), MCHUNK)
    T = -(-B // G)
    K = T * L1 + S
    Kp = _round_up(K, MCHUNK)
    return S, G, V, V // ROWS, L1, T, K, Kp


def _kernel_mstream(
    scalars,  # SMEM int32[2]: g, h
    ivloc_ref,  # VMEM int32 (ROWS, C): lane -> group-local DP row
    subs_ref,  # VMEM int8 (MCHUNK, ROWS, C): this chunk's subs panes
    mpane_ref,  # VMEM int32 (1, ROWS, C): m of each lane's next segment
    npane_ref,  # VMEM int32 (1, ROWS, C): n of each lane's next segment
    cbase_ref,  # SMEM int32 (1, MCHUNK): k mod L1 per step
    topI_ref,  # SMEM int32 (1, MCHUNK): row-0 I boundary per step
    topSD_ref,  # SMEM int32 (1, MCHUNK): row-0 S/D boundary per step
    *rest,  # outputs then scratch (mode-dependent)
    C: int,
    L1: int,
    chunk: int,
    is_local: bool,
    unroll: int,
    emit_dirs: bool,
):
    if is_local:
        (cv_out, cj_out, *tail) = rest
    else:
        (cv_out, *tail) = rest
    if emit_dirs:
        dirs_out = tail[0]
        tail = tail[1:]
    (Ip, Pp, Dp, Qp, shM, mcp, ncp, *tail) = tail
    if is_local:
        bvp, bjp, cvs, cjs, *tail = tail
    else:
        capp, cvs, *tail = tail
    if emit_dirs:
        accs = tail[0]

    g_id = pl.program_id(0)
    gg = scalars[0]
    hh = scalars[1]
    hg = hh + gg

    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)
    zero = jnp.int32(0)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1)
    ivloc = ivloc_ref[:]
    row0_mask = ivloc == 0
    Dcol = hh + ivloc * gg

    @pl.when(g_id == 0)
    def _init():
        full_neg = jnp.full((ROWS, C), neg, dtype=jnp.int32)
        Ip[:] = full_neg
        Pp[:] = full_neg
        Dp[:] = full_neg
        Qp[:] = full_neg
        shM[:] = full_neg
        # m/n = -1 masks every lane until its first seam crossing
        # loads the real bounds (the pre-start window).
        mcp[:] = jnp.full((ROWS, C), -1, dtype=jnp.int32)
        ncp[:] = jnp.full((ROWS, C), -1, dtype=jnp.int32)
        if is_local:
            bvp[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
            bjp[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
        else:
            capp[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        if emit_dirs:
            accs[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)

    # Per-chunk flush accumulators (each chunk reports only the lanes
    # that crossed a seam during it — windows are chunk-disjoint).
    cvs[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
    if is_local:
        cjs[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)
    mseg = mpane_ref[0]
    nseg = npane_ref[0]

    def step_ssa(state, t):
        (I0, P0, D0, Q0, M0, mc0, nc0, *loc) = state
        # Lane's segment-local column: all groups share one phase, so
        # c = (cbase - i) mod L1 from the streamed per-step scalar.
        cb = cbase_ref[0, t]
        c = cb - ivloc
        c = jnp.where(c < 0, c + L1, c)
        col0 = c == 0

        if is_local:
            bv0, bj0, cv0, cj0, *dtail = loc
            # Seam: flush the finished segment's per-lane best into
            # the chunk accumulator, reset, load new (m, n).
            cv0 = jnp.where(col0, bv0, cv0)
            cj0 = jnp.where(col0, bj0, cj0)
            bv0 = jnp.where(col0, int_min, bv0)
        else:
            cap0, cv0, *dtail = loc
            cv0 = jnp.where(col0, cap0, cv0)
            cap0 = jnp.where(col0, int_min, cap0)
        mc0 = jnp.where(col0, mseg, mc0)
        nc0 = jnp.where(col0, nseg, nc0)

        sub = subs_ref[t].astype(jnp.int32)
        shQ = _shift_down_flat(Q0, neg, row_idx, col_idx, C)
        shD = _shift_down_flat(D0, neg, row_idx, col_idx, C)

        # Identical factored recurrence to the DNA stream kernel;
        # local mode injects the reference's raw-0 lane inside every
        # predecessor max (algo.rs:103).
        if is_local:
            Inew = jnp.maximum(jnp.maximum(I0 + gg, P0 + hg), zero)
            Dnew = jnp.maximum(jnp.maximum(shQ + hg, shD + gg), zero)
            Snew = sub + jnp.maximum(M0, zero)
        else:
            Inew = jnp.maximum(I0 + gg, P0 + hg)
            Dnew = jnp.maximum(shQ + hg, shD + gg)
            Snew = sub + M0

        # Column-0 boundary (I/S = -inf, D = h + i*g); the row-0
        # scalars then override each group's row-0 lane on Q and D
        # only — that lane's I/S/P garbage (fed by the group below)
        # is never read, exactly like the stream kernel's lane 0.
        Inew = jnp.where(col0, neg, Inew)
        Snew = jnp.where(col0, neg, Snew)
        Dnew = jnp.where(col0, Dcol, Dnew)
        topI_s = topI_ref[0, t]
        topSD_s = topSD_ref[0, t]
        topQ = jnp.maximum(topI_s, topSD_s)
        Dnew = jnp.where(row0_mask, topSD_s, Dnew)
        Qnew = jnp.maximum(Inew, Snew)
        Qnew = jnp.where(row0_mask, topQ, Qnew)

        if is_local:
            # Max-based keep-last argmax (see gotoh_stream: identical
            # semantics, one-op loop-carried chain for bv).
            cmc = jnp.maximum(jnp.maximum(Qnew, Dnew), zero)
            val = jnp.where((ivloc <= mc0) & (c <= nc0), cmc, int_min)
            bv0 = jnp.maximum(bv0, val)
            bj0 = jnp.where(val == bv0, c, bj0)
            tail = (mc0, nc0, bv0, bj0, cv0, cj0)
        else:
            Mnew = jnp.maximum(Qnew, Dnew)
            hit = (ivloc == mc0) & (c == nc0)
            cap0 = jnp.where(hit, Mnew, cap0)
            tail = (mc0, nc0, cap0, cv0)
        if emit_dirs:
            # The rowblock kernel's exact code chain and tie order
            # SUB > INS > DEL > STOP; row-0 cells are walked, so I/S
            # read the row-0 stream fixes for the comparisons.
            (acc0,) = dtail
            ref_max = cmc if is_local else Mnew
            Id = jnp.where(row0_mask, topI_s, Inew)
            Sd = jnp.where(row0_mask, topSD_s, Snew)
            dcode = jnp.where(
                ref_max == Sd,
                DIR_SUB,
                jnp.where(
                    ref_max == Id,
                    DIR_INS,
                    jnp.where(ref_max == Dnew, DIR_DEL, DIR_STOP),
                ),
            )
            sp = t % PACK
            acc0 = jnp.where(sp == 0, 0, acc0) | (dcode << (2 * sp))

            @pl.when(sp == PACK - 1)
            def _flush_dirs():
                dirs_out[t // PACK] = acc0

            tail = tail + (acc0,)
        return (
            Inew,
            jnp.maximum(Snew, Dnew),
            Dnew,
            Qnew,
            jnp.maximum(shQ, shD),
        ) + tail

    core_refs = (Ip, Pp, Dp, Qp, shM, mcp, ncp)
    if is_local:
        core_refs = core_refs + (bvp, bjp, cvs, cjs)
    else:
        core_refs = core_refs + (capp, cvs)
    if emit_dirs:
        core_refs = core_refs + (accs,)

    def body(tt, _):
        state = tuple(r[:] for r in core_refs)
        for sub_i in range(unroll):
            state = step_ssa(state, unroll * tt + sub_i)
        for r, v in zip(core_refs, state):
            r[:] = v
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)
    cv_out[0] = cvs[:]
    if is_local:
        cj_out[0] = cjs[:]


@functools.partial(
    jax.jit,
    static_argnames=("B", "Lm", "Ln", "A", "fallback", "vtarget"),
)
def _mstream_build(
    s1b: jax.Array,  # (B, Lm) uint8 ASCII
    s2b: jax.Array,
    ms: jax.Array,  # (B,) true lengths
    ns: jax.Array,
    ab: jax.Array,  # (A0,) alphabet byte values
    mat: jax.Array,  # (A, A) int32
    B: int,
    Lm: int,
    Ln: int,
    A: int,
    fallback: int = 0,
    vtarget: int | None = None,
):
    """Build the (Kp, ROWS, C) int8 substitution stream.

    Per-pair diagonal-major planes (int8, true-length masked inside
    the one-hot encodings — ``gotoh_matrix._sheared_subs8``), overlaid
    at chain stride L1. A pair's plane spans at most two chain windows
    (Kpair <= L1 + S), and valid cells of window-sharing neighbours
    are disjoint (window t offset d: pair t needs d > i, pair t-1
    needs i > d), so overlay-by-addition of zero-masked planes is
    exact. A separate jit from the kernel so the two stages are
    independently measurable (the round-4 int32 build cost more than
    the DP it fed).
    """
    S, G, V, C, L1, T, K, Kp = _plan_mstream(Lm, Ln, B, vtarget)
    Bp = G * T
    Mp = Lm + 1
    Kpair = Lm + Ln + 1

    # Pad the batch to the full G*T grid with trivial pairs (masked by
    # m = n = 1; bytes map to the wildcard/min row — never read).
    if Bp != B:
        pad = Bp - B
        s1b = jnp.concatenate(
            [s1b, jnp.full((pad, Lm), 0xFE, dtype=s1b.dtype)]
        )
        s2b = jnp.concatenate(
            [s2b, jnp.full((pad, Ln), 0xFF, dtype=s2b.dtype)]
        )
        ms = jnp.concatenate(
            [jnp.asarray(ms, jnp.int32), jnp.ones(pad, jnp.int32)]
        )
        ns = jnp.concatenate(
            [jnp.asarray(ns, jnp.int32), jnp.ones(pad, jnp.int32)]
        )
    ms = jnp.asarray(ms, jnp.int32)
    ns = jnp.asarray(ns, jnp.int32)

    sh8 = _sheared_subs8(s1b, s2b, ms, ns, ab, mat, A, fallback)
    sh8 = sh8.reshape(Kpair, T, G, Mp)
    shp = jnp.pad(sh8, ((0, 2 * L1 - Kpair), (0, 0), (0, 0), (0, 0)))
    partA = jnp.transpose(shp[:L1], (1, 0, 2, 3))  # (T, L1, G, Mp)
    partB = jnp.transpose(shp[L1 : 2 * L1], (1, 0, 2, 3))
    zrow = jnp.zeros((1, L1, G, Mp), jnp.int8)
    W = jnp.concatenate([partA, zrow], 0) + jnp.concatenate(
        [zrow, partB], 0
    )  # (T+1, L1, G, Mp)
    W = jnp.pad(W, ((0, 0), (0, 0), (0, 0), (0, S - Mp)))
    W = W.reshape(T + 1, L1, G * S)
    W = jnp.pad(W, ((0, 0), (0, 0), (0, V - G * S)))
    return W.reshape((T + 1) * L1, ROWS, C)[:Kp]


# ---------------------------------------------------------------------
# Pallas stream assembler: the fused build path.
#
# The XLA build above moves the whole stream (~0.2 GB per 1024-pair
# group) through an unfused pad/flatten/transpose/overlay chain at an
# effective 30-70 GB/s — measured ~27 ms per group against a 3.5 ms DP
# fill (docs/ROUND5.md §2). The assembler replaces everything past the
# tiny one-hot encode with ONE kernel pass:
#
# * XLA prep (tiny, ~KBs): padded per-pair CODE arrays — alphabet
#   index per byte, wildcard fallback, -1 past the true length (-1
#   one-hots to nothing, so all masking is free downstream).
# * kernel (`_kernel_massemble`), grid (T+1, Gr): per (window,
#   column band) it builds each pane row's pair IN VMEM — transpose
#   the code row to a column, one-hot it against a lane iota, MXU
#   the "query profile" (prof[i, :] = matrix row of s1[i-1], the
#   classic striped-SW profile), then one MXU contraction
#   (oh2 @ prof^T — every output element selects one matrix entry,
#   so bf16 accumulation is exact) for the substitution plane — and
#   shears it diagonal-major in registers: a static circular roll
#   per 128-lane block plus 7 masked power-of-two rolls (lane i
#   needs its column rolled down by i), writing the (L1, S) window
#   slab straight into the stream's (step, pane-row, col) layout.
#   The two-window overlay is the A/B split of the SAME
#   circular-roll structure: unwrapped rows (k >= i) are this
#   window's cells; the previous window's pair finishes its tail
#   diagonals in rows k < i.
#
# Bit-identical to `_mstream_build` (the fuzz/equality tests pin it);
# requires the planner's V = G*S pane geometry (a pair's S lanes
# never straddle a pane row).
# ---------------------------------------------------------------------

#: kill-switch for the fused assembler (fall back to the XLA build).
MASSEMBLE = os.environ.get("GENOMICS_TPU_MASSEMBLE", "1") != "0"


def _use_assembler(interpret: bool) -> bool:
    """The assembler is a Mosaic kernel: TPU or interpret mode only
    (the same condition that routes batches to the stream engine)."""
    return MASSEMBLE and (
        interpret or jax.default_backend() == "tpu"
    )


def _shear_roll_down(x, extent: int, nlb: int, skip: int = 0):
    """Per-lane circular roll-down of ``x`` (extent, nlb*128) int32:
    column i (pair DP row i) rolls down by i — static coarse roll per
    128-lane block + 7 masked power-of-two rolls. The first ``skip``
    lane blocks are emitted as zeros (caller proved their post-mask
    content is zero)."""
    il = jax.lax.broadcasted_iota(jnp.int32, (extent, 128), 1)
    blocks = []
    for lb in range(nlb):
        blk = x[:, lb * 128 : (lb + 1) * 128]
        if lb < skip:
            blocks.append(jnp.zeros_like(blk))
            continue
        sh = (lb * 128) % extent
        if sh:
            blk = pltpu.roll(blk, sh, axis=0)
        for bit in range(7):
            s = 1 << bit
            rolled = pltpu.roll(blk, s, axis=0)
            blk = jnp.where((il & s) != 0, rolled, blk)
        blocks.append(blk)
    return jnp.concatenate(blocks, axis=1)


def _kernel_massemble(
    s1cA_ref,  # (8, S) int8: window-w row-mates' s1 codes (-1 pad)
    s2cA_ref,  # (8, L1) int8: their s2 codes (-1 pad)
    s1cB_ref,  # (8, S) int8: window-(w-1) row-mates'
    s2cB_ref,  # (8, L1) int8
    mat_ref,  # (A, A) bf16 substitution matrix
    out_ref,  # (L1, 8, S) int8 stream slab (one column band)
    *,
    S: int,
    L1: int,
    T: int,
    A: int,
    bskip: int,
):
    w = pl.program_id(0)
    nlb = S // 128

    def onehot_col(col, n):
        # (n, 1) int32 codes -> (n, A) bf16 one-hot; -1 pads match
        # nothing, so length/boundary masking is free.
        return (
            col
            == jax.lax.broadcasted_iota(jnp.int32, (n, A), 1)
        ).astype(jnp.bfloat16)

    i_lane = jax.lax.broadcasted_iota(jnp.int32, (L1, S), 1)
    k_io = jax.lax.broadcasted_iota(jnp.int32, (L1, S), 0)
    # Dedicated (S, S) iotas for the B mask: SLICING an iota value
    # (k_io[:S]) SIGABRTs this Mosaic version's compiler.
    i_s = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    k_s = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    matb = mat_ref[:].astype(jnp.bfloat16)

    def prof_mm(oh1):
        # per-lane profile rows: prof[i, :] = mat[c1[i], :]
        return jax.lax.dot_general(
            oh1, matb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def plane_mm(oh2, prof):
        # One-hot selection: every output element is a single matrix
        # entry, so bf16 accumulation is exact (|v| <= 127). The
        # shear datapath runs at int32 — Mosaic has no int8 vector
        # ALU and its rotate only takes 32-bit vectors; int8 appears
        # only at the HBM boundaries (loads + the final store).
        return jax.lax.dot_general(
            oh2, prof, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    for r in range(ROWS):
        # A-part: this window's pair in pane row r, diagonals [0, L1).
        c1A = jnp.transpose(
            s1cA_ref[r : r + 1, :], (1, 0)
        ).astype(jnp.int32)  # (S, 1)
        profA = prof_mm(onehot_col(c1A, S))  # (S, A)
        c2A = jnp.transpose(
            s2cA_ref[r : r + 1, :], (1, 0)
        ).astype(jnp.int32)  # (L1, 1)
        scA = plane_mm(onehot_col(c2A, L1), profA)  # (L1, S): [j, i]
        bufA = _shear_roll_down(scA, L1, nlb)
        resA = jnp.where((k_io >= i_lane) & (w < T), bufA, 0)

        # B-part: the previous window's pair finishing diagonals
        # [L1, Kpair) — the tail S rows of its plane, rolled on
        # extent S; valid exactly where the roll wrapped (k < i).
        c1B = jnp.transpose(
            s1cB_ref[r : r + 1, :], (1, 0)
        ).astype(jnp.int32)
        profB = prof_mm(onehot_col(c1B, S))
        c2B = jnp.transpose(
            s2cB_ref[r : r + 1, L1 - S :], (1, 0)
        ).astype(jnp.int32)  # (S, 1): tail columns only
        scB = plane_mm(onehot_col(c2B, S), profB)  # (S, S)
        bufB = _shear_roll_down(scB, S, nlb, skip=bskip)
        resB = jnp.where((k_s < i_s) & (w > 0), bufB, 0)

        out_ref[:S, r, :] = (resA[:S] + resB).astype(jnp.int8)
        out_ref[S:, r, :] = resA[S:].astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "B", "Lm", "Ln", "A", "fallback", "vtarget", "interpret"
    ),
)
def _mstream_build_fast(
    s1b: jax.Array,  # (B, Lm) uint8 ASCII
    s2b: jax.Array,
    ms: jax.Array,  # (B,) true lengths
    ns: jax.Array,
    ab: jax.Array,  # (A0,) alphabet byte values
    mat: jax.Array,  # (A, A) int32
    B: int,
    Lm: int,
    Ln: int,
    A: int,
    fallback: int = 0,
    vtarget: int | None = None,
    interpret: bool = False,
):
    """Fused twin of :func:`_mstream_build` (same contract, same
    bits): XLA profile/one-hot prep + one Pallas assembler pass."""
    S, G, V, C, L1, T, K, Kp = _plan_mstream(Lm, Ln, B, vtarget)
    Bp = G * T
    Gr = G // ROWS  # pairs per pane row (planner: C = Gr * S)

    if Bp != B:
        pad = Bp - B
        s1b = jnp.concatenate(
            [s1b, jnp.full((pad, Lm), 0xFE, dtype=s1b.dtype)]
        )
        s2b = jnp.concatenate(
            [s2b, jnp.full((pad, Ln), 0xFF, dtype=s2b.dtype)]
        )
        ms = jnp.concatenate(
            [jnp.asarray(ms, jnp.int32), jnp.ones(pad, jnp.int32)]
        )
        ns = jnp.concatenate(
            [jnp.asarray(ns, jnp.int32), jnp.ones(pad, jnp.int32)]
        )
    ms = jnp.asarray(ms, jnp.int32)
    ns = jnp.asarray(ns, jnp.int32)

    # Permute pairs so a program's 8 pane-row-mates are contiguous:
    # original pair (t, g = r*Gr + cb) -> prep slot t*G + cb*8 + r
    # (Mosaic block dims: the out block must span the full 8-row pane,
    # so one program assembles one column band's 8 pairs).
    qt, qrem = np.divmod(np.arange(Bp), G)
    cb_, r_ = np.divmod(qrem, ROWS)
    src = jnp.asarray(qt * G + r_ * Gr + cb_, jnp.int32)
    s1b = jnp.take(s1b, src, axis=0)
    s2b = jnp.take(s2b, src, axis=0)
    ms_p = jnp.take(ms, src)
    ns_p = jnp.take(ns, src)

    # Tiny prep: padded CODE arrays (one-hot/profile/plane work all
    # happens inside the kernel — the XLA profile prep measured
    # ~3.5 ms/group, all of it layout shuffling of small arrays).
    # Codes: alphabet index, wildcard fallback for unknown bytes, -1
    # past the true length / at the boundary row & column (-1 one-hots
    # to nothing, so masking is free downstream).
    c1 = _codes_bytes(s1b, ms_p, ab, fallback)  # (Bp, Lm) int8
    s1c = jnp.pad(
        c1, ((0, 0), (1, S - Lm - 1)), constant_values=-1
    )  # (Bp, S)
    c2 = _codes_bytes(s2b, ns_p, ab, fallback)
    s2c = jnp.pad(
        c2, ((0, 0), (1, L1 - Ln - 1)), constant_values=-1
    )  # (Bp, L1)

    # B-part lane blocks that are provably zero: lane i's B cells are
    # (i, j = k' + L1 - i) with 0 <= k' < i and j <= Ln, so block lb
    # is all-zero when lb*128 + 127 < L1 - Ln.
    nlb = S // 128
    bskip = 0
    while bskip < nlb and bskip * 128 + 127 < L1 - Ln:
        bskip += 1

    pairA = lambda w, cb: (jnp.minimum(w, T - 1) * Gr + cb, 0)
    pairB = lambda w, cb: (jnp.maximum(w - 1, 0) * Gr + cb, 0)
    grid_spec = pl.GridSpec(
        grid=(T + 1, Gr),
        in_specs=[
            pl.BlockSpec((ROWS, S), pairA, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, L1), pairA, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, S), pairB, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, L1), pairB, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (A, A), lambda w, cb: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (L1, ROWS, S),
            lambda w, cb: (w, 0, cb),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _kernel_massemble, S=S, L1=L1, T=T, A=A, bskip=bskip
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kp, ROWS, C), jnp.int8),
        interpret=interpret,
    )(s1c, s2c, s1c, s2c, mat.astype(jnp.bfloat16))


def _mstream_call(
    s1b: jax.Array,  # (B, Lm) uint8 ASCII
    s2b: jax.Array,
    ms: jax.Array,  # (B,) true lengths (concrete)
    ns: jax.Array,
    g: jax.Array,
    h: jax.Array,
    ab: jax.Array,  # (A0,) alphabet byte values
    mat: jax.Array,  # (A, A) int32
    B: int,
    Lm: int,
    Ln: int,
    A: int,
    fallback: int,
    is_local: bool,
    interpret: bool,
    emit_dirs: bool,
    vtarget: int | None = None,
):
    """Build + fill + reassemble (two jits; see ``_mstream_build``)."""
    build = (
        functools.partial(_mstream_build_fast, interpret=interpret)
        if _use_assembler(interpret)
        else _mstream_build
    )
    stream = build(
        jnp.asarray(s1b),
        jnp.asarray(s2b),
        jnp.asarray(ms, jnp.int32),
        jnp.asarray(ns, jnp.int32),
        ab,
        mat,
        B=B,
        Lm=Lm,
        Ln=Ln,
        A=A,
        fallback=fallback,
        vtarget=vtarget,
    )
    _, G, _, _, _, T, _, _ = _plan_mstream(Lm, Ln, B, vtarget)
    Bp = G * T
    ms_p = np.ones(Bp, np.int32)
    ns_p = np.ones(Bp, np.int32)
    ms_p[:B] = np.asarray(ms, np.int32)
    ns_p[:B] = np.asarray(ns, np.int32)
    return _mstream_fill(
        stream,
        jnp.asarray(ms_p),
        jnp.asarray(ns_p),
        jnp.asarray(g, jnp.int32),
        jnp.asarray(h, jnp.int32),
        B=B,
        Lm=Lm,
        Ln=Ln,
        is_local=is_local,
        interpret=interpret,
        emit_dirs=emit_dirs,
        vtarget=vtarget,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "B",
        "Lm",
        "Ln",
        "is_local",
        "interpret",
        "emit_dirs",
        "vtarget",
    ),
)
def _mstream_fill(
    stream: jax.Array,  # (Kp, ROWS, C) int8 substitution stream
    ms: jax.Array,  # (Bp,) padded true lengths
    ns: jax.Array,
    g: jax.Array,
    h: jax.Array,
    B: int,
    Lm: int,
    Ln: int,
    is_local: bool,
    interpret: bool,
    emit_dirs: bool,
    vtarget: int | None = None,
):
    S, G, V, C, L1, T, K, Kp = _plan_mstream(Lm, Ln, B, vtarget)
    Bp = G * T
    neg = jnp.int32(NEG_INF)

    # Per-lane (m, n) seam panes and lane->row map, computed on
    # device: round 5 first built these on the HOST as (T, V) int32
    # arrays — ~13 MB per group that the operand cache then HASHED
    # and uploaded per call, several ms of pure overhead per group.
    lane_g = jnp.minimum(
        jnp.arange(V, dtype=jnp.int32) // S, G - 1
    )
    pidx2 = jnp.arange(T, dtype=jnp.int32)[:, None] * G + lane_g[None, :]
    mpane = jnp.asarray(ms, jnp.int32)[pidx2].reshape(T, ROWS, C)
    npane = jnp.asarray(ns, jnp.int32)[pidx2].reshape(T, ROWS, C)
    ivloc = (
        jnp.arange(V, dtype=jnp.int32) % S
    ).reshape(ROWS, C)

    # ---- per-step scalar streams ----------------------------------
    ks = jnp.arange(Kp, dtype=jnp.int32)
    t = ks // L1
    cb = ks - t * L1
    cbase = cb[None, :]
    gg = jnp.int32(g)
    hh = jnp.int32(h)
    topI = jnp.where(cb == 0, 0, hh + cb * gg)
    topI = jnp.where(t < T, topI, neg)[None, :]
    topSD = jnp.where((cb == 0) & (t < T), 0, neg)[None, :]

    scalars = jnp.stack([gg, hh])
    Gc = Kp // MCHUNK

    smem_chunk = pl.BlockSpec(
        (1, MCHUNK), lambda gi, s: (0, gi), memory_space=pltpu.SMEM
    )
    pane_out = pl.BlockSpec(
        (1, ROWS, C), lambda gi, s: (gi, 0, 0), memory_space=pltpu.VMEM
    )
    pane_arr = jax.ShapeDtypeStruct((Gc, ROWS, C), jnp.int32)
    n_out = 2 if is_local else 1
    out_specs: tuple = tuple([pane_out] * n_out)
    out_shapes: tuple = tuple([pane_arr] * n_out)
    if emit_dirs:
        out_specs += (
            pl.BlockSpec(
                (MCHUNK // PACK, ROWS, C),
                lambda gi, s: (gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out_shapes += (
            jax.ShapeDtypeStruct((Kp // PACK, ROWS, C), jnp.int32),
        )
    n_scratch = (11 if is_local else 9) + (1 if emit_dirs else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Gc,),
        in_specs=[
            pl.BlockSpec(
                (ROWS, C), lambda gi, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (MCHUNK, ROWS, C),
                lambda gi, s: (gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ROWS, C),
                lambda gi, s: (
                    jnp.minimum(gi * MCHUNK // L1, T - 1),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ROWS, C),
                lambda gi, s: (
                    jnp.minimum(gi * MCHUNK // L1, T - 1),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [smem_chunk] * 3,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((ROWS, C), jnp.int32)] * n_scratch,
    )
    unroll = min(MUNROLL, 2) if interpret else MUNROLL
    kernel = functools.partial(
        _kernel_mstream,
        C=C,
        L1=L1,
        chunk=MCHUNK,
        is_local=is_local,
        unroll=unroll,
        emit_dirs=emit_dirs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(scalars, ivloc, stream, mpane, npane, cbase, topI, topSD)

    # ---- reassembly ------------------------------------------------
    pidx = jnp.arange(Bp, dtype=jnp.int32)
    tch = pidx // G
    grp = pidx - tch * G
    if not is_local:
        # Pair p's capture flushes when its group's lane m_p crosses
        # the seam at step (t+1)*L1 + m_p.
        fstep = (tch + 1) * L1 + ms
        cvf = outs[0].reshape(Gc, V)
        score = cvf[fstep // MCHUNK, grp * S + ms]
        if emit_dirs:
            return (score[:B], ms[:B], ns[:B]), outs[-1].reshape(
                Kp // PACK, V
            )
        return score[:B], ms[:B], ns[:B]

    # Local: gather every segment lane's flushed (value, column) and
    # reduce with the reference keep-last tie-break (larger row, then
    # larger column; the kernel already kept the last column per
    # lane).
    cvf = outs[0].reshape(Gc, V)
    cjf = outs[1].reshape(Gc, V)
    iidx = jnp.arange(S, dtype=jnp.int32)[None, :]
    fstep = (tch[:, None] + 1) * L1 + iidx  # (Bp, S)
    lanes = (grp * S)[:, None] + iidx
    vals = cvf[fstep // MCHUNK, lanes]
    cols = cjf[fstep // MCHUNK, lanes]
    vmax = jnp.max(vals, axis=1)
    ibest = jnp.max(
        jnp.where(vals == vmax[:, None], iidx, -1), axis=1
    )
    jbest = jnp.max(
        jnp.where(
            (vals == vmax[:, None]) & (iidx == ibest[:, None]),
            cols,
            -1,
        ),
        axis=1,
    )
    if emit_dirs:
        return (vmax[:B], ibest[:B], jbest[:B]), outs[-1].reshape(
            Kp // PACK, V
        )
    return vmax[:B], ibest[:B], jbest[:B]


def _mstream_applicable(matrix, g: int, h: int, Lm: int, Ln: int, B: int):
    """Geometry/headroom guards; returns False -> caller falls back."""
    ext = _ext_matrix(matrix)
    if int(np.abs(ext).max()) > 127:
        return False  # int8 subs stream
    S, G, V, C, L1, T, K, Kp = _plan_mstream(Lm, Ln, B)
    if L1 % PACK or MCHUNK % PACK:
        return False
    if V > 24576:
        # G >= 8 forces V = 8*S even for a single chain; very long
        # proteins would blow the VMEM stream-chunk budget — fall
        # back (scan handles any length).
        return False
    # Padding lanes above G*S and garbage windows drift unclamped for
    # at most the whole stream; seam-clamped lanes for at most 2*L1
    # steps. NEG_INF sits ~2^30 above int32 min, so bound total drift.
    drift = int(np.abs(ext).max()) + abs(int(g)) + abs(int(h)) + 1
    if (K + 2) * drift >= 1 << 30:
        return False
    return True


def gotoh_scores_matrix_stream(
    s1b,
    s2b,
    ms,
    ns,
    matrix,
    g: int,
    h: int,
    is_local: bool = False,
    interpret: bool = False,
    vtarget: int | None = None,
):
    """Score a batch of pairs under a full substitution matrix through
    the 2-D packed continuous stream. Same contract as
    ``gotoh_matrix.gotoh_scores_matrix``: ``(score, start_i, start_j)``
    with the reference's exact local keep-last argmax. Returns ``None``
    when the formulation doesn't apply (caller falls back to the
    segmented/scan engines)."""
    B, Lm = np.shape(s1b)
    _, Ln = np.shape(s2b)
    ms_np = np.asarray(ms, np.int32)
    ns_np = np.asarray(ns, np.int32)
    if B < 1 or np.any(ms_np < 1) or np.any(ns_np < 1):
        return None
    if not _mstream_applicable(matrix, g, h, Lm, Ln, B):
        return None
    ab, fallback, _ = _alpha_bytes(matrix)
    ext = _ext_matrix(matrix)
    return _mstream_call(
        jnp.asarray(s1b),
        jnp.asarray(s2b),
        ms_np,
        ns_np,
        jnp.int32(g),
        jnp.int32(h),
        jnp.asarray(ab),
        jnp.asarray(ext),
        B=B,
        Lm=Lm,
        Ln=Ln,
        A=int(ext.shape[0]),
        fallback=fallback,
        is_local=is_local,
        interpret=interpret,
        emit_dirs=False,
        vtarget=vtarget,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "NB", "B0", "Lm", "Ln", "A", "fallback", "is_local",
        "interpret", "use_fast", "vtarget",
    ),
)
def _mstream_grouped_call(
    s1g,  # (NB, B0, Lm) uint8
    s2g,  # (NB, B0, Ln)
    msg,  # (NB, Bp) padded true lengths
    nsg,
    g,
    h,
    ab,
    mat,
    NB: int,
    B0: int,
    Lm: int,
    Ln: int,
    A: int,
    fallback: int,
    is_local: bool,
    interpret: bool,
    use_fast: bool,
    vtarget: int | None,
):
    def body(_, xs):
        s1b, s2b, msp, nsp = xs
        build = (
            functools.partial(_mstream_build_fast, interpret=interpret)
            if use_fast
            else _mstream_build
        )
        stream = build(
            s1b, s2b, msp[:B0], nsp[:B0], ab, mat,
            B=B0, Lm=Lm, Ln=Ln, A=A, fallback=fallback,
            vtarget=vtarget,
        )
        outs = _mstream_fill(
            stream, msp, nsp, g, h,
            B=B0, Lm=Lm, Ln=Ln, is_local=is_local,
            interpret=interpret, emit_dirs=False, vtarget=vtarget,
        )
        return 0, outs

    _, outs = jax.lax.scan(body, 0, (s1g, s2g, msg, nsg))
    return outs


def gotoh_scores_matrix_stream_grouped(
    s1b,
    s2b,
    ms,
    ns,
    matrix,
    g: int,
    h: int,
    is_local: bool = False,
    group_size: int = 1024,
    interpret: bool = False,
    vtarget: int | None = None,
):
    """Score a LARGE batch through the stream kernel in sub-batches
    scanned inside ONE jit — a single dispatch regardless of group
    count, with peak device memory of one group's stream. Production
    value: fewer host round trips and a bounded footprint; on this
    environment's tunnel it is also the only honest way to measure
    steady-state throughput past the ~27 ms per-dispatch floor.
    Score-only (dirs need per-group walks — use the ungrouped entry).
    Returns ``(score, start_i, start_j)`` of shape (B,) like
    :func:`gotoh_scores_matrix_stream`, or ``None`` when inapplicable.
    """
    s1b = np.asarray(s1b)
    s2b = np.asarray(s2b)
    B, Lm = s1b.shape
    _, Ln = s2b.shape
    ms_np = np.asarray(ms, np.int32)
    ns_np = np.asarray(ns, np.int32)
    if B < 1 or np.any(ms_np < 1) or np.any(ns_np < 1):
        return None
    if not _mstream_applicable(matrix, g, h, Lm, Ln, B):
        return None
    B0 = min(group_size, B)
    NB = -(-B // B0)
    Bt = NB * B0
    if Bt != B:
        s1b = np.concatenate(
            [s1b, np.full((Bt - B, Lm), 0xFE, s1b.dtype)]
        )
        s2b = np.concatenate(
            [s2b, np.full((Bt - B, Ln), 0xFF, s2b.dtype)]
        )
        ms_np = np.concatenate(
            [ms_np, np.ones(Bt - B, np.int32)]
        )
        ns_np = np.concatenate(
            [ns_np, np.ones(Bt - B, np.int32)]
        )
    plan = _plan_mstream(Lm, Ln, B0, vtarget)
    S, G, V, C, L1, T, K, Kp = plan
    Bp = G * T
    ab, fallback, _ = _alpha_bytes(matrix)
    ext = _ext_matrix(matrix)
    msg = np.ones((NB, Bp), np.int32)
    nsg = np.ones((NB, Bp), np.int32)
    msg[:, :B0] = ms_np.reshape(NB, B0)
    nsg[:, :B0] = ns_np.reshape(NB, B0)
    # Repeat corpus jobs re-submit identical operand stacks; keep them
    # device-resident (the digest-keyed cache) instead of re-uploading
    # tens of MB per call.
    from genomics_rs_tpu.utils.devcache import device_put_cached

    score, si, sj = _mstream_grouped_call(
        device_put_cached(s1b.reshape(NB, B0, Lm)),
        device_put_cached(s2b.reshape(NB, B0, Ln)),
        device_put_cached(msg),
        device_put_cached(nsg),
        jnp.int32(g),
        jnp.int32(h),
        jnp.asarray(ab),
        jnp.asarray(ext),
        NB=NB,
        B0=B0,
        Lm=Lm,
        Ln=Ln,
        A=int(ext.shape[0]),
        fallback=fallback,
        is_local=is_local,
        interpret=interpret,
        use_fast=_use_assembler(interpret),
        vtarget=vtarget,
    )
    return (
        score.reshape(-1)[:B],
        si.reshape(-1)[:B],
        sj.reshape(-1)[:B],
    )


class MatrixStreamDirsResult:
    """Scores + packed direction words of a 2-D packed matrix fill.

    ``dirs`` is the GLOBAL word array (Kp/16, V): the code of cell
    (i, j) of pair ``p = t*G + g`` sits at word
    ``((t*L1 + i + j) // 16)``, lane ``g*S + i`` — a diag16 bitmap at
    word offset ``koff(p) = t*L1/16`` and lane offset
    ``loff(p) = g*S`` (``traceback_pallas.walk_many`` takes both).
    """

    def __init__(
        self, score, start_i, start_j, dirs, ms, ns,
        S: int, G: int, L1: int, KW: int,
    ):
        self.score = score
        self.start_i = np.asarray(start_i)
        self.start_j = np.asarray(start_j)
        self.dirs = dirs
        self.ms = np.asarray(ms)
        self.ns = np.asarray(ns)
        self.S = S
        self.G = G
        self.L1 = L1
        self.KW = KW

    def koff(self, p: int) -> int:
        return (p // self.G) * (self.L1 // PACK)

    def loff(self, p: int) -> int:
        return (p % self.G) * self.S

    def segment_dirs(self, p: int):
        """Pair ``p``'s (KW, S) diag16 bitmap (device-side slice)."""
        return _slice_dirs2(
            self.dirs,
            jnp.int32(self.koff(p)),
            jnp.int32(self.loff(p)),
            self.KW,
            self.S,
        )


@functools.partial(jax.jit, static_argnames=("KW", "S"))
def _slice_dirs2(dirs, word0, lane0, KW: int, S: int):
    return jax.lax.dynamic_slice(dirs, (word0, lane0), (KW, S))


def gotoh_matrix_stream_fill_dirs(
    s1b,
    s2b,
    ms,
    ns,
    matrix,
    g: int,
    h: int,
    is_local: bool = False,
    interpret: bool = False,
    vtarget: int | None = None,
) -> MatrixStreamDirsResult | None:
    """Streamed matrix fill that also emits packed direction bitmaps —
    the alignment-returning protein counterpart of
    ``gotoh_stream.gotoh_stream_fill_dirs`` (round 4 pinned matrix
    alignment to the lax.scan engine). ``None`` when inapplicable."""
    B, Lm = np.shape(s1b)
    _, Ln = np.shape(s2b)
    ms_np = np.asarray(ms, np.int32)
    ns_np = np.asarray(ns, np.int32)
    if B < 1 or np.any(ms_np < 1) or np.any(ns_np < 1):
        return None
    if not _mstream_applicable(matrix, g, h, Lm, Ln, B):
        return None
    ab, fallback, _ = _alpha_bytes(matrix)
    ext = _ext_matrix(matrix)
    S, G, V, C, L1, T, K, Kp = _plan_mstream(Lm, Ln, B, vtarget)
    (score, si, sj), dirs = _mstream_call(
        jnp.asarray(s1b),
        jnp.asarray(s2b),
        ms_np,
        ns_np,
        jnp.int32(g),
        jnp.int32(h),
        jnp.asarray(ab),
        jnp.asarray(ext),
        B=B,
        Lm=Lm,
        Ln=Ln,
        A=int(ext.shape[0]),
        fallback=fallback,
        is_local=is_local,
        interpret=interpret,
        emit_dirs=True,
        vtarget=vtarget,
    )
    KW = (Lm + Ln) // PACK + 1
    # ONE device_get round trip: separate np.asarray pulls of score /
    # start_i / start_j each pay the ~25 ms tunnel sync.
    score, si, sj = jax.device_get((score, si, sj))
    return MatrixStreamDirsResult(
        score,
        si if is_local else ms_np,
        sj if is_local else ns_np,
        dirs,
        ms_np,
        ns_np,
        S=S,
        G=G,
        L1=L1,
        KW=KW,
    )
