"""Batched banded Gotoh kernel: 8 pairs per pane, one band each.

The single-pair banded kernel (``ops/gotoh_banded``) is dependent-step
latency bound: a width-V band advances ONE row per ~1.5 us step (the
in-row (max, +) prefix scan chains ~log2 V dependent rounds on top of
the measured 250-400 ns step floor), so per-pair throughput is capped
near 1e9 band-cells/s regardless of op trimming (docs/ROUND4.md §8's
floor analysis). The per-step cost is fixed — lanes are the only free
variable — so this kernel packs EIGHT pairs into the (8, C) pane, one
pair per sublane row, C = the band width W: every dependent step now
advances one row of eight alignments, amortizing the latency 8x. For
banded's real workload (corpora of similar sequences: resequenced
samples, same-species chromosomes) batches are the norm.

Shared band geometry: all pairs in a pane ride the window of the
batch geometry ``(M, N) = (max m, max n)`` — ``off(i)`` and the
per-row slide ``delta`` stay per-step *scalars* (SMEM streams), and
the row-local shifts need no per-pair alignment. The banded-method
guarantee is per pair unchanged: the result equals the full DP iff an
optimal path of that pair stays inside the (shared) window — pinned
bit-identical to ``gotoh_banded`` with the same geometry override and
to the full-DP scan oracle whenever ``W >= N``. Per-pair data enters
as per-row char panes (s1 char and window-entering s2 char per
sublane row) and per-pair probe-cell constant panes.

The in-row scan drops the single-pair kernel's cross-sublane phases
(each sublane row is an independent pair), so the batched step body
is SHORTER than the single-pair one.

Dirs pack exactly like the single-pair kernel (16 rows per int32 at
each band lane); pair r's bitmap is the sublane-row slice
``dirs[:, r, :]``, walked by ``gotoh_banded.walk_banded`` with the
shared geometry. Reference anchor: banded alignment has no reference
analog (``algo.rs`` fills the full O(mn) rectangle); the semantics
quirks (tie order S > I > D, boundary values) mirror
``algo.rs:193-220,351-399`` inside the band.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_banded import (
    BAND_UNROLL,
    PACK,
    RC,
    band_offset,
)
from genomics_rs_tpu.ops.gotoh_pallas import ROWS, _round_up
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


def _kernel_banded8(
    scalars,  # SMEM int32[8]: sm, sx, g, h, st, pad...
    s2init_ref,  # VMEM int32 (8, C): row-0 window chars per pair
    mpane_ref,  # VMEM int32 (8, C): probe row (m_p) per lane
    vpane_ref,  # VMEM int32 (8, C): probe band lane (v_mn_p) per lane
    s1c_ref,  # VMEM int32 (RC, 8, 128): s1 char per (row, pair)
    s2in_ref,  # VMEM int32 (RC, 8, 128): entering s2 char per (row, pair)
    delta_ref,  # SMEM int32 (1, RC): shared window slide per row
    fillM_ref,  # SMEM int32 (1, RC): shared M-shift left fill
    fillN_ref,  # SMEM int32 (1, RC): shared I-seed left fill
    dirs_ref,  # VMEM out (RC//16, 8, C)
    fin_ref,  # VMEM out (8, C)
    s2w,  # scratch (8, C)
    Ap,
    Mp,
    fin_s,
    acc_s,
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
    st = scalars[4] if kimura else None
    hg = hh + gg

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1)
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)
    mpane = mpane_ref[:]
    vpane = vpane_ref[:]

    @pl.when(g_id == 0)
    def _init():
        M0 = hh + (col_idx + 1) * gg
        Mp[:] = M0
        Ap[:] = M0 + hg
        s2w[:] = s2init_ref[:]
        fin_s[:] = jnp.full((ROWS, C), int_min, dtype=jnp.int32)
        acc_s[:] = jnp.zeros((ROWS, C), dtype=jnp.int32)

    def shift_up_row(x, inc):
        r = pltpu.roll(x, shift=C - 1, axis=1)
        return jnp.where(col_idx == C - 1, inc, r)

    def shift_down_row(x, inc):
        r = pltpu.roll(x, shift=1, axis=1)
        return jnp.where(col_idx == 0, inc, r)

    def scan_maxplus(x):
        """Row-local (max, +) prefix (each sublane row = one pair)."""
        d = 1
        while d < C:
            r = pltpu.roll(x, shift=d, axis=1)
            r = jnp.where(col_idx < d, neg, r)
            x = jnp.maximum(x, r + d * gg)
            d *= 2
        return x

    def step(state, t, i):
        s2w0, A0, M0, fin0, acc0 = state
        dlt = delta_ref[0, t]
        is1 = dlt == 1
        s1c = s1c_ref[t][:, :1]  # (8, 1): per-pair row char
        s2in = s2in_ref[t][:, :1]

        A_up = shift_up_row(A0, neg)
        Dn = jnp.where(is1, A_up, A0)
        M_dn = shift_down_row(M0, fillM_ref[0, t])
        M_al = jnp.where(is1, M0, M_dn)
        s2_up = shift_up_row(s2w0, s2in)
        s2w1 = jnp.where(is1, s2_up, s2w0)

        sub = sub_score(s1c, s2w1, sm, sx, st)
        Sn = sub + M_al
        P = jnp.maximum(Sn, Dn)
        seed = shift_down_row(P + hg, fillN_ref[0, t])
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

        fin1 = jnp.where((i == mpane) & (col_idx == vpane), cm, fin0)

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
    jax.jit, static_argnames=("W", "M", "N", "interpret")
)
def _banded_batch_call(
    s1b: jax.Array,  # (8, Lm) uint8 (padded batch pane)
    s2b: jax.Array,  # (8, Ln)
    mpane: jax.Array,  # (8, C) int32: probe row per lane
    vpane: jax.Array,  # (8, C) int32: probe band lane per lane
    scores: Scores,
    W: int,
    M: int,
    N: int,
    interpret: bool,
):
    C = W
    Mp = _round_up(M, RC)
    neg = jnp.int32(NEG_INF)
    gg = jnp.int32(scores.g)
    hh = jnp.int32(scores.h)

    rows = np.arange(1, Mp + 1, dtype=np.int64)
    off = band_offset(rows, M, N, W).astype(np.int64)
    off_prev = band_offset(rows - 1, M, N, W).astype(np.int64)
    delta = (off - off_prev).astype(np.int32)
    if delta.max(initial=0) > 1 or delta.min(initial=0) < 0:
        raise ValueError(
            f"band window slides by more than one column per row "
            f"(M={M}, N={N}): banded alignment needs N <= M"
        )

    enc1 = encode_chars(jnp.asarray(s1b), scores)  # (8, Lm)
    enc2 = encode_chars(jnp.asarray(s2b), scores)
    s1_idx = np.minimum(rows - 1, s1b.shape[1] - 1).astype(np.int32)
    # (Mp, 8): each pair's row char; broadcast to the 128-lane pane.
    s1c = jnp.take(enc1, jnp.asarray(s1_idx), axis=1).T
    s1c = jnp.broadcast_to(s1c[:, :, None], (Mp, ROWS, 128))
    in_idx = np.minimum(off + W - 1, s2b.shape[1] - 1).astype(np.int32)
    s2in = jnp.take(enc2, jnp.asarray(in_idx), axis=1).T
    s2in = jnp.broadcast_to(s2in[:, :, None], (Mp, ROWS, 128))

    at0 = jnp.asarray(off == 0)
    rj = jnp.asarray(rows, jnp.int32)
    fillM = jnp.where(
        at0, jnp.where(rj == 1, 0, hh + (rj - 1) * gg), neg
    )[None, :]
    fillN = jnp.where(at0, hh + rj * gg + hh + gg, neg)[None, :]

    take_n = min(W, s2b.shape[1])
    s2init = jnp.full(
        (ROWS, W), sentinel(0xFF, scores), dtype=jnp.int32
    )
    s2init = jax.lax.dynamic_update_slice(
        s2init, enc2[:, :take_n], (jnp.int32(0), jnp.int32(0))
    )

    scalars = jnp.stack(
        [
            jnp.int32(scores.s_match),
            jnp.int32(scores.s_mismatch),
            gg,
            hh,
            jnp.int32(
                scores.s_transition if kimura_active(scores) else 0
            ),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
        ]
    )

    G = Mp // RC
    smem_row = pl.BlockSpec(
        (1, RC), lambda g, s: (0, g), memory_space=pltpu.SMEM
    )
    pane = pl.BlockSpec(
        (ROWS, C), lambda g, s: (0, 0), memory_space=pltpu.VMEM
    )
    charpane = pl.BlockSpec(
        (RC, ROWS, 128), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM
    )
    unroll = 2 if interpret else BAND_UNROLL
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pane, pane, pane, charpane, charpane]
        + [smem_row] * 3,
        out_specs=(
            pl.BlockSpec(
                (RC // PACK, ROWS, C),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pane,
        ),
        scratch_shapes=[pltpu.VMEM((ROWS, C), jnp.int32)] * 5,
    )
    kernel = functools.partial(
        _kernel_banded8,
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
        mpane,
        vpane,
        s1c,
        s2in,
        jnp.asarray(delta)[None, :],
        fillM,
        fillN,
    )
    score = jnp.max(
        jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, C), 1) == vpane,
            fin,
            jnp.int32(INT_MIN),
        ),
        axis=1,
    )
    return score, dirs


class BandedBatchResult:
    """Scores + packed words of one 8-pair banded pane.

    ``pair_dirs(r)`` is pair r's (Mp/16, W) bitmap —
    ``gotoh_banded.walk_banded(..., geom=(M, N))`` walks it with the
    shared window geometry.
    """

    def __init__(self, score, dirs, ms, ns, W: int, M: int, N: int):
        self.score = score
        self.dirs = dirs  # (Mp//16, 8, W)
        self.ms = np.asarray(ms)
        self.ns = np.asarray(ns)
        self.W = W
        self.M = M
        self.N = N

    def pair_dirs(self, r: int):
        from genomics_rs_tpu.ops.gotoh_matrix_stream import _slice_dirs2

        KW = self.dirs.shape[0]
        flat = self.dirs.reshape(KW, ROWS * self.W)
        return _slice_dirs2(
            flat, jnp.int32(0), jnp.int32(r * self.W), KW, self.W
        )


def gotoh_banded_batch(
    s1b,
    s2b,
    ms,
    ns,
    scores: Scores,
    W: int,
    interpret: bool = False,
) -> list[BandedBatchResult]:
    """Banded fills for a batch of similar pairs, eight per pane.

    Args mirror the batch kernels: (B, Lm)/(B, Ln) uint8 arrays with
    true lengths ``ms``/``ns``; all pairs share the band geometry
    ``(M, N) = (max ms, max ns)`` (requires ``N <= M`` and every
    pair's ``(m_p, n_p)`` cell inside the shared window — similar
    lengths; raises otherwise). Returns one :class:`BandedBatchResult`
    per 8-pair group, in order; group g covers pairs
    ``[8g, min(8(g+1), B))``.
    """
    if W < 128 or W % 128:
        raise ValueError(f"band width W={W} must be a multiple of 128")
    s1b = np.asarray(s1b)
    s2b = np.asarray(s2b)
    ms_np = np.asarray(ms, np.int64)
    ns_np = np.asarray(ns, np.int64)
    B = s1b.shape[0]
    if B < 1 or np.any(ms_np < 1) or np.any(ns_np < 1):
        raise ValueError("banded batch needs nonempty pairs")
    M = int(ms_np.max())
    N = int(ns_np.max())
    if not 1 <= N <= M:
        raise ValueError(
            f"banded batch needs 1 <= N ({N}) <= M ({M}); swap pairs"
        )
    v_mn = ns_np - band_offset(ms_np, M, N, W) - 1
    if np.any((v_mn < 0) | (v_mn >= W)):
        bad = int(np.argmax((v_mn < 0) | (v_mn >= W)))
        raise ValueError(
            f"pair {bad} ({ms_np[bad]}x{ns_np[bad]}) ends outside the "
            f"shared band (M={M}, N={N}, W={W}): lengths too "
            "dissimilar for one banded batch — bucket by length or "
            "widen W"
        )
    out = []
    for g0 in range(0, B, ROWS):
        sub = slice(g0, min(g0 + ROWS, B))
        nsub = sub.stop - sub.start
        pad = ROWS - nsub
        s1p = s1b[sub]
        s2p = s2b[sub]
        msp = ms_np[sub]
        nsp = ns_np[sub]
        if pad:
            s1p = np.concatenate(
                [s1p, np.repeat(s1p[-1:], pad, axis=0)]
            )
            s2p = np.concatenate(
                [s2p, np.repeat(s2p[-1:], pad, axis=0)]
            )
            msp = np.concatenate([msp, np.repeat(msp[-1:], pad)])
            nsp = np.concatenate([nsp, np.repeat(nsp[-1:], pad)])
        vm = (nsp - band_offset(msp, M, N, W) - 1).astype(np.int32)
        mpane = np.broadcast_to(
            msp.astype(np.int32)[:, None], (ROWS, W)
        ).copy()
        vpane = np.broadcast_to(vm[:, None], (ROWS, W)).copy()
        score, dirs = _banded_batch_call(
            jnp.asarray(s1p),
            jnp.asarray(s2p),
            jnp.asarray(mpane),
            jnp.asarray(vpane),
            scores,
            W=W,
            M=M,
            N=N,
            interpret=bool(interpret),
        )
        out.append(
            BandedBatchResult(
                score, dirs, msp[:nsub], nsp[:nsub], W, M, N
            )
        )
    return out


def banded_align_batch(
    s1b,
    s2b,
    ms,
    ns,
    scores: Scores,
    W: int,
    interpret: bool = False,
):
    """Batched banded fills + per-pair walks; returns a list of
    ``(score, moves)`` in batch order (moves in walk order, the
    ``classify_moves`` input). The walks ride the Mosaic banded walker
    on TPU (``gotoh_banded.walk_banded`` with the shared geometry)."""
    from genomics_rs_tpu.ops.gotoh_banded import walk_banded

    groups = gotoh_banded_batch(
        s1b, s2b, ms, ns, scores, W, interpret=interpret
    )
    results = []
    for res in groups:
        scores_np = np.asarray(res.score)
        for r in range(len(res.ms)):
            moves = walk_banded(
                res.pair_dirs(r),
                int(res.ms[r]),
                int(res.ns[r]),
                res.W,
                geom=(res.M, res.N),
            )
            results.append((int(scores_np[r]), moves))
    return results
