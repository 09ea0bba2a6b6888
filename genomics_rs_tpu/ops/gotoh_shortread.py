"""Row-scan batched Gotoh kernel for short pairs (reads).

The wavefront kernels vectorize along one pair's anti-diagonal — ideal
at genome scale, but a 100–500 bp pair can't fill a 30k-lane flat
diagonal. This kernel flips the axes twice:

* **lane = pair**: a (8, 128) pane holds 1024 independent pairs in
  lockstep; the batch is the vector width.
* **whole DP rows per step**: for row i, the vertical-gap matrix D and
  the substitution matrix S depend only on row i-1 and are computed
  for ALL columns at once as (L2, 8, 128) tensor ops. The horizontal
  chain I[j] = max(I[j-1] + g, M[j-1] + h + g) is a first-order
  (max, +) linear recurrence, solved with a log2(L2)-round parallel
  prefix scan: x = max(x, roll(x, d) + d*g), d = 1, 2, 4, ... —
  the same trick SIMD Smith-Waterman engines use to break the
  column dependency, mapped onto pane-rolls.

So the only sequential loop is over L1 rows; every op inside engages
all pairs and all columns. Semantics match the reference/oracle
exactly (zero-floor placement, I<->D cross transitions); the local
argmax keeps per-(column, lane) running bests (keep-last ``>=`` over
rows) and resolves the reference's last-row-major tie-break in the
wrapper reduction (larger value, then larger i, then larger j).
"""

from __future__ import annotations

import functools

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
from genomics_rs_tpu.ops.gotoh_scan import (
    DIR_DEL,
    DIR_INS,
    DIR_STOP,
    DIR_SUB,
    INT_MIN,
    NEG_INF,
)

PANE = (8, 128)
PANE_N = 1024


def _rowscan_body(
    scalars,
    s1_ref,
    s2_ref,
    m_ref,
    n_ref,
    fin_ref,
    bv_ref,
    bi_ref,
    *rest,  # [codes_ref (1, RC, W, 8, 128) iff RC] + 6 scratch refs
    L1: int,
    L2: int,
    is_local: bool,
    RC: int | None = None,
    kimura: bool = False,
):
    if RC is not None:
        codes_ref, (rI, rS, rD, fin_s, bv_s, bi_s) = rest[0], rest[1:]
    else:
        codes_ref, (rI, rS, rD, fin_s, bv_s, bi_s) = None, rest
    sm = scalars[0]
    sx = scalars[1]
    gg = scalars[2]
    hh = scalars[3]
    st = scalars[4] if kimura else None
    hg = hh + gg
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)
    zero_lane = jnp.int32(0) if is_local else neg

    mv = m_ref[0]  # (8, 128)
    nv = n_ref[0]
    s2v = s2_ref[0]  # (L2, 8, 128)

    # Column index per row-position: jrow[j] = j + 1 (cols are 1..L2).
    jrow = 1 + jax.lax.broadcasted_iota(jnp.int32, (L2, 8, 128), 0)

    chunked = codes_ref is not None
    chunk = pl.program_id(1) if chunked else 0
    row_lo = chunk * RC + 1 if chunked else 1
    row_hi = row_lo + RC if chunked else L1 + 1

    def init_scratch():
        # Row 0: I(0, j) = h + j*g, S = D = -inf (j >= 1).
        rI[:] = hh + jrow * gg
        rS[:] = jnp.full((L2, 8, 128), neg, dtype=jnp.int32)
        rD[:] = jnp.full((L2, 8, 128), neg, dtype=jnp.int32)
        # bv/bi are only consumed in local mode, but the final stores
        # run unconditionally — initialize always so the outputs are
        # never uninitialized VMEM.
        fin_s[:] = jnp.full((L2, 8, 128), int_min, dtype=jnp.int32)
        bv_s[:] = jnp.full((L2, 8, 128), int_min, dtype=jnp.int32)
        bi_s[:] = jnp.zeros((L2, 8, 128), dtype=jnp.int32)

    if chunked:
        pl.when(chunk == 0)(init_scratch)
    else:
        init_scratch()

    def shift_row(x, fill):
        """y[j] = x[j-1] along the column axis; y[0] = fill."""
        r = pltpu.roll(x, shift=1, axis=0)
        return jnp.where(jrow == 1, fill, r)

    def row_body(i, _):
        Ip, Sp, Dp = rI[:], rS[:], rD[:]

        # Previous row, previous column (i-1, j-1); (i-1, 0) boundary:
        # D = h + (i-1)*g at j=0 for i >= 2, origin 0 at i == 1.
        Mp = jnp.maximum(jnp.maximum(Ip, Sp), Dp)
        corner = jnp.where(i == 1, 0, hh + (i - 1) * gg)
        Mp_sh = shift_row(Mp, corner)

        # D(i, j) = max(max(I, S)(i-1, j) + h + g, D(i-1, j) + g [,0]).
        Dn = jnp.maximum(
            jnp.maximum(jnp.maximum(Ip, Sp) + hg, Dp + gg), zero_lane
        )
        # S(i, j) = sub + max(M(i-1, j-1) [,0]).
        s1c = s1_ref[0, i - row_lo]  # (8, 128); block-local row index
        sub = sub_score(s1c, s2v, sm, sx, st)
        Sn = sub + jnp.maximum(Mp_sh, zero_lane)

        # I(i, j) = max(I(i, j-1) + g, max(S, D)(i, j-1) + h + g [,0]):
        # a (max, +) prefix over j. Seed v[j] with the non-I sources
        # shifted into place; column 0 contributes its boundary cell
        # (I = S = -inf, D = h + i*g — algo.rs:193-220) with the
        # local zero floor applied like any other predecessor max.
        N = jnp.maximum(jnp.maximum(Sn, Dn) + hg, zero_lane)
        x = shift_row(N, jnp.maximum(hh + i * gg + hg, zero_lane))
        d = 1
        while d < L2:
            r = pltpu.roll(x, shift=d, axis=0)
            r = jnp.where(jrow <= d, neg, r)
            x = jnp.maximum(x, r + d * gg)
            d *= 2
        In = x

        cm = jnp.maximum(jnp.maximum(In, Sn), Dn)
        if is_local:
            cm = jnp.maximum(cm, 0)
            in_true = (i <= mv) & (jrow <= nv)
            val = jnp.where(in_true, cm, int_min)
            upd = val >= bv_s[:]
            bv_s[:] = jnp.where(upd, val, bv_s[:])
            bi_s[:] = jnp.where(upd, i, bi_s[:])
        fin_s[:] = jnp.where((i == mv) & (jrow == nv), cm, fin_s[:])

        if chunked:
            # Retrace move code, reference arm order S > I > D then
            # stop (algo.rs:351-399; matches gotoh_scan's emission),
            # packed 16 j-consecutive codes per int32 word.
            code = jnp.where(
                cm == Sn,
                DIR_SUB,
                jnp.where(
                    cm == In,
                    DIR_INS,
                    jnp.where(cm == Dn, DIR_DEL, DIR_STOP),
                ),
            )
            seg = code.reshape(L2 // 16, 16, 8, 128)
            acc = seg[:, 0]
            for t in range(1, 16):
                acc = acc | (seg[:, t] << (2 * t))
            codes_ref[0, pl.ds(i - row_lo, 1)] = acc[None]

        rI[:] = In
        rS[:] = Sn
        rD[:] = Dn
        return 0

    jax.lax.fori_loop(row_lo, row_hi, row_body, 0)
    fin_ref[0] = fin_s[:]
    bv_ref[0] = bv_s[:]
    bi_ref[0] = bi_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("is_local", "emit_dirs", "interpret", "vma_axes"),
)
def gotoh_scores_shortread(
    s1b: jax.Array,
    s2b: jax.Array,
    ms: jax.Array,
    ns: jax.Array,
    scores: Scores,
    is_local: bool,
    emit_dirs: bool = False,
    interpret: bool = False,
    vma_axes: tuple[str, ...] = (),
):
    """Score B short pairs, 1024 per kernel pane.

    s1b (B, L1), s2b (B, L2) uint8 (padded; pad bytes of the two sides
    must differ); ms/ns true lengths (>= 1; degenerate empty sequences
    are the caller's edge case). Returns (score, start_i, start_j)
    arrays of shape (B,); with ``emit_dirs`` a fourth element carries
    the per-read packed direction words ``codes[b, i-1, (j-1)//16]``
    (16 x 2-bit interior-cell codes per int32, the ``rows16`` layout of
    ``ops/traceback_batch.walk_batch``), streamed to HBM in row chunks
    so VMEM holds only one chunk at a time.
    """
    B, L1 = s1b.shape
    _, L2 = s2b.shape
    n_panes = -(-B // PANE_N)
    Bp = n_panes * PANE_N

    def to_panes(x, pad_val):
        x = jnp.asarray(x).astype(jnp.int32)
        pad = jnp.full((Bp - B,) + x.shape[1:], pad_val, dtype=jnp.int32)
        x = jnp.concatenate([x, pad], axis=0)
        if x.ndim == 2:
            return jnp.transpose(
                x.reshape(n_panes, 8, 128, x.shape[1]), (0, 3, 1, 2)
            )
        return x.reshape(n_panes, 8, 128)

    s1p = to_panes(encode_chars(jnp.asarray(s1b), scores), sentinel(0xFE, scores))
    s2p = to_panes(encode_chars(jnp.asarray(s2b), scores), sentinel(0xFF, scores))
    mp = to_panes(ms, 1)
    np_ = to_panes(ns, 1)

    kim = kimura_active(scores)
    scalars = jnp.stack(
        [
            jnp.int32(scores.s_match),
            jnp.int32(scores.s_mismatch),
            jnp.int32(scores.g),
            jnp.int32(scores.h),
            # st rides a spare slot in kimura variants.
            jnp.int32(scores.s_transition if kim else 0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
        ]
    )

    # One grid-spec construction for both modes. emit_dirs adds a
    # row-chunk grid axis: VMEM holds one RC-row slab of packed codes
    # (and of s1) per step; rI/rS/rD scratch carries the DP rows
    # across chunks of the same pane (the chunk axis is innermost, so
    # a pane's chunks run consecutively).
    if emit_dirs:
        RC = min(L1, 32)
        if L1 % RC:
            raise ValueError(f"L1 {L1} not a multiple of the {RC}-row chunk")
        W = L2 // 16
        grid = (n_panes, L1 // RC)
        maps = {
            "pane": lambda p, c, s: (p, 0, 0),
            "rows": lambda p, c, s: (p, 0, 0, 0),
            "s1": lambda p, c, s: (p, c, 0, 0),
            "codes": lambda p, c, s: (p, c, 0, 0, 0),
        }
        s1_block = (1, RC, 8, 128)
    else:
        RC = None
        grid = (n_panes,)
        maps = {
            "pane": lambda p, s: (p, 0, 0),
            "rows": lambda p, s: (p, 0, 0, 0),
            "s1": lambda p, s: (p, 0, 0, 0),
        }
        s1_block = (1, L1, 8, 128)

    def _spec(block_shape, which):
        return pl.BlockSpec(
            block_shape, maps[which], memory_space=pltpu.VMEM
        )

    # vma: under shard_map+check_vma the out avals must declare their
    # varying manual axes (every other op auto-promotes).
    out_vma = frozenset(vma_axes) if vma_axes else None
    row_out = _spec((1, L2, 8, 128), "rows")
    out_specs = (row_out,) * 3
    out_shape = [
        jax.ShapeDtypeStruct((n_panes, L2, 8, 128), jnp.int32, vma=out_vma)
    ] * 3
    if emit_dirs:
        out_specs += (_spec((1, RC, W, 8, 128), "codes"),)
        out_shape.append(
            jax.ShapeDtypeStruct(
                (n_panes, L1, W, 8, 128), jnp.int32, vma=out_vma
            )
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            _spec(s1_block, "s1"),
            _spec((1, L2, 8, 128), "rows"),
            _spec((1, 8, 128), "pane"),
            _spec((1, 8, 128), "pane"),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((L2, 8, 128), jnp.int32)] * 6,
    )
    kernel = functools.partial(
        _rowscan_body, L1=L1, L2=L2, is_local=is_local, RC=RC, kimura=kim
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(scalars, s1p, s2p, mp, np_)
    if emit_dirs:
        fin, bv, bi, codes = outs
        # (panes, L1, W, 8, 128) -> (B, L1, W) in batch order.
        codes = jnp.transpose(codes, (0, 3, 4, 1, 2)).reshape(
            Bp, L1, W
        )[:B]
    else:
        fin, bv, bi = outs

    # (panes, L2, 8, 128) -> (L2, B): reduce over columns in XLA.
    def flat(x):
        return jnp.transpose(x, (1, 0, 2, 3)).reshape(L2, Bp)[:, :B]

    ms = jnp.asarray(ms, jnp.int32)
    ns = jnp.asarray(ns, jnp.int32)
    if is_local:
        bvf = flat(bv)
        bif = flat(bi)
        jcol = 1 + jnp.arange(L2, dtype=jnp.int32)[:, None]
        vmax = jnp.max(bvf, axis=0)
        # Tie-break: larger i, then larger j (last row-major).
        i_best = jnp.max(jnp.where(bvf == vmax, bif, -1), axis=0)
        j_best = jnp.max(
            jnp.where((bvf == vmax) & (bif == i_best), jcol, -1), axis=0
        )
        # All-cells max can be 0 with an empty alignment at (m, n)
        # (reference scans boundaries too; see kernel notes).
        empty = vmax <= 0
        out = (
            jnp.maximum(vmax, 0),
            jnp.where(empty, ms, i_best),
            jnp.where(empty, ns, j_best),
        )
        return out + (codes,) if emit_dirs else out
    finf = flat(fin)
    out = (jnp.max(finf, axis=0), ms, ns)
    return out + (codes,) if emit_dirs else out
