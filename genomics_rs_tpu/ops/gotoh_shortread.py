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
from genomics_rs_tpu.ops.gotoh_scan import INT_MIN, NEG_INF

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
    rI,  # scratch (L2, 8, 128): previous row I
    rS,
    rD,
    fin_s,  # scratch (L2, 8, 128)
    bv_s,
    bi_s,
    *,
    L1: int,
    L2: int,
    is_local: bool,
):
    sm = scalars[0]
    sx = scalars[1]
    gg = scalars[2]
    hh = scalars[3]
    hg = hh + gg
    neg = jnp.int32(NEG_INF)
    int_min = jnp.int32(INT_MIN)
    zero_lane = jnp.int32(0) if is_local else neg

    mv = m_ref[0]  # (8, 128)
    nv = n_ref[0]
    s2v = s2_ref[0]  # (L2, 8, 128)

    # Column index per row-position: jrow[j] = j + 1 (cols are 1..L2).
    jrow = 1 + jax.lax.broadcasted_iota(jnp.int32, (L2, 8, 128), 0)

    # Row 0: I(0, j) = h + j*g, S = D = -inf (j >= 1).
    rI[:] = hh + jrow * gg
    rS[:] = jnp.full((L2, 8, 128), neg, dtype=jnp.int32)
    rD[:] = jnp.full((L2, 8, 128), neg, dtype=jnp.int32)
    # bv/bi are only consumed in local mode, but the final stores run
    # unconditionally — initialize always so the outputs are never
    # uninitialized VMEM.
    fin_s[:] = jnp.full((L2, 8, 128), int_min, dtype=jnp.int32)
    bv_s[:] = jnp.full((L2, 8, 128), int_min, dtype=jnp.int32)
    bi_s[:] = jnp.zeros((L2, 8, 128), dtype=jnp.int32)

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
        s1c = s1_ref[0, i - 1]  # (8, 128)
        sub = jnp.where(s1c == s2v, sm, sx)
        Sn = sub + jnp.maximum(Mp_sh, zero_lane)

        # I(i, j) = max(I(i, j-1) + g, max(S, D)(i, j-1) + h + g [,0]):
        # a (max, +) prefix over j. Seed v[j] with the non-I sources
        # shifted into place; col 0 contributes only -inf (I bound).
        N = jnp.maximum(jnp.maximum(Sn, Dn) + hg, zero_lane)
        x = shift_row(N, neg)
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

        rI[:] = In
        rS[:] = Sn
        rD[:] = Dn
        return 0

    jax.lax.fori_loop(1, L1 + 1, row_body, 0)
    fin_ref[0] = fin_s[:]
    bv_ref[0] = bv_s[:]
    bi_ref[0] = bi_s[:]


@functools.partial(jax.jit, static_argnames=("is_local", "interpret"))
def gotoh_scores_shortread(
    s1b: jax.Array,
    s2b: jax.Array,
    ms: jax.Array,
    ns: jax.Array,
    scores: Scores,
    is_local: bool,
    interpret: bool = False,
):
    """Score B short pairs, 1024 per kernel pane.

    s1b (B, L1), s2b (B, L2) uint8 (padded; pad bytes of the two sides
    must differ); ms/ns true lengths (>= 1; degenerate empty sequences
    are the caller's edge case). Returns (score, start_i, start_j)
    arrays of shape (B,).
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

    s1p = to_panes(s1b, 0xFE)
    s2p = to_panes(s2b, 0xFF)
    mp = to_panes(ms, 1)
    np_ = to_panes(ns, 1)

    scalars = jnp.stack(
        [
            jnp.int32(scores.s_match),
            jnp.int32(scores.s_mismatch),
            jnp.int32(scores.g),
            jnp.int32(scores.h),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
        ]
    )

    pane_in = pl.BlockSpec(
        (1, 8, 128), lambda p, s: (p, 0, 0), memory_space=pltpu.VMEM
    )
    row_out = pl.BlockSpec(
        (1, L2, 8, 128), lambda p, s: (p, 0, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_panes,),
        in_specs=[
            pl.BlockSpec(
                (1, L1, 8, 128),
                lambda p, s: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, L2, 8, 128),
                lambda p, s: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pane_in,
            pane_in,
        ],
        out_specs=(row_out,) * 3,
        scratch_shapes=[pltpu.VMEM((L2, 8, 128), jnp.int32)] * 6,
    )
    kernel = functools.partial(
        _rowscan_body, L1=L1, L2=L2, is_local=is_local
    )
    fin, bv, bi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((n_panes, L2, 8, 128), jnp.int32)] * 3
        ),
        interpret=interpret,
    )(scalars, s1p, s2p, mp, np_)

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
        return (
            jnp.maximum(vmax, 0),
            jnp.where(empty, ms, i_best),
            jnp.where(empty, ns, j_best),
        )
    finf = flat(fin)
    return jnp.max(finf, axis=0), ms, ns
