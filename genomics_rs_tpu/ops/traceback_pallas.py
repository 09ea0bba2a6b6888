"""Pallas traceback walker: the move chase as a hardware loop.

The XLA ``while_loop`` walker (``ops/traceback_device.walk_block``)
costs ~2.4 us per move — each single-word gather/scatter round-trips
through the XLA scalar path with per-op dispatch overhead, so a 30 kb
retrace (~30k moves) takes longer than its own 894M-cell fill. This
kernel runs the identical chase (reference semantics: per-axis
saturation, stop codes, block-exit detection — ``algo.rs:339-421``)
as a Mosaic hardware loop:

* the packed direction words stay in HBM (``ANY`` memory space); a
  ~18 KB window around the walk head is DMA'd into SMEM whenever the
  head leaves the previous window (every <= 128 moves, since a move
  decreases the lane by at most 1 and the window holds 256 lanes);
* per move: one scalar SMEM load (SMEM, unlike VMEM, allows fully
  dynamic scalar indexing), 2-bit decode, and scalar state updates —
  all scalar-core ops with no vector unit involvement;
* move codes accumulate 16-to-a-word in a register and flush with one
  row store per 16 moves, so the output traffic is 2 bits/move.

``walk_pallas`` mirrors ``walk_block``'s contract but returns the
moves PACKED (16 x 2-bit codes per int32 word; ``unpack_moves``
decodes on host). ``walk_full`` loops it until the path terminates or
leaves the block, for callers whose paths may exceed one call's
buffer.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genomics_rs_tpu.ops.gotoh_scan import DIR_DEL, DIR_INS, DIR_STOP

#: lanes per DMA window (two 128-lane groups: the head's group and
#: the one below, so a fresh window always has >= 128 moves of
#: downward room — except near lane 0, where the walk exits anyway).
LW = 256
#: kwords per DMA window. 16 words (+head+slack) guarantee >= 128
#: moves of downward room; a v5e sweep of 10/18/34/66 over a 30 kb
#: walk measured 1277/1143/1024/1086 ns/move — the chase is bound by
#: the dependent load->decode->update chain per move (each move's
#: word address depends on the previous move), not the window DMA,
#: so a bigger window only trims the residual refresh cost. 34 is
#: the measured optimum; blocks with fewer words route to the XLA
#: walker (device_walk).
PKW = 34
#: moves per packed output word (matches the dirs PACK).
MPW = 16
#: hard cap on one call's move buffer (VMEM: cap/16 x 128 x 4 B).
MAX_STEPS_CAP = 65536
#: dependent moves per inner-loop iteration. The scalar-core chase is
#: dominated by while-loop iteration overhead, not the ~15 ops per
#: move — freeze-masked unrolling (walk_block's trick) amortizes it.
#: Env knob for hardware sweeps.
import os as _os

WALK_UNROLL = int(_os.environ.get("GENOMICS_TPU_MOSAIC_WALK_UNROLL", "8"))


def _run_chase(
    dirs_ref,
    patch_ref,
    sem,
    words_store,  # fn(word_row, acc): flush one packed move word
    start_li,
    start_j,
    i0,
    j0,
    koff,  # word-row offset of this chase's bitmap in dirs_ref
    KW: int,
    VG: int,
    max_steps: int,
    allow_exits: bool,
    loff=None,  # lane offset of this chase's bitmap (group-stacked)
):
    """The shared windowed move chase (reference retrace semantics).

    Both walker kernels wrap this one body: the single-walk kernel
    with traced ``i0``/``j0`` and exits enabled (windowed refills can
    leave the block upward or left), the batched ``walk_many`` kernel
    with ``i0 = j0 = 0``, per-walk ``koff`` into the global stream
    array, and exits statically impossible. ``kb`` stays in SEGMENT
    word coordinates; only the DMA read offsets by ``koff``. ``loff``
    (group-stacked bitmaps, ``gotoh_matrix_stream``: lane = loff + i)
    likewise offsets only the DMA lane addressing — the chase state
    stays in segment-local rows. Returns the final (li, j, pos, done,
    exited, acc) state.
    """
    if loff is None:
        loff = jnp.int32(0)

    def outer_cond(st):
        li, j, pos, done, exited, acc = st
        return (done == 0) & (exited == 0) & (pos < max_steps)

    def outer_body(st):
        li, j, pos, done, exited, acc = st
        k0 = li + j
        kb = jnp.maximum(k0 // 16 - (PKW - 2), 0)
        kb = jnp.minimum(kb, KW - PKW)
        lbi = jnp.maximum((loff + li) // 128 - 1, 0)
        lbi = jnp.minimum(lbi, VG - 2)
        dma = pltpu.make_async_copy(
            dirs_ref.at[pl.ds(koff + kb, PKW), pl.ds(lbi, 2), :],
            patch_ref,
            sem,
        )
        dma.start()
        dma.wait()
        lb = lbi * 128

        def in_cond(st2):
            li, j, pos, done, exited, acc = st2
            k = li + j
            return (
                (done == 0)
                & (exited == 0)
                & (pos < max_steps)
                & (loff + li >= lb)
                & (k // 16 >= kb)
            )

        def in_sub(st2):
            li, j, pos, done, exited, acc = st2
            k = li + j
            # Freeze-masked substep (walk_block's unroll trick): once
            # any halt condition holds, later unrolled substeps are
            # identity — reads continue with clamped (valid) indices.
            halted = (
                (done != 0)
                | (exited != 0)
                | (pos >= max_steps)
                | (loff + li < lb)
                | ((k >> 4) < kb)
            )
            # All divisors are powers of two: explicit shift/mask
            # spellings — the scalar core's integer divide is
            # many-cycle and this chain is the whole kernel.
            lane = jnp.clip(loff + li - lb, 0, 2 * 128 - 1)
            row = jnp.clip((k >> 4) - kb, 0, PKW - 1)
            word = patch_ref[row, lane >> 7, lane & 127]
            code = (word >> (2 * (k & 15))) & 3
            ig = i0 + li
            is_stop = code == DIR_STOP
            di = jnp.where(code == DIR_INS, 0, 1)
            dj = jnp.where(code == DIR_DEL, 0, 1)
            # Reference saturation: each axis floors at 0 independently.
            ig_new = jnp.maximum(ig - di, 0)
            j_new = jnp.maximum(j - dj, 0)

            write = (~halted) & (~is_stop)
            sp = pos & (MPW - 1)
            acc = jnp.where(
                write,
                jnp.where(sp == 0, 0, acc) | (code << (2 * sp)),
                acc,
            )

            @pl.when(write & (sp == MPW - 1))
            def _flush():
                words_store(pos >> 4, acc)

            pos = jnp.where(write, pos + 1, pos)
            done_now = (~halted) & (
                is_stop | ((ig_new == 0) & (j_new == 0) & (j0 == 0))
            )
            done = jnp.where(done_now, 1, done)
            if allow_exits:
                live = (~halted) & (done == 0)
                ex_up = live & (ig_new < i0)
                ex_left = live & (~ex_up) & (j_new == 0) & (j0 > 0)
                exited = jnp.where(
                    ex_up, 1, jnp.where(ex_left, 2, exited)
                )
            # Position updates on every non-halted substep (stop codes
            # included) — matching walk_block exactly; after a stop
            # done=1 makes the final cell unused upstream.
            return (
                jnp.where(halted, li, jnp.maximum(ig_new - i0, 0)),
                jnp.where(halted, j, j_new),
                pos,
                done,
                exited,
                acc,
            )

        def in_body(st2):
            for _ in range(WALK_UNROLL):
                st2 = in_sub(st2)
            return st2

        return jax.lax.while_loop(in_cond, in_body, st)

    init = (
        start_li,
        start_j,
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
    )
    return jax.lax.while_loop(outer_cond, outer_body, init)


def _kernel_walk(
    scalars,  # SMEM int32[4]: start_li, start_j, i0, j0
    dirs_ref,  # ANY (KW, V/128, 128): packed direction words (HBM)
    words_ref,  # VMEM (NW, 128): packed move codes (column 0)
    meta_ref,  # VMEM (8, 128): pos, li, j, done, exited (column 0)
    patch_ref,  # SMEM (PKW, 2, 128) scratch: DMA'd window
    sem,  # DMA semaphore
    *,
    KW: int,
    VG: int,  # lane groups (V / 128)
    max_steps: int,
):
    # j0: global column of bitmap column 0 (windowed refill; 0 = full
    # width). Columns are window-local; landing on local column 0
    # with j0 > 0 is a LEFT exit (code 2), not the global origin.
    def words_store(w, acc):
        words_ref[pl.ds(w, 1)] = jnp.full((1, 128), acc, jnp.int32)

    li, j, pos, done, exited, acc = _run_chase(
        dirs_ref,
        patch_ref,
        sem,
        words_store,
        scalars[0],
        scalars[1],
        scalars[2],
        scalars[3],
        jnp.int32(0),
        KW=KW,
        VG=VG,
        max_steps=max_steps,
        allow_exits=True,
    )

    # A partial final word still lands.
    @pl.when(pos % MPW != 0)
    def _flush_partial():
        words_ref[pl.ds(pos // MPW, 1)] = jnp.full(
            (1, 128), acc, dtype=jnp.int32
        )

    for row, val in enumerate((pos, li, j, done, exited)):
        meta_ref[pl.ds(row, 1)] = jnp.full(
            (1, 128), val, dtype=jnp.int32
        )


@functools.partial(jax.jit, static_argnames=("max_steps", "interpret"))
def walk_pallas(
    dirs: jax.Array,
    start_li: jax.Array,
    start_j: jax.Array,
    i0: jax.Array,
    max_steps: int,
    interpret: bool = False,
    j0: jax.Array = 0,
):
    """``walk_block`` semantics with PACKED move output.

    Returns ``(words int32[ceil(max_steps/16)], count, i_final,
    j_final, done)`` — decode the first ``count`` codes with
    :func:`unpack_moves`. ``done`` False with ``exited`` implied by
    ``i_final == i0 - 1`` means the walk left the block upward; a
    not-done, not-exited return means the buffer filled (resume from
    ``(i_final, j_final)`` — see :func:`walk_full`).
    """
    if max_steps > MAX_STEPS_CAP:
        raise ValueError(
            f"max_steps {max_steps} > {MAX_STEPS_CAP}; loop walk_full"
        )
    KW, V = dirs.shape
    if V % 128 or V < 256:
        # The DMA window spans two 128-lane groups; every fill kernel
        # emits V >= 1024 (gotoh_pallas.py:76), so this only guards
        # hand-built inputs.
        raise ValueError(f"dirs lane count {V} not a multiple of 128 >= 256")
    if KW < PKW:
        # The DMA base is clamped to KW - PKW; fewer words than the
        # window would read out of bounds. device_walk routes such
        # tiny blocks to the XLA walker instead.
        raise ValueError(f"dirs word count {KW} < DMA window {PKW}")
    VG = V // 128
    NW = -(-max_steps // MPW)
    i0 = jnp.asarray(i0, jnp.int32)
    dirs3 = dirs.reshape(KW, VG, 128)
    scalars = jnp.stack(
        [
            jnp.asarray(start_li, jnp.int32),
            jnp.asarray(start_j, jnp.int32),
            i0,
            jnp.asarray(j0, jnp.int32),
        ]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(
                (NW, 128), lambda g, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, 128), lambda g, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.SMEM((PKW, 2, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel_walk, KW=KW, VG=VG, max_steps=max_steps
    )
    words, meta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((NW, 128), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(scalars, dirs3)
    pos = meta[0, 0]
    li = meta[1, 0]
    j = meta[2, 0]
    done = meta[3, 0] != 0
    # exited: 1 = upward (li clamped, true row i0 - 1), 2 = left
    # (still in the block at row i0 + li).
    i_final = jnp.where(meta[4, 0] == 1, i0 - 1, i0 + li)
    return words[:, 0], pos, i_final, j, done


def _kernel_walk_many(
    scalars,  # SMEM int32 (W, 4): start_li, start_j, koff, loff
    dirs_ref,  # ANY (KW_total, V/128, 128): the GLOBAL stream words
    words_ref,  # VMEM (1, NW, 128) out block: this walk's packed moves
    meta_ref,  # VMEM (1, 8, 128) out block: pos, li, j, done, exited
    patch_ref,  # SMEM (PKW, 2, 128) scratch: DMA'd window
    sem,  # DMA semaphore
    *,
    KW: int,  # per-segment word count (kb clamp range)
    VG: int,
    max_steps: int,
):
    g = pl.program_id(0)

    # kb stays in SEGMENT word coords; the global read offsets by
    # koff (in-bounds for the global array — wrapper's proof). With
    # i0 = j0 = 0 over a full-width bitmap, upward/left exits are
    # statically impossible.
    def words_store(w, acc):
        words_ref[0, pl.ds(w, 1)] = jnp.full((1, 128), acc, jnp.int32)

    li, j, pos, done, exited, acc = _run_chase(
        dirs_ref,
        patch_ref,
        sem,
        words_store,
        scalars[g, 0],
        scalars[g, 1],
        jnp.int32(0),
        jnp.int32(0),
        scalars[g, 2],
        KW=KW,
        VG=VG,
        max_steps=max_steps,
        allow_exits=False,
        loff=scalars[g, 3],
    )

    @pl.when(pos % MPW != 0)
    def _flush_partial():
        words_ref[0, pl.ds(pos // MPW, 1)] = jnp.full(
            (1, 128), acc, dtype=jnp.int32
        )

    for row, val in enumerate((pos, li, j, done, exited)):
        meta_ref[0, pl.ds(row, 1)] = jnp.full(
            (1, 128), val, dtype=jnp.int32
        )


@functools.partial(
    jax.jit, static_argnames=("KW", "max_steps", "interpret")
)
def walk_many(
    dirs: jax.Array,
    start_li: jax.Array,
    start_j: jax.Array,
    koffs: jax.Array,
    KW: int,
    max_steps: int,
    interpret: bool = False,
    loffs: jax.Array | None = None,
):
    """Chase W independent full-bitmap walks in ONE kernel dispatch.

    The per-call fixed cost of a device walk is the dispatch + sync
    round trip (~26 ms through this environment's tunnel; the 30 kb
    chase itself is ~2 ms) — a batch of segment walks (align_batch,
    the MSA star stage) pays it once here instead of per pair. Walk
    ``w`` runs ``_kernel_walk``'s exact chase over the word rows
    ``[koffs[w], koffs[w] + KW)`` of the GLOBAL packed array (the
    streamed fill's layout: per-segment diag16 views at PACK-aligned
    offsets — no per-segment slice copies), from segment-local
    ``(start_li[w], start_j[w])`` to the segment origin (i0 = j0 = 0;
    full-width bitmaps only, so upward/left exits cannot occur).
    ``loffs`` (optional, default 0): per-walk LANE offsets for
    group-stacked bitmaps (``gotoh_matrix_stream``: segment row i
    lives at lane ``loffs[w] + i``).

    Returns ``(words (W, NW), counts (W,), i_f (W,), j_f (W,),
    done (W,))``; decode walk w with ``unpack_moves(words[w],
    counts[w])``. ``max_steps`` must cover the longest possible path
    (the wrapper's callers guarantee ``m + n + 1 <= max_steps``), so
    a False ``done`` is a corrupt-bitmap bug, not a resume request.
    """
    if max_steps > MAX_STEPS_CAP:
        raise ValueError(
            f"max_steps {max_steps} > {MAX_STEPS_CAP}; use walk_full"
        )
    KW_total, V = dirs.shape
    if V % 128 or V < 256:
        raise ValueError(f"dirs lane count {V} not a multiple of 128 >= 256")
    if KW < PKW:
        raise ValueError(f"segment word count {KW} < DMA window {PKW}")
    VG = V // 128
    NW = -(-max_steps // MPW)
    W = start_li.shape[0]
    dirs3 = dirs.reshape(KW_total, VG, 128)
    scalars = jnp.stack(
        [
            jnp.asarray(start_li, jnp.int32),
            jnp.asarray(start_j, jnp.int32),
            jnp.asarray(koffs, jnp.int32),
            (
                jnp.zeros(W, jnp.int32)
                if loffs is None
                else jnp.asarray(loffs, jnp.int32)
            ),
        ],
        axis=1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(
                (1, NW, 128),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 128),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.SMEM((PKW, 2, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel_walk_many, KW=KW, VG=VG, max_steps=max_steps
    )
    words, meta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((W, NW, 128), jnp.int32),
            jax.ShapeDtypeStruct((W, 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(scalars, dirs3)
    return (
        words[:, :, 0],
        meta[:, 0, 0],
        meta[:, 1, 0],
        meta[:, 2, 0],
        meta[:, 3, 0] != 0,
    )


def unpack_moves(words: np.ndarray, count: int) -> np.ndarray:
    """Decode ``count`` 2-bit move codes from packed words (host)."""
    words = np.asarray(words).astype(np.uint32)
    t = np.arange(MPW, dtype=np.uint32)
    codes = (words[:, None] >> (2 * t)[None, :]) & 3
    return codes.reshape(-1).astype(np.uint8)[:count]


def walk_full(
    dirs: jax.Array,
    start_li: int,
    start_j: int,
    i0: int,
    max_steps: int,
    interpret: bool = False,
    j0: int = 0,
):
    """Loop :func:`walk_pallas` until the path terminates or exits the
    block, concatenating the decoded codes on host.

    Returns ``(codes uint8[count], i_final, j_final, done)`` with the
    same meaning as one ``walk_block`` call that never fills its
    buffer. ``j0``: see ``traceback_device.device_walk`` (windowed
    bitmaps; a left exit returns j_final == 0, i_final >= i0).
    """
    from genomics_rs_tpu.ops.traceback_device import resume_walk

    cap = min(max_steps, MAX_STEPS_CAP)

    def step(li, j):
        out = walk_pallas(
            dirs,
            np.int32(li),
            np.int32(j),
            np.int32(i0),
            max_steps=cap,
            interpret=interpret,
            j0=np.int32(j0),
        )
        # One D2H transfer for the whole result tuple: per-array
        # syncs each pay a full host round-trip (expensive over the
        # axon tunnel, non-free everywhere).
        words, count, i_f, j_f, done = jax.device_get(out)
        return unpack_moves(words, int(count)), i_f, j_f, done

    return resume_walk(
        step, start_li, start_j, int(i0), windowed=int(j0) > 0
    )
