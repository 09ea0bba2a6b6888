"""Parity of the Mosaic traceback walker vs the XLA while_loop walker.

``ops/traceback_pallas.walk_full`` must chase packed direction words
with exactly ``walk_block``'s semantics (reference retrace movement
rules, ``algo.rs:339-421``): same move codes, same final cell, same
done/exit classification — including when the walk crosses DMA-window
boundaries and when its per-call move buffer fills and the host loop
resumes.  Interpret mode on CPU; the hardware gate re-checks the
compiled kernel on the chip (``bench.py --smoke``).
"""

import numpy as np
import pytest

import jax

from genomics_rs_tpu.ops.traceback_device import device_walk, walk_block
from genomics_rs_tpu.ops.traceback_pallas import (
    MPW,
    unpack_moves,
    walk_full,
)


def _pack(codes2d: np.ndarray) -> jax.Array:
    """Pack per-cell 2-bit codes[k, lane] into int32 words[k//16, lane]."""
    K, V = codes2d.shape
    KW = K // 16
    packed = np.zeros((KW, V), dtype=np.int64)
    for t in range(16):
        packed |= codes2d[t::16][:KW].astype(np.int64) << (2 * t)
    return jax.numpy.asarray(packed.astype(np.uint32).view(np.int32))


def _ref_walk(dirs, start_li, start_j, i0, max_steps=4096):
    moves, count, i_f, j_f, done = walk_block(
        dirs,
        np.int32(start_li),
        np.int32(start_j),
        np.int32(i0),
        max_steps=max_steps,
    )
    count = int(count)
    return (
        np.asarray(moves)[:count],
        int(i_f),
        int(j_f),
        bool(done),
    )


def test_short_walks_parity():
    rng = np.random.default_rng(0)
    for trial in range(4):
        V = 256
        KW = 48  # >= PKW (34): smaller blocks route to the XLA walker
        dirs = jax.numpy.asarray(
            rng.integers(0, 2**31, size=(KW, V), dtype=np.int32)
        )
        start_li = int(rng.integers(1, V - 1))
        start_j = int(rng.integers(1, KW * 16 - start_li - 1))
        i0 = int(rng.integers(0, 3))
        ref_codes, ri, rj, rdone = _ref_walk(dirs, start_li, start_j, i0)
        codes, i_f, j_f, done = walk_full(
            dirs, start_li, start_j, i0, max_steps=4096, interpret=True
        )
        assert np.array_equal(codes, ref_codes)
        assert (int(i_f), int(j_f), bool(done)) == (ri, rj, rdone)


def test_long_walk_crosses_windows_and_resumes_buffer():
    # Stop-free codes force a long chase: it leaves the initial
    # (18-kword, 256-lane) DMA window several times, and
    # max_steps=128 (not a multiple of a full window) forces
    # walk_full's host resume loop with partial packed words.
    rng = np.random.default_rng(1)
    V, KW = 256, 64
    codes2 = rng.integers(0, 3, size=(KW * 16, V), dtype=np.int64)
    dirs = _pack(codes2)
    start_li, start_j, i0 = 254, 700, 3
    ref_codes, ri, rj, rdone = _ref_walk(dirs, start_li, start_j, i0)
    assert len(ref_codes) > 300  # genuinely long
    codes, i_f, j_f, done = walk_full(
        dirs, start_li, start_j, i0, max_steps=128, interpret=True
    )
    assert np.array_equal(codes, ref_codes)
    assert (int(i_f), int(j_f), bool(done)) == (ri, rj, rdone)
    assert not done  # exited the block upward
    assert int(i_f) == i0 - 1


def test_unpack_moves_partial_word():
    words = np.array(
        [0b11_10_01_00_11_10_01_00 | (3 << 30)], np.uint32
    ).view(np.int32)
    codes = unpack_moves(words, 5)
    assert codes.tolist() == [0, 1, 2, 3, 0]
    assert codes.dtype == np.uint8
    assert len(unpack_moves(words, MPW)) == MPW


def test_device_walk_dispatch_resumes_on_cpu():
    # On the CPU backend device_walk routes to walk_block but must
    # still transparently resume a filled move buffer.
    rng = np.random.default_rng(2)
    V, KW = 256, 64
    codes2 = rng.integers(0, 3, size=(KW * 16, V), dtype=np.int64)
    dirs = _pack(codes2)
    start_li, start_j, i0 = 254, 700, 3
    ref_codes, ri, rj, rdone = _ref_walk(dirs, start_li, start_j, i0)
    codes, i_f, j_f, done = device_walk(
        dirs, start_li, start_j, i0, max_steps=64
    )
    assert np.array_equal(codes, ref_codes)
    assert (int(i_f), int(j_f), bool(done)) == (ri, rj, rdone)


def test_walk_pallas_rejects_oversized_buffer():
    from genomics_rs_tpu.ops.traceback_pallas import (
        MAX_STEPS_CAP,
        walk_pallas,
    )

    dirs = jax.numpy.zeros((16, 256), np.int32)
    with pytest.raises(ValueError, match="walk_full"):
        walk_pallas(dirs, 0, 0, 0, max_steps=MAX_STEPS_CAP + 16)


def test_walk_pallas_rejects_small_word_count():
    """Fewer packed words than the DMA window would clamp the window
    base negative and read out of bounds — must raise instead (the
    device_walk dispatcher routes such blocks to the XLA walker)."""
    from genomics_rs_tpu.ops.traceback_pallas import PKW, walk_pallas

    dirs = jax.numpy.zeros((PKW - 1, 1024), np.int32)
    with pytest.raises(ValueError, match="word count"):
        walk_pallas(dirs, 0, 0, 0, max_steps=1024, interpret=True)


def test_resume_walk_raises_on_no_progress_with_moves():
    """A stuck cell that keeps EMITTING moves without moving the
    position must raise, not refill the buffer forever (the old guard
    only fired when zero moves were written)."""
    from genomics_rs_tpu.ops.traceback_device import resume_walk

    def stuck_step(li, j):
        # Buffer "filled" with moves, position unchanged, not done.
        return np.full(8, 2, np.uint8), 5, 7, False

    with pytest.raises(RuntimeError, match="no progress"):
        resume_walk(stuck_step, start_li=5, start_j=7, i0=0)
