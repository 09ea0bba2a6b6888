"""Benchmark + hardware gate for the TPU Gotoh engines.

Modes
-----
``python bench.py``            headline metric (driver contract: ONE
                               JSON line) with roofline accounting;
                               embeds rows from BENCH_FULL.json when a
                               prior ``--full`` run produced one.
``python bench.py --full``     measure the full metric set (batch
                               score, with-dirs single pair, shortread,
                               blocked batch, checkpointed 155 kb,
                               seq-parallel 1-dev mesh, compare
                               wall-clock) and write BENCH_FULL.json.
``python bench.py --smoke``    REAL-HARDWARE smoke gate: every Pallas
                               kernel runs non-interpreted on the chip
                               on small inputs and is checked against
                               the C++ oracle (native/gotoh_cpu.cpp);
                               exits nonzero on any mismatch. Run
                               before every kernel/perf commit.

Baseline: the reference publishes no numbers and the Rust toolchain is
not in this image, so the baseline is the measured throughput of
``native/gotoh_cpu.cpp`` — the same recurrence, same i64 math,
-O2 -march=native, single-threaded like the reference's align path,
score-only rolling rows (memory-lean, i.e. *favorable* to the
baseline: the real reference writes 48 B/cell).

Roofline model (printed with the headline): the score-only batch
kernel executes ~``OPS_PER_LANE_STEP`` int32 VPU ALU ops per lane per
anti-diagonal step over a V-lane vector for Kp steps, so
utilization = cells/s * (V*Kp / true cells) * ops / VPU_PEAK, with
VPU_PEAK = 8 sublanes * 128 lanes * 4 ALUs * clock (v5e ~0.94 GHz)
= ~3.85e12 int32 op/s. The ramp factor V*Kp/(m*n) is ~2.05 for square
pairs — inherent to anti-diagonal sweeps of a full rectangle.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

REF = "/root/reference"
SCORE_ARGS = dict(s_match=1, s_mismatch=-2, g=-1, h=-5)

#: int32 VPU ALU ops per lane-step of the streamed multi-segment
#: score kernel (_kernel_stream, global mode): 3 flat shifts x 2 +
#: I(3) + D(3) + sub/S(3) + boundary selects(5: col-0 I/S/D + row-0
#: Q/D only, topQ is scalar) + seam-lane compare(1: the per-lane
#: column counter collapsed to one compare against the streamed
#: k-mod-L1 scalar) + s1 seam swap(1) + Q/carries(3). The probe runs
#: under a scalar pl.when (one step per segment) and no longer costs
#: hot-path vector ops.
OPS_PER_LANE_STEP = 25
#: VMEM scratch pane accesses per unroll block: 7 pane loads (s2j, I,
#: P, D, Q, shM, s1cur — no counter pane) + 7 pane stores, amortized over the
#: stream kernel's configured UNROLL (one load/store set per UNROLL
#: diagonals — 0.25 slots/step at the default 64). Computed from the
#: live module constant so env-var sweeps keep the roofline honest.
#: The predecessor flat kernel was measured issue-slot bound (a 1.6x
#: ALU cut left throughput unchanged), so the roofline is reported
#: both ALU-only and total-slot.
PANE_ACCESSES_PER_UNROLL_BLOCK = 14


def _mem_slots_per_lane_step() -> float:
    from genomics_rs_tpu.ops.gotoh_stream import UNROLL as STREAM_UNROLL

    return PANE_ACCESSES_PER_UNROLL_BLOCK / STREAM_UNROLL
#: v5e VPU peak int32 issue slots/s: 8 * 128 * 4 ALUs * 0.94 GHz.
VPU_PEAK = 8 * 128 * 4 * 0.94e9


def _retry(fn, attempts=5, label="warmup"):
    """The remote-compile helper in this environment fails transiently
    (HTTP 500 bursts); retry before giving up."""
    for attempt in range(attempts - 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            print(
                f"{label} attempt {attempt} failed: {str(e)[:200]}",
                file=sys.stderr,
            )
            time.sleep(30)
    return fn()


def _load_corpus():
    from genomics_rs_tpu.sequence import SequenceContainer

    container = SequenceContainer()
    cmp_dir = os.path.join(REF, "comparison_data")
    try:
        for fname in sorted(os.listdir(cmp_dir)):
            if fname.endswith(".fasta"):
                container.from_fasta(os.path.join(cmp_dir, fname))
    except OSError:
        pass
    if len(container.sequences) < 2:
        from genomics_rs_tpu.sequence import Sequence

        rng = np.random.default_rng(0)
        container.sequences = [
            Sequence(f"s{k}", "".join(rng.choice(list("ACGT"), 29900)))
            for k in range(10)
        ]
    return container


def _encode_corpus(container, pad=128):
    from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, round_up

    seqs = container.sequences
    L = max(round_up(max(len(s) for s in seqs), pad), pad)
    enc1 = np.stack([s.encoded(pad_to=L, pad_value=PAD_S1) for s in seqs])
    enc2 = np.stack([s.encoded(pad_to=L, pad_value=PAD_S2) for s in seqs])
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    return enc1, enc2, lens


def _cpu_baseline(enc1, enc2, lens) -> float:
    """Median-of-3 reference-equivalent CPU throughput (cells/s)."""
    try:
        from genomics_rs_tpu.suffixtree.native import gotoh_score_cpu

        a = bytes(enc1[0][: lens[0]])
        b = bytes(enc2[1][: lens[1]])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            gotoh_score_cpu(a, b, 1, -2, -1, -5, False)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        return (len(a) + 1) * (len(b) + 1) / dt
    except Exception:
        # Conservative (high) estimate => understates our speedup.
        return 5e8


def _median_time(fn, reps=3):
    """Amortized per-call time over ``reps`` back-to-back calls.

    The axon tunnel's dispatch is deeply asynchronous: timing single
    calls (even with ``block_until_ready``) under-reports ms-scale
    kernels by >100x. ``fn`` must force a host transfer of its result;
    the amortized loop makes the pipeline drain visible in the total.
    """
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def _roofline(
    cells_per_s: float, Lm: int, Ln: int, P: int, cells: float
) -> dict:
    """ops/cell + fraction of VPU peak for the stream kernel plan.

    The stream kernel's ramp factor (V*Kp / true cells) is ~1.1 for a
    full-length batch — the per-pair anti-diagonal ramp (2.05x for the
    flat batch kernel) is amortized across the whole segment stream.
    """
    from genomics_rs_tpu.ops.gotoh_stream import _plan_stream

    V, _, _, _, Kp = _plan_stream(Lm, Ln, P)
    lane_steps_per_cell = V * Kp / cells
    ops_per_cell = lane_steps_per_cell * OPS_PER_LANE_STEP
    ops_per_s = cells_per_s * ops_per_cell
    slots_per_s = cells_per_s * lane_steps_per_cell * (
        OPS_PER_LANE_STEP + _mem_slots_per_lane_step()
    )
    return {
        "ramp_factor": round(lane_steps_per_cell, 3),
        "alu_ops_per_cell": round(ops_per_cell, 1),
        "alu_ops_per_s": ops_per_s,
        "vpu_peak_ops_per_s": VPU_PEAK,
        "pct_of_vpu_peak_alu": round(100 * ops_per_s / VPU_PEAK, 1),
        "pct_of_vpu_peak_slots": round(100 * slots_per_s / VPU_PEAK, 1),
    }


def run_headline() -> dict:
    import jax

    from genomics_rs_tpu.config import Scores

    scores = Scores(**SCORE_ARGS)
    container = _load_corpus()
    enc1, enc2, lens = _encode_corpus(container)
    num = len(lens)
    pairs = [(i, j) for j in range(num) for i in range(num) if i <= j]
    on_tpu = jax.default_backend() == "tpu"

    s1b = np.stack([enc1[i] for i, _ in pairs])
    s2b = np.stack([enc2[j] for _, j in pairs])
    ms = np.array([lens[i] for i, _ in pairs], dtype=np.int32)
    ns = np.array([lens[j] for _, j in pairs], dtype=np.int32)
    if not on_tpu:
        # No TPU: truncate hard so the scan engine finishes.
        s1b, s2b = s1b[:3, :1024], s2b[:3, :1024]
        ms = np.minimum(ms[:3], 1000)
        ns = np.minimum(ns[:3], 1000)
    cells = float(np.sum((ms + 1.0) * (ns + 1.0)))
    # Device-resident inputs: re-uploading ~3.4 MB through this
    # environment's tunnel per call adds 200-600 ms of pure transfer
    # noise; the metric is chip throughput, not tunnel bandwidth.
    s1b, s2b, ms, ns = (
        jax.device_put(s1b),
        jax.device_put(s2b),
        jax.device_put(ms),
        jax.device_put(ns),
    )

    if on_tpu:
        from genomics_rs_tpu.ops.gotoh_stream import gotoh_scores_stream

        ms_h = np.asarray(ms)
        ns_h = np.asarray(ns)

        def run_batch():
            out = gotoh_scores_stream(s1b, s2b, ms_h, ns_h, scores, False)
            np.asarray(out[0])  # host transfer forces completion
            return out
    else:
        from genomics_rs_tpu.parallel.batch import batch_scores

        def run_batch():
            out = batch_scores(s1b, s2b, ms, ns, scores, False)
            np.asarray(out.score)
            return out

    out = _retry(run_batch)
    sample_score = int(
        np.asarray(out[0] if isinstance(out, tuple) else out.score)[0]
    )
    dt = _median_time(run_batch)
    value = cells / dt
    baseline = _cpu_baseline(enc1, enc2, lens)
    # Plan the roofline for the batch actually scored (the non-TPU
    # path truncates to 3 pairs — planning all 55 would inflate the
    # ramp and peak fractions ~18x).
    roof = _roofline(
        value,
        int(s1b.shape[1]),
        int(s2b.shape[1]),
        int(ms.shape[0]),
        cells,
    )
    return {
        "pairs": len(ms),
        "cells": cells,
        "batch_ms": dt * 1e3,
        "sample_score": sample_score,
        "cells_per_s": value,
        "cpu_baseline_cells_per_s": baseline,
        "vs_baseline": value / baseline,
        "roofline": roof,
    }


def run_full() -> dict:
    """Measure the broad metric set and write BENCH_FULL.json."""
    import jax

    from genomics_rs_tpu.config import Scores
    from genomics_rs_tpu.sequence import (
        PAD_S1,
        PAD_S2,
        Sequence,
        SequenceContainer,
        round_up,
    )

    scores = Scores(**SCORE_ARGS)
    rows: dict = {"headline": run_headline()}
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print("--full requires the TPU backend", file=sys.stderr)
        return rows

    container = _load_corpus()
    s1, s2 = container.sequences[0], container.sequences[1]
    m, n = len(s1), len(s2)
    pair_cells = (m + 1.0) * (n + 1.0)

    # --- local-mode batch (stream kernel, per-segment argmax) ------
    from genomics_rs_tpu.ops.gotoh_stream import gotoh_scores_stream

    enc1, enc2, lens = _encode_corpus(container)
    num = len(lens)
    pairs_l = [(i, j) for j in range(num) for i in range(num) if i <= j]
    s1c = jax.device_put(np.stack([enc1[i] for i, _ in pairs_l]))
    s2c = jax.device_put(np.stack([enc2[j] for _, j in pairs_l]))
    mc = np.array([lens[i] for i, _ in pairs_l], dtype=np.int32)
    nc = np.array([lens[j] for _, j in pairs_l], dtype=np.int32)
    local_cells = float(np.sum((mc + 1.0) * (nc + 1.0)))

    def run_local():
        out = gotoh_scores_stream(s1c, s2c, mc, nc, scores, True)
        np.asarray(out[0])
        return out

    _retry(run_local, label="local stream warmup")
    dt = _median_time(run_local)
    rows["local_batch_stream"] = {
        "pairs": len(pairs_l),
        "cells": local_cells,
        "ms": dt * 1e3,
        "cells_per_s": local_cells / dt,
    }

    # --- kimura transition scoring, same corpus (global stream) ----
    # The substitution extension's measured cost vs the classic
    # headline (same batch, same kernel; +2 vector ops/cell).
    kim_scores = Scores(
        SCORE_ARGS["s_match"],
        SCORE_ARGS["s_mismatch"],
        SCORE_ARGS["g"],
        SCORE_ARGS["h"],
        s_transition=-1,
    )

    def run_kim():
        out = gotoh_scores_stream(s1c, s2c, mc, nc, kim_scores, False)
        np.asarray(out[0])
        return out

    _retry(run_kim, label="kimura stream warmup")
    dt = _median_time(run_kim)
    rows["headline_kimura"] = {
        "pairs": len(pairs_l),
        "cells": local_cells,
        "ms": dt * 1e3,
        "cells_per_s": local_cells / dt,
    }

    # --- protein batch under BLOSUM62 (full-matrix engine) ---------
    from genomics_rs_tpu.ops.gotoh_matrix import gotoh_scores_matrix
    from genomics_rs_tpu.ops.subst import blosum62

    b62 = blosum62()
    prng = np.random.default_rng(17)
    aa20 = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    PB, PL = 1024, 384
    pms = prng.integers(PL // 2, PL + 1, PB).astype(np.int32)
    pns = prng.integers(PL // 2, PL + 1, PB).astype(np.int32)
    p1 = np.full((PB, PL), PAD_S1, np.uint8)
    p2 = np.full((PB, PL), PAD_S2, np.uint8)
    for i in range(PB):
        p1[i, : pms[i]] = aa20[prng.integers(0, 20, pms[i])]
        p2[i, : pns[i]] = aa20[prng.integers(0, 20, pns[i])]
    prot_cells = float(np.sum((pms + 1.0) * (pns + 1.0)))
    p1d, p2d = jax.device_put(p1), jax.device_put(p2)

    def run_prot():
        out = gotoh_scores_matrix(
            p1d, p2d, pms, pns, b62, g=scores.g, h=scores.h
        )
        np.asarray(out[0])
        return out

    _retry(run_prot, label="protein matrix warmup")
    dt = _median_time(run_prot)
    rows["protein_blosum_batch"] = {
        "pairs": PB,
        "aa_len": PL,
        "cells": prot_cells,
        "ms": dt * 1e3,
        "cells_per_s": prot_cells / dt,
        "engine": "auto(stream)",
    }

    # --- protein stream headline (round 5): uniform-length batch ---
    # The 2-D packed continuous-stream kernel (G pair chains stacked
    # in the lane vector x T chained segments, int8 subs panes). The
    # headline is the GROUPED form: 32 x 1024-pair sub-batches scanned
    # inside ONE jit — a single dispatch, so the ~27 ms tunnel
    # round-trip floor doesn't masquerade as kernel cost (production
    # dispatch is ~100x cheaper); marginal cost is ~11.1 ms/group, so
    # 32 groups amortize the floor to <1 ms/group. The round-4 segmented engine runs
    # on one sub-batch for the apples-to-apples ratio.
    from genomics_rs_tpu.ops.gotoh_matrix_stream import (
        gotoh_scores_matrix_stream_grouped,
    )

    SL = 383
    GPB = 32 * 1024
    ug1 = aa20[prng.integers(0, 20, (GPB, SL))].astype(np.uint8)
    ug2 = aa20[prng.integers(0, 20, (GPB, SL))].astype(np.uint8)
    gms_ = np.full(GPB, SL, np.int32)
    gcells = float(GPB) * (SL + 1.0) * (SL + 1.0)

    def run_prot_stream():
        out = gotoh_scores_matrix_stream_grouped(
            ug1, ug2, gms_, gms_, b62, g=scores.g, h=scores.h,
            group_size=1024,
        )
        np.asarray(out[0][0])
        return out

    u1d = jax.device_put(ug1[:1024])
    u2d = jax.device_put(ug2[:1024])
    ucells = float(1024) * (SL + 1.0) * (SL + 1.0)

    def run_prot_seg():
        out = gotoh_scores_matrix(
            u1d, u2d, gms_[:1024], gms_[:1024], b62,
            g=scores.g, h=scores.h, engine="pallas",
        )
        np.asarray(out[0])
        return out

    _retry(run_prot_stream, label="protein stream warmup")
    dt = _median_time(run_prot_stream)
    _retry(run_prot_seg, label="protein segmented warmup")
    dt_seg = _median_time(run_prot_seg)
    rows["protein_stream_batch"] = {
        "pairs": GPB,
        "aa_len": SL,
        "cells": gcells,
        "ms": dt * 1e3,
        "cells_per_s": gcells / dt,
        "groups": 32,
        "segmented_pairs": 1024,
        "segmented_ms": dt_seg * 1e3,
        "segmented_cells_per_s": ucells / dt_seg,
        "vs_segmented": (ucells / dt_seg and (gcells / dt) / (ucells / dt_seg)),
    }

    # Local (Smith-Waterman) protein, same grouped batch: exact
    # keep-last argmax start cells at scale.
    def run_prot_stream_local():
        out = gotoh_scores_matrix_stream_grouped(
            ug1, ug2, gms_, gms_, b62, g=scores.g, h=scores.h,
            group_size=1024, is_local=True,
        )
        np.asarray(out[0][0])
        return out

    _retry(run_prot_stream_local, label="protein stream local warmup")
    dt_loc = _median_time(run_prot_stream_local)
    rows["protein_stream_local"] = {
        "pairs": GPB,
        "aa_len": SL,
        "cells": gcells,
        "ms": dt_loc * 1e3,
        "cells_per_s": gcells / dt_loc,
    }

    # --- protein batched FULL alignments (round 5): stream dirs ----
    # matrix_align_batch: ONE 2-D packed stream-dirs fill + ONE
    # walk_many dispatch (word-row + lane offsets) for the whole
    # batch; end-to-end includes unpack + classify on host.
    from genomics_rs_tpu.models.aligner import matrix_align_batch
    from genomics_rs_tpu.sequence import Sequence as _PSeq

    AB = 256
    apairs = [
        (
            _PSeq(f"a{i}", bytes(ug1[i]).decode()),
            _PSeq(f"b{i}", bytes(ug2[i]).decode()),
        )
        for i in range(AB)
    ]
    acells = float(AB) * (SL + 1.0) * (SL + 1.0)

    def run_prot_align():
        outs = matrix_align_batch(
            apairs, b62, g=scores.g, h=scores.h
        )
        return len(outs)

    _retry(run_prot_align, label="protein align warmup")
    dt = _median_time(run_prot_align, reps=3)
    rows["protein_align_batch"] = {
        "pairs": AB,
        "aa_len": SL,
        "cells": acells,
        "s": dt,
        "cells_per_s": acells / dt,
        "aligns_per_s": AB / dt,
    }

    # --- protein MSA (round 5): matrix-scored center pass + batched
    # stream-dirs star alignments ----------------------------------
    from genomics_rs_tpu.models.msa import center_star_msa
    from genomics_rs_tpu.sequence import SequenceContainer as _PSC

    pcont = _PSC()
    pbase = aa20[prng.integers(0, 20, 400)]
    for k in range(16):
        mut = pbase.copy()
        for _ in range(20):
            mut[prng.integers(0, 400)] = aa20[prng.integers(0, 20)]
        pcont.sequences.append(
            _PSeq(f"prot{k}", bytes(mut).decode())
        )

    def run_prot_msa():
        return center_star_msa(pcont, scores, matrix=b62)

    _retry(run_prot_msa, label="protein msa warmup")
    t0 = time.perf_counter()
    pmsa = run_prot_msa()
    dtc = time.perf_counter() - t0
    dt = _median_time(run_prot_msa, reps=3)
    rows["protein_msa"] = {
        "sequences": len(pmsa.rows),
        "aa_len": 400,
        "width": pmsa.width,
        "s": dtc,
        "s_warm": dt,
    }

    # --- single pair WITH traceback bitmap -------------------------
    from genomics_rs_tpu.models.aligner import _fill

    Lp = max(round_up(max(m, n), 128), 128)
    s1e = s1.encoded(pad_to=Lp, pad_value=PAD_S1)
    s2e = s2.encoded(pad_to=Lp, pad_value=PAD_S2)

    # The aligner's ACTUAL production path (round 4: the lean
    # row-block kernel as one block, packed dirs), then the on-device
    # walk ships home only the O(m+n) move list.
    def run_dirs():
        res = _fill(
            s1e,
            s2e,
            np.int32(m),
            np.int32(n),
            scores,
            False,
            "pallas",
            packed_dirs=True,
        )
        np.asarray(res.score)
        return res

    fill_res = _retry(run_dirs, label="dirs warmup")
    dt = _median_time(run_dirs, reps=5)

    # The production retrace path (device_walk -> Mosaic hardware
    # loop on TPU; ships home only the packed O(m+n) move list).
    from genomics_rs_tpu.ops.traceback_device import device_walk

    walk_steps = round_up(2 * Lp + 1, 8192)

    def run_walk():
        codes, i_f, j_f, done = device_walk(
            fill_res.dirs,
            fill_res.start_i,
            fill_res.start_j,
            np.int32(0),
            max_steps=walk_steps,
        )
        return len(codes)

    _retry(run_walk, label="walk warmup")
    dt_walk = _median_time(run_walk, reps=5)
    rows["single_pair_with_dirs"] = {
        "cells": pair_cells,
        "ms": dt * 1e3,
        "cells_per_s": pair_cells / dt,
        "device_walk_ms": dt_walk * 1e3,
        "fill_plus_walk_ms": (dt + dt_walk) * 1e3,
    }

    # --- BATCHED full alignments (streamed dirs fill) --------------
    # A single isolated pair pays the ~2x diagonal ramp + per-step
    # latency floor by construction (docs/ROUND4.md §8); every real
    # alignment-returning workload is a batch, and the batch is what
    # the streamed dirs kernel serves: one continuous wavefront
    # emitting packed words for all pairs, then per-segment Mosaic
    # walks (VERDICT r3 item 1's ">= 4e10 with dirs" criterion in its
    # batched form).
    from genomics_rs_tpu.models.aligner import align_batch
    from genomics_rs_tpu.ops.gotoh_stream import gotoh_stream_fill_dirs

    bpairs = [
        (container.sequences[0], container.sequences[j])
        for j in range(1, num)
    ]
    bcells = float(
        sum((len(a) + 1.0) * (len(b) + 1.0) for a, b in bpairs)
    )
    Lb1 = max(round_up(max(len(a) for a, _ in bpairs), 128), 128)
    Lb2 = max(round_up(max(len(b) for _, b in bpairs), 128), 128)
    sb1 = jax.device_put(
        np.stack([a.encoded(pad_to=Lb1, pad_value=PAD_S1) for a, _ in bpairs])
    )
    sb2 = jax.device_put(
        np.stack([b.encoded(pad_to=Lb2, pad_value=PAD_S2) for _, b in bpairs])
    )
    mb = np.array([len(a) for a, _ in bpairs], np.int32)
    nb = np.array([len(b) for _, b in bpairs], np.int32)

    def run_bdirs():
        res = gotoh_stream_fill_dirs(sb1, sb2, mb, nb, scores)
        np.asarray(res.score)
        return res

    _retry(run_bdirs, label="batch dirs warmup")
    dt_bf = _median_time(run_bdirs, reps=5)

    def run_bfull():
        return align_batch(bpairs, scores, is_local=False, engine="pallas")

    _retry(run_bfull, label="batch align warmup")
    dt_be = _median_time(run_bfull, reps=3)

    def run_bdirs_local():
        res = gotoh_stream_fill_dirs(
            sb1, sb2, mb, nb, scores, is_local=True
        )
        np.asarray(res.score)
        return res

    _retry(run_bdirs_local, label="batch dirs local warmup")
    dt_bl = _median_time(run_bdirs_local, reps=5)
    rows["batch_align_dirs"] = {
        "pairs": len(bpairs),
        "cells": bcells,
        "fill_ms": dt_bf * 1e3,
        "fill_cells_per_s": bcells / dt_bf,
        "end_to_end_s": dt_be,
        "aligns_per_s": len(bpairs) / dt_be,
        "local_fill_ms": dt_bl * 1e3,
        "local_fill_cells_per_s": bcells / dt_bl,
    }

    # --- short-read batch ------------------------------------------
    from genomics_rs_tpu.parallel.batch import score_pairs

    rng = np.random.default_rng(5)
    B, L = 16384, 152
    Lpad = 256
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    s1r = np.full((B, Lpad), PAD_S1, np.uint8)
    s2r = np.full((B, Lpad), PAD_S2, np.uint8)
    s1r[:, :L] = bases[rng.integers(0, 4, (B, L))]
    s2r[:, :L] = bases[rng.integers(0, 4, (B, L))]
    s1r, s2r = jax.device_put(s1r), jax.device_put(s2r)
    mr = jax.device_put(np.full(B, L, np.int32))
    nr = jax.device_put(np.full(B, L, np.int32))

    def run_reads():
        out = score_pairs(s1r, s2r, mr, nr, scores, False)
        np.asarray(out[0])
        return out

    _retry(run_reads, label="shortread warmup")
    dt = _median_time(run_reads, reps=8)
    read_cells = float(B) * (L + 1.0) ** 2
    rows["shortread_batch"] = {
        "reads": B,
        "read_len": L,
        "ms": dt * 1e3,
        "cells_per_s": read_cells / dt,
    }

    # --- full read pipeline (fill + dirs + batched walk + CIGARs) --
    from genomics_rs_tpu.models.reads import align_reads
    from genomics_rs_tpu.sequence import Sequence as _Seq

    n_full = 16384
    s1h, s2h = np.asarray(s1r), np.asarray(s2r)
    rq = [
        _Seq(f"q{i}", bytes(s1h[i][:L]).decode()) for i in range(n_full)
    ]
    rr = [
        _Seq(f"r{i}", bytes(s2h[i][:L]).decode()) for i in range(n_full)
    ]

    def run_reads_full():
        out, cigs = align_reads(
            rq,
            rr,
            scores,
            is_local=False,
            with_paths=False,
            with_cigars=True,
        )
        assert len(cigs) == len(out)
        return len(out)

    _retry(run_reads_full, label="reads pipeline warmup")
    # Median of 3: this row mixes device rounds with pipelined host
    # classification and measured 1.6-3.7 s run to run — a single
    # sample under- or over-reports by 2x.
    times_rf = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_reads_full()
        times_rf.append(time.perf_counter() - t0)
    dt_full = float(np.median(times_rf))
    rows["reads_full_pipeline"] = {
        "reads": n_full,
        "read_len": L,
        "s": dt_full,
        "reps": [round(t, 3) for t in times_rf],
        "reads_per_s": n_full / dt_full,
    }

    # --- seed-and-extend mapping: 100k reads vs chr12 --------------
    chr12_path = os.path.join(REF, "test_data", "chr12.fasta")
    if os.path.exists(chr12_path):
        from genomics_rs_tpu.models.mapper import KmerIndex, map_reads

        cm = SequenceContainer()
        cm.from_fasta(chr12_path)
        chrom = cm.sequences[0]
        rng_m = np.random.default_rng(12)
        n_map = 100_000
        # 128 bp: window = len + 4*band = 256 — exactly the short-read
        # kernel's VMEM cap, so extension runs on the Pallas path.
        rlen = 128
        comp = str.maketrans("ACGT", "TGCA")
        mreads = []
        for i in range(n_map):
            p = int(rng_m.integers(0, len(chrom) - rlen))
            frag = chrom.sequence[p : p + rlen]
            if i % 2:
                frag = frag.translate(comp)[::-1]
            mreads.append(_Seq(f"m{i}", frag))
        t0 = time.perf_counter()
        m_index = KmerIndex(chrom, 21)
        dt_index = time.perf_counter() - t0

        def run_map():
            res = map_reads(
                mreads, chrom, scores, index=m_index, with_paths=False
            )
            return sum(r.mapped for r in res)

        n_mapped = _retry(run_map, label="mapper warmup")
        t0 = time.perf_counter()
        run_map()
        dt_map = time.perf_counter() - t0
        # Phase breakdown: an unreachable min_seeds threshold makes
        # every read stop after seeding/voting (no extension
        # dispatch, no classify) — the difference is the extension+
        # classify share of the pipeline.
        map_reads(
            mreads, chrom, scores, index=m_index,
            with_paths=False, min_seeds=10**9,
        )
        t0 = time.perf_counter()
        map_reads(
            mreads, chrom, scores, index=m_index,
            with_paths=False, min_seeds=10**9,
        )
        dt_seed = time.perf_counter() - t0
        rows["map_100k_chr12"] = {
            "reads": n_map,
            "read_len": rlen,
            "mapped": int(n_mapped),
            "index_s": dt_index,
            "s": dt_map,
            "seed_only_s": dt_seed,
            "reads_per_s": n_map / dt_map,
        }

        # --- variant calling: 100k errorful reads, 50 planted SNPs -
        # Donor = chr12 with 50 planted SNPs; reads carry 0.3%
        # uniform sequencing errors with LOW base quality (q8) at the
        # error positions and q38 elsewhere, so the quality-aware
        # caller (round 4) can discount exactly the unreliable
        # evidence. Gates: weighted consensus, min_baseq 13,
        # min_mapq 10, min_depth 5, min_frac 0.6.
        from genomics_rs_tpu.models.caller import call_reads

        flip = {"A": "G", "C": "T", "G": "A", "T": "C"}
        rng_c = np.random.default_rng(33)
        n_call, clen = 100_000, 150
        # Truth positions confined to UNIQUELY MAPPABLE loci (the
        # centered read-length window occurs exactly once in chr12,
        # verified with the FM-index) — the standard callable-region
        # restriction: a SNP inside an exact two-copy repeat is
        # information-theoretically ambiguous at this read length
        # (the planted copy and its twin split the reads 50/50), and
        # one sampled without the filter landed where NO read maps.
        from genomics_rs_tpu.suffixtree.fmindex import FMIndex

        fm_u = FMIndex.build(chrom.sequence)
        cand = rng_c.choice(
            np.arange(500, len(chrom) - 500), 400, replace=False
        )
        half = clen // 2
        wins = [
            chrom.sequence[int(p) - half : int(p) + half] for p in cand
        ]
        uniq = fm_u.count_batch(wins, device=False) == 1
        if uniq.sum() < 50:
            raise AssertionError("not enough unique loci sampled")
        truth_pos = np.sort(cand[uniq][:50])
        donor_l = np.frombuffer(
            chrom.sequence.encode("latin-1"), np.uint8
        ).copy()
        code4 = np.full(256, 0, np.uint8)
        for ci, ch2 in enumerate(b"ACGT"):
            code4[ch2] = ci
        base4 = np.frombuffer(b"ACGT", np.uint8)
        for p in truth_pos:
            donor_l[p] = ord(flip[chr(donor_l[p])])
        starts = rng_c.integers(
            0, len(chrom) - clen, n_call
        ).astype(np.int64)
        win = donor_l[starts[:, None] + np.arange(clen)]
        err = rng_c.random((n_call, clen)) < 0.003
        bump = rng_c.integers(1, 4, (n_call, clen)).astype(np.uint8)
        win = np.where(
            err, base4[(code4[win] + bump) % 4], win
        )
        quals = np.where(err, np.uint8(33 + 8), np.uint8(33 + 38))
        creads = []
        for i in range(n_call):
            s = win[i].tobytes().decode("latin-1")
            q = quals[i].tobytes().decode("latin-1")
            if i % 2:
                s = s.translate(comp)[::-1]
                q = q[::-1]
            creads.append(_Seq(f"c{i}", s, q))

        def run_call():
            # min_mapq 0: ambiguity is handled by the MAPQ weight
            # (ties weigh 0.5), not a hard gate — a hard gate zeroes
            # the depth at borderline loci instead of discounting it.
            return call_reads(
                creads, [chrom], scores,
                min_depth=5, min_frac=0.6,
                weighted=True, min_baseq=13, min_mapq=0,
                min_alt_conf=0.8,
                index=m_index, with_paths=False,
            )

        _retry(run_call, label="caller warmup")
        t0 = time.perf_counter()
        calls, _pileups = run_call()
        dt_call = time.perf_counter() - t0
        # The donor base at a planted position IS the alt base.
        truth = {(int(p) + 1, chr(donor_l[p])) for p in truth_pos}
        got_snps = {
            (c.pos, c.alt)
            for c in calls
            if not c.is_deletion and not c.is_insertion
        }
        recovered = len(got_snps & truth)
        rows["call_100k_chr12"] = {
            "reads": n_call,
            "read_len": clen,
            "planted": len(truth_pos),
            "recovered": recovered,
            "false_calls": len(calls) - recovered,
            "s_warm": dt_call,
            "reads_per_s": n_call / dt_call,
        }

    # --- checkpointed 155 kb full traceback ------------------------
    slyco = os.path.join(REF, "test_data", "Slyco.fasta")
    if os.path.exists(slyco):
        from genomics_rs_tpu.models.longalign import align_checkpointed

        c2 = SequenceContainer()
        c2.from_fasta(slyco)
        sl = c2.sequences[0]
        t0 = time.perf_counter()
        aligned = _retry(
            lambda: align_checkpointed(sl, sl, scores),
            attempts=2,
            label="ckpt",
        )
        dt = time.perf_counter() - t0
        # Steady state: the first call pays the block kernels' compiles;
        # repeat jobs (and any corpus with >1 long pair) run warm.
        t0 = time.perf_counter()
        aligned2 = align_checkpointed(sl, sl, scores)
        dt_warm = time.perf_counter() - t0
        assert aligned2.score == aligned.score
        rows["checkpointed_155kb"] = {
            "len": len(sl),
            "score": aligned.score,
            "s": dt,
            "s_warm": dt_warm,
            "cells_per_s_2pass": 2 * (len(sl) + 1.0) ** 2 / dt_warm,
        }

    # --- chr12 x chr12 exact score (1.16e12 cells, rolling blocks) --
    chr12 = os.path.join(REF, "test_data", "chr12.fasta")
    if os.path.exists(chr12):
        from genomics_rs_tpu.models.longalign import score_long

        c3 = SequenceContainer()
        c3.from_fasta(chr12)
        ch = c3.sequences[0]
        t0 = time.perf_counter()
        sc12 = _retry(
            lambda: score_long(ch, ch, scores)[0],
            attempts=2,
            label="chr12",
        )
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        sc12b = score_long(ch, ch, scores)[0]
        dt_warm = time.perf_counter() - t0
        assert int(sc12b) == int(sc12)
        rows["chr12_score"] = {
            "len": len(ch),
            "score": int(sc12),
            "s": dt,
            "s_warm": dt_warm,
            "cells_per_s": (len(ch) + 1.0) ** 2 / dt_warm,
        }

        # --- chr12 x chr12 FULL alignment (windowed traceback) ------
        # 1.16e12 cells with a full bit-exact traceback via the
        # round-4 windowed scheme (models/longalign): the forward
        # checkpoints 32k-row block tops AND stride-32k columns, the
        # backward refills only ~32-64k-column windows around the
        # walked path (a monolithic bitmap would be ~290 GB; a
        # full-width refill pass ~0.6e12 cells — the windows are
        # ~5% of that). The reference cannot run ANY pair this size
        # (48 B/cell = ~56 TB). One timed call through the public
        # aligner routing; compiles come from the persistent cache
        # after the first run.
        from genomics_rs_tpu.models.aligner import PairwiseAligner

        t0 = time.perf_counter()
        al12 = _retry(
            lambda: PairwiseAligner(scores).align(ch, ch),
            attempts=2,
            label="chr12 full align",
        )
        dt = time.perf_counter() - t0
        assert al12.score == len(ch) and al12.matches == len(ch)
        # Steady-state pass: the first call's time is dominated by
        # tunnel compiles of the hierarchical variants (and varies
        # 85-245 s run to run); the warm number is the capability's
        # honest cost.
        t0 = time.perf_counter()
        al12w = PairwiseAligner(scores).align(ch, ch)
        dtw = time.perf_counter() - t0
        assert al12w.score == len(ch)
        rows["chr12_full_align"] = {
            "len": len(ch),
            "score": al12.score,
            "s": dt,
            "s_warm": dtw,
            # New key: prior rounds' cells_per_s_1pass divided by the
            # cold time; keep the semantics change visible in diffs.
            "cells_per_s_1pass_warm": (len(ch) + 1.0) ** 2 / dtw,
        }

        # --- chr12 x chr12 BANDED full alignment --------------------
        # Width-2048 diagonal band: 2.2e9 band cells instead of
        # 1.16e12 — exact for near-diagonal pairs (ops/gotoh_banded).
        from genomics_rs_tpu.models.banded import align_banded

        _retry(
            lambda: align_banded(ch, ch, scores, band=2048),
            attempts=2,
            label="chr12 banded",
        )
        t0 = time.perf_counter()
        ab12 = align_banded(ch, ch, scores, band=2048)
        dt = time.perf_counter() - t0
        assert ab12.score == len(ch) and ab12.matches == len(ch)
        rows["chr12_banded_align"] = {
            "len": len(ch),
            "band": 2048,
            "score": ab12.score,
            "s_warm": dt,
            "band_cells_per_s": (len(ch) + 1.0) * 2048 / dt,
        }

    # --- BATCHED banded fills (round 5) -----------------------------
    # The single-pair banded fill is dependent-step latency bound
    # (~8e8 band-cells/s at any width — docs/ROUND4.md §8); the
    # batched kernel advances 8 pairs per step. Workload: a 16-pair
    # similar-sequence corpus (mutated CoV genomes) at W = 2048.
    try:
        from genomics_rs_tpu.ops.gotoh_banded_batch import (
            gotoh_banded_batch,
        )
        from genomics_rs_tpu.ops.gotoh_banded import (
            gotoh_banded as _gb_single,
        )

        brng = np.random.default_rng(23)
        base_seq = container.sequences[0].sequence
        BBn = 16
        bW = 2048
        bs1b, bs2b = [], []
        for _ in range(BBn):
            mb = np.frombuffer(base_seq.encode(), np.uint8).copy()
            for _ in range(60):
                mb[brng.integers(0, len(mb))] = ord(
                    "ACGT"[brng.integers(0, 4)]
                )
            mb = np.delete(
                mb, brng.integers(0, len(mb) - 100, size=3)
            )
            bs1b.append(base_seq)
            bs2b.append(bytes(mb).decode())
        bLm = max(round_up(max(len(s) for s in bs1b), 128), 128)
        bLn = max(round_up(max(len(s) for s in bs2b), 128), 128)
        b1 = np.stack(
            [
                Sequence("a", s).encoded(pad_to=bLm, pad_value=PAD_S1)
                for s in bs1b
            ]
        )
        b2 = np.stack(
            [
                Sequence("b", s).encoded(pad_to=bLn, pad_value=PAD_S2)
                for s in bs2b
            ]
        )
        bms = np.array([len(s) for s in bs1b], np.int32)
        bns = np.array([len(s) for s in bs2b], np.int32)
        band_cells = float(bms.sum()) * bW

        def run_banded_batch():
            outs = gotoh_banded_batch(
                b1, b2, bms, bns, scores, W=bW
            )
            for r in outs:
                np.asarray(r.score)
            return outs

        _retry(run_banded_batch, label="banded batch warmup")
        dt = _median_time(run_banded_batch, reps=5)

        def run_banded_single():
            sc_, _ = _gb_single(
                b1[0], b2[0], int(bms[0]), int(bns[0]), scores, V=bW
            )
            np.asarray(sc_)

        _retry(run_banded_single, label="banded single warmup")
        dt1 = _median_time(run_banded_single, reps=5)
        rows["banded_batch"] = {
            "pairs": BBn,
            "band": bW,
            "band_cells": band_cells,
            "s": dt,
            "band_cells_per_s": band_cells / dt,
            "single_pair_ms": dt1 * 1e3,
            "single_pair_band_cells_per_s": float(bms[0])
            * bW
            / dt1,
            "vs_single_pair_aggregate": (band_cells / dt)
            / (float(bms[0]) * bW / dt1),
        }
    except Exception as e:  # noqa: BLE001
        rows["banded_batch"] = {"error": str(e)[:200]}

    # --- sequence-parallel pipeline on a 1-device mesh -------------
    from genomics_rs_tpu.ops.gotoh_pallas import gotoh_scores_pallas_batch
    from genomics_rs_tpu.parallel.longseq import sharded_gotoh_score
    from genomics_rs_tpu.parallel.mesh import SEQ_AXIS, make_mesh

    mesh = make_mesh(1, axis_name=SEQ_AXIS)
    Lm8 = max(round_up(m, 8), 8)
    s1e8 = s1.encoded(pad_to=Lm8, pad_value=PAD_S1)

    def run_seqpar():
        out = sharded_gotoh_score(
            mesh, s1e8, s2e, np.int32(m), np.int32(n), scores, False,
            engine="pallas",
        )
        np.asarray(out.score)
        return out

    # Apples-to-apples baseline: the flat kernel on the SAME single
    # pair, score-only (VERDICT r1 item 1's done criterion).
    s1p = s1.encoded(pad_to=Lp, pad_value=PAD_S1)[None, :]
    s2p = s2e[None, :]
    mp1 = np.array([m], np.int32)
    np1 = np.array([n], np.int32)

    def run_flat1():
        out = gotoh_scores_pallas_batch(
            s1p, s2p, mp1, np1, scores, False
        )
        np.asarray(out[0])
        return out

    _retry(run_seqpar, label="seqpar warmup")
    dt = _median_time(run_seqpar, reps=5)
    _retry(run_flat1, label="flat1 warmup")
    dt_flat = _median_time(run_flat1, reps=5)
    rows["seqpar_1dev_mesh"] = {
        "ms": dt * 1e3,
        "cells_per_s": pair_cells / dt,
        "flat_single_pair_ms": dt_flat * 1e3,
        "vs_flat_single_pair": dt / dt_flat,
    }

    # --- seq-parallel pipeline cost model (round 5) ------------------
    # Step-count/bytes-exchanged arithmetic for the ppermute tile
    # pipeline at P = 2/4/8 shards, anchored to the MEASURED n=1 mesh
    # time above (which already pays the shard_map + tile-boundary
    # overhead — the 1.27x vs the flat kernel). Model: a (m/P x n/C)
    # tile fills in K_t = m/P + n/C + 1 dependent diagonal steps at
    # the measured per-step latency tau = T1 / (m + n + 1); the
    # pipeline runs P + C - 1 tile waves, each followed by one
    # ppermute of the (3, B+1) int32 boundary row over ICI. Projected
    # efficiency = T1 / (P * wall(P)).
    tau = dt / (m + n + 1)
    ici_bytes_per_s = 4.5e10  # one v5e ICI link per direction ~45 GB/s
    model = []
    for P_ in (2, 4, 8):
        C_ = 8 * P_  # PIPELINE_BLOCKS * P: bubble < 1/8
        R_ = -(-m // P_)
        B_ = -(-n // C_)
        waves = P_ + C_ - 1
        steps_per_wave = R_ + B_ + 1
        permute_bytes = 3 * (B_ + 1) * 4
        wall = waves * (
            steps_per_wave * tau + permute_bytes / ici_bytes_per_s
        )
        model.append(
            {
                "shards": P_,
                "col_blocks": C_,
                "tile_waves": waves,
                "diag_steps_per_wave": steps_per_wave,
                "ppermute_bytes_per_wave": permute_bytes,
                "total_diag_steps": waves * steps_per_wave,
                "projected_ms": wall * 1e3,
                "projected_cells_per_s": pair_cells / wall,
                "projected_efficiency_vs_1dev": dt / (P_ * wall),
            }
        )
    rows["seqpar_model"] = {
        "anchor": "seqpar_1dev_mesh.ms",
        "tau_ns_per_diag_step": tau * 1e9,
        "ici_bytes_per_s_assumed": ici_bytes_per_s,
        "pair": [m, n],
        "model": model,
    }

    # --- compare mode wall-clock (suffix-tree LCS semantics) -------
    try:
        from genomics_rs_tpu.comparison.driver import (
            compare_all_pairs,
            load_fasta_dir,
        )

        corpus = load_fasta_dir(os.path.join(REF, "comparison_data"))
        # Host-side row: same repeat discipline as the device rows
        # (round-4 verdict item 7 — a single cold `s` made the
        # 1.61->2.21 s r3->r4 drift undecidable noise-vs-regression).
        # First run includes pool spin-up; warm = median of 3 repeats.
        t0 = time.perf_counter()
        compare_all_pairs(
            corpus, os.path.join(REF, "alphabets", "dna.txt"), threads=4
        )
        dt_cold = time.perf_counter() - t0
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            compare_all_pairs(
                corpus,
                os.path.join(REF, "alphabets", "dna.txt"),
                threads=4,
            )
            reps.append(time.perf_counter() - t0)
        rows["compare_10genomes"] = {
            "s": dt_cold,
            "s_warm": float(np.median(reps)),
            "reps": [round(r, 3) for r in reps],
            # Host-parallel row: wall time tracks free host cores.
            # Round 5 re-measured 1.55 s warm on the same 4-core box
            # (vs the single 2.21 s r4 sample), so the r3->r4 "drift"
            # was concurrent host load, not a regression; host_cores
            # is recorded so future comparisons stay apples-to-apples.
            "host_cores": os.cpu_count(),
        }
    except Exception as e:  # noqa: BLE001
        rows["compare_10genomes"] = {"error": str(e)[:200]}

    # --- center-star MSA over the 10-genome corpus ------------------
    try:
        from genomics_rs_tpu.comparison.driver import load_fasta_dir
        from genomics_rs_tpu.models.msa import center_star_msa

        corpus = load_fasta_dir(os.path.join(REF, "comparison_data"))
        t0 = time.perf_counter()
        msa = center_star_msa(corpus, Scores(**SCORE_ARGS))
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        center_star_msa(corpus, Scores(**SCORE_ARGS))
        dtw = time.perf_counter() - t0  # steady state, compiles cached
        rows["msa_10genomes"] = {
            "sequences": len(msa.rows),
            "width": msa.width,
            "s": dt,
            "s_warm": dtw,
        }
    except Exception as e:  # noqa: BLE001
        rows["msa_10genomes"] = {"error": str(e)[:200]}

    # --- multi-host work balance (static deal accounting) -----------
    # The scaling-efficiency claim (BASELINE.md north star) for the
    # embarrassingly-parallel all-pairs job decomposes into (a) snake-
    # deal imbalance over true DP cells, (b) per-share padded-cell
    # inflation from power-of-two bucketing, (c) the one allgather.
    # All three are deterministic host math — recorded here so the
    # >= 80% multi-host claim rests on numbers, not argument.
    try:
        from genomics_rs_tpu.comparison.driver import load_fasta_dir
        from genomics_rs_tpu.parallel.allpairs import (
            _bucket_key,
            bucketize_pairs,
        )
        from genomics_rs_tpu.parallel.distributed import balanced_deal
        from genomics_rs_tpu.sequence import round_up as _wb_ru

        def _balance(lens, hosts):
            pairs = [
                (i, j)
                for j in range(len(lens))
                for i in range(len(lens))
                if i <= j
            ]
            true_c = [
                (lens[i] + 1.0) * (lens[j] + 1.0) for i, j in pairs
            ]
            shares = balanced_deal(true_c, hosts)
            per_true = [sum(true_c[k] for k in s) for s in shares]
            per_pad = []
            for s in shares:
                mine = [pairs[k] for k in s]
                padded = 0.0
                for key, idxs in bucketize_pairs(
                    mine, np.asarray(lens)
                ).items():
                    Lm = max(
                        _wb_ru(max(lens[mine[x][0]] for x in idxs), 128),
                        128,
                    )
                    Ln = max(
                        _wb_ru(max(lens[mine[x][1]] for x in idxs), 128),
                        128,
                    )
                    padded += len(idxs) * (Lm + 1.0) * (Ln + 1.0)
                per_pad.append(padded)
            cap = max(len(s) for s in shares)
            total_true = sum(true_c)

            # Hybrid deal (round 5): oversized pairs split across
            # host groups via the alignment-capable seq-parallel
            # pipeline; loads include the pipeline-bubble overhead
            # (split_cost) and the row records each split's group
            # size so the device-count accounting is explicit.
            from genomics_rs_tpu.parallel.distributed import (
                hybrid_deal,
                split_cost,
            )

            hshares = hybrid_deal(true_c, hosts)
            hloads = [
                sum(
                    split_cost(true_c[u.index], u.nparts)
                    if u.nparts > 1
                    else true_c[u.index]
                    for u in s
                )
                for s in hshares
            ]
            splits = sorted(
                {
                    (u.index, u.nparts)
                    for s in hshares
                    for u in s
                    if u.nparts > 1
                }
            )
            return {
                "hosts": hosts,
                "pairs": len(pairs),
                "deal_imbalance_true": max(per_true)
                / (total_true / hosts),
                "pad_inflation": sum(per_pad) / total_true,
                "bottleneck_eff": total_true / hosts / max(per_pad),
                "allgather_bytes": cap * 8 * hosts,
                "hybrid_bottleneck_eff": total_true
                / hosts
                / max(hloads),
                "hybrid_splits": [
                    {
                        "pair": pairs[idx],
                        "cells": true_c[idx],
                        "devices": parts,
                        "per_host_cost": split_cost(
                            true_c[idx], parts
                        ),
                    }
                    for idx, parts in splits
                ],
            }

        corpus = load_fasta_dir(os.path.join(REF, "comparison_data"))
        lens10 = [len(s) for s in corpus.sequences]
        slyco_p = os.path.join(REF, "test_data", "Slyco.fasta")
        mixed = list(lens10)
        if os.path.exists(slyco_p):
            mixed.append(
                len(
                    SequenceContainer()
                    .from_fasta(slyco_p)
                    .sequences[0]
                )
            )
        rows["work_balance"] = {
            "corpus_10x30kb": [
                _balance(lens10, h) for h in (2, 4, 8)
            ],
            "mixed_plus_155kb": [
                _balance(mixed, h) for h in (2, 4, 8)
            ],
        }
    except Exception as e:  # noqa: BLE001
        rows["work_balance"] = {"error": str(e)[:200]}

    # --- FM-index: chr12 build + 100k-pattern batch search ----------
    try:
        from genomics_rs_tpu.suffixtree.fmindex import FMIndex

        chr12 = (
            SequenceContainer()
            .from_fasta(os.path.join(REF, "test_data", "chr12.fasta"))
            .sequences[0]
            .sequence
        )
        t0 = time.perf_counter()
        fm = FMIndex.build(chr12)
        t_build = time.perf_counter() - t0
        rng = np.random.default_rng(1)
        pats = []
        for _ in range(100_000):
            L = int(rng.integers(20, 40))
            st = int(rng.integers(0, len(chr12) - L))
            pats.append(chr12[st : st + L])
        fm.count_batch(pats)  # warm: jit is keyed on the (B, Lp) shape
        # Median of 3: host prep + tunnel H2D dominate this row and
        # swing 2-5x with environment load bursts (round-5 isolation:
        # the stage sum is ~1.0 s — prep 0.6, H2D 0.2, device 0.13).
        times_fm = []
        for _ in range(3):
            t0 = time.perf_counter()
            counts = fm.count_batch(pats)
            times_fm.append(time.perf_counter() - t0)
        t_search = float(np.median(times_fm))
        if not (counts >= 1).all():
            raise AssertionError("sampled pattern missed its own text")
        from genomics_rs_tpu.suffixtree.native import native_available

        rows["fmindex_chr12"] = {
            "bases": len(chr12),
            "build_s": t_build,
            "host_sais": bool(native_available()),
            "patterns": len(pats),
            "search_s": t_search,
            "search_reps": [round(t, 3) for t in times_fm],
            "patterns_per_s": len(pats) / t_search,
        }
    except Exception as e:  # noqa: BLE001
        rows["fmindex_chr12"] = {"error": str(e)[:200]}

    _check_schema(rows)
    with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
        json.dump(rows, f, indent=1)
    return rows


#: Required keys per --full row. The round-3 verdict found the
#: committed record missing the warm keys the prose cited; this gate
#: makes a silent schema drift loud at measurement time (rows that
#: errored out carry an "error" key instead and are reported).
FULL_SCHEMA = {
    "headline": {"cells_per_s", "vs_baseline", "roofline"},
    "headline_kimura": {"cells_per_s"},
    "protein_blosum_batch": {"cells_per_s"},
    "protein_stream_batch": {"cells_per_s", "vs_segmented"},
    "protein_stream_local": {"cells_per_s"},
    "protein_align_batch": {"cells_per_s", "aligns_per_s"},
    "protein_msa": {"s", "s_warm"},
    "local_batch_stream": {"cells_per_s"},
    "single_pair_with_dirs": {"cells_per_s", "fill_plus_walk_ms"},
    "batch_align_dirs": {"fill_cells_per_s", "aligns_per_s"},
    "shortread_batch": {"cells_per_s"},
    "reads_full_pipeline": {"reads_per_s"},
    "map_100k_chr12": {"reads_per_s", "seed_only_s", "s"},
    "call_100k_chr12": {"recovered", "false_calls", "s_warm"},
    "checkpointed_155kb": {"s", "s_warm"},
    "chr12_score": {"s", "s_warm", "cells_per_s"},
    "chr12_full_align": {"s", "s_warm", "cells_per_s_1pass_warm"},
    "chr12_banded_align": {"s_warm", "band_cells_per_s"},
    "banded_batch": {"band_cells_per_s", "vs_single_pair_aggregate"},
    "seqpar_1dev_mesh": {"cells_per_s"},
    "seqpar_model": {"tau_ns_per_diag_step", "model"},
    "compare_10genomes": {"s"},
    "msa_10genomes": {"s", "s_warm"},
    "work_balance": {"corpus_10x30kb", "mixed_plus_155kb"},
    "fmindex_chr12": {"build_s", "search_s", "host_sais"},
}


def _check_schema(rows: dict) -> None:
    problems = []
    for name, need in FULL_SCHEMA.items():
        row = rows.get(name)
        if row is None:
            problems.append(f"row missing: {name}")
        elif "error" in row:
            problems.append(f"row errored: {name}: {row['error']}")
        else:
            missing = need - set(row)
            if missing:
                problems.append(f"{name} missing keys: {sorted(missing)}")
    for p in problems:
        print(f"[schema] {p}", file=sys.stderr)
    if problems:
        print(
            f"[schema] BENCH_FULL.json is INCOMPLETE ({len(problems)} "
            "problems) — prose must not cite numbers absent here",
            file=sys.stderr,
        )


def run_smoke() -> int:
    """Hardware gate: all Pallas kernels, non-interpreted, vs the C++
    oracle on small inputs. Returns a process exit code."""
    import jax

    from genomics_rs_tpu.config import Scores
    from genomics_rs_tpu.sequence import PAD_S1, PAD_S2
    from genomics_rs_tpu.suffixtree.native import gotoh_score_cpu

    if jax.default_backend() != "tpu":
        print("--smoke requires the TPU backend", file=sys.stderr)
        return 2

    scores = Scores(**SCORE_ARGS)
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    B, Lm, Ln = 3, 384, 256
    ms = rng.integers(Lm // 2, Lm + 1, B).astype(np.int32)
    ns = rng.integers(Ln // 2, Ln + 1, B).astype(np.int32)
    s1b = np.full((B, Lm), PAD_S1, np.uint8)
    s2b = np.full((B, Ln), PAD_S2, np.uint8)
    for i in range(B):
        s1b[i, : ms[i]] = bases[rng.integers(0, 4, ms[i])]
        s2b[i, : ns[i]] = bases[rng.integers(0, 4, ns[i])]
    want = {}
    for loc in (False, True):
        want[loc] = [
            gotoh_score_cpu(
                bytes(s1b[i][: ms[i]]),
                bytes(s2b[i][: ns[i]]),
                1,
                -2,
                -1,
                -5,
                loc,
            )
            for i in range(B)
        ]

    failures = []

    def check(name, got, loc, starts_checked=True):
        for i in range(B):
            w = want[loc][i]
            g = (int(got[0][i]), int(got[1][i]), int(got[2][i]))
            ok = g[0] == w[0] and (not starts_checked or g[1:] == w[1:])
            status = "ok" if ok else f"MISMATCH got {g} want {w}"
            print(f"[smoke] {name} local={loc} pair{i}: {status}")
            if not ok:
                failures.append((name, loc, i, g, w))

    from genomics_rs_tpu.ops.gotoh_pallas import (
        gotoh_fill_pallas,
        gotoh_scores_blocked,
        gotoh_scores_pallas_batch,
    )
    from genomics_rs_tpu.ops.gotoh_segmented import gotoh_scores_segmented
    from genomics_rs_tpu.ops.gotoh_shortread import gotoh_scores_shortread

    for loc in (False, True):
        got = _retry(
            lambda loc=loc: gotoh_scores_pallas_batch(
                s1b, s2b, ms, ns, scores, loc
            ),
            label="smoke batch",
        )
        check("flat_batch", got, loc)
        got = _retry(
            lambda loc=loc: gotoh_scores_blocked(
                s1b, s2b, ms, ns, scores, loc, R=128
            ),
            label="smoke blocked",
        )
        check("blocked_batch", got, loc)
        got = _retry(
            lambda loc=loc: gotoh_scores_segmented(
                s1b, s2b, ms, ns, scores, loc
            ),
            label="smoke segmented",
        )
        check("segmented_batch", got, loc)

    # Streamed multi-segment kernel (global probe capture + local
    # per-segment keep-last argmax with start cells).
    from genomics_rs_tpu.ops.gotoh_stream import gotoh_scores_stream

    for loc in (False, True):
        got = _retry(
            lambda loc=loc: gotoh_scores_stream(
                s1b, s2b, ms, ns, scores, loc
            ),
            label="smoke stream",
        )
        check("stream_batch", got, loc)

    # Row-stacked 8-stream kernel (global mid-band route; local mode
    # exists but is routed to segmented — still gate both).
    from genomics_rs_tpu.ops.gotoh_stream8 import gotoh_scores_stream8

    for loc in (False, True):
        got = _retry(
            lambda loc=loc: gotoh_scores_stream8(
                s1b, s2b, ms, ns, scores, loc
            ),
            label="smoke stream8",
        )
        check("stream8_batch", got, loc)

    # Kimura transition scoring (substitution extension): every
    # routed engine's kimura variant vs the C++ LUT oracle on chip.
    from genomics_rs_tpu.ops.subst import kimura_byte_lut
    from genomics_rs_tpu.suffixtree.native import gotoh_score_cpu_subst

    kim = Scores(
        SCORE_ARGS["s_match"],
        SCORE_ARGS["s_mismatch"],
        SCORE_ARGS["g"],
        SCORE_ARGS["h"],
        s_transition=-1,
    )
    kim_lut = kimura_byte_lut(kim)
    want_kim = {}
    for loc in (False, True):
        want_kim[loc] = [
            gotoh_score_cpu_subst(
                bytes(s1b[i][: ms[i]]),
                bytes(s2b[i][: ns[i]]),
                kim_lut,
                kim.g,
                kim.h,
                loc,
            )
            for i in range(B)
        ]

    def check_kim(name, got, loc):
        for i in range(B):
            w = want_kim[loc][i]
            g = (int(got[0][i]), int(got[1][i]), int(got[2][i]))
            ok = g == w
            status = "ok" if ok else f"MISMATCH got {g} want {w}"
            print(f"[smoke] {name} local={loc} pair{i}: {status}")
            if not ok:
                failures.append((name, loc, i, g, w))

    for loc in (False, True):
        got = _retry(
            lambda loc=loc: gotoh_scores_pallas_batch(
                s1b, s2b, ms, ns, kim, loc
            ),
            label="smoke kimura flat",
        )
        check_kim("kimura_flat", got, loc)
        got = _retry(
            lambda loc=loc: gotoh_scores_stream(
                s1b, s2b, ms, ns, kim, loc
            ),
            label="smoke kimura stream",
        )
        check_kim("kimura_stream", got, loc)

    # Full-matrix (protein) batch engine: BLOSUM62 scores on chip vs
    # the C++ LUT oracle (MXU subs planes + sheared wavefront scan).
    from genomics_rs_tpu.ops.gotoh_matrix import gotoh_scores_matrix
    from genomics_rs_tpu.ops.subst import blosum62

    b62 = blosum62()
    b62_lut = b62.byte_lut()
    aa20 = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    p1 = np.full((B, Lm), PAD_S1, np.uint8)
    p2 = np.full((B, Ln), PAD_S2, np.uint8)
    for i in range(B):
        p1[i, : ms[i]] = aa20[rng.integers(0, 20, ms[i])]
        p2[i, : ns[i]] = aa20[rng.integers(0, 20, ns[i])]
    for loc in (False, True):
        want_m = [
            gotoh_score_cpu_subst(
                bytes(p1[i][: ms[i]]),
                bytes(p2[i][: ns[i]]),
                b62_lut,
                kim.g,
                kim.h,
                loc,
            )
            for i in range(B)
        ]
        for eng in ("pallas", "scan", "stream"):
            got = _retry(
                lambda loc=loc, eng=eng: gotoh_scores_matrix(
                    p1,
                    p2,
                    ms,
                    ns,
                    b62,
                    g=kim.g,
                    h=kim.h,
                    is_local=loc,
                    engine=eng,
                ),
                label=f"smoke matrix {eng}",
            )
            for i in range(B):
                w = want_m[i]
                gv = (int(got[0][i]), int(got[1][i]), int(got[2][i]))
                ok = gv == w if loc else gv[0] == w[0]
                status = "ok" if ok else f"MISMATCH got {gv} want {w}"
                print(
                    f"[smoke] matrix_{eng} local={loc} pair{i}: {status}"
                )
                if not ok:
                    failures.append((f"matrix_{eng}", loc, i, gv, w))

    # Stream assembler (round 5): the fused Pallas build must produce
    # the XLA build's stream BYTE-FOR-BYTE on chip (pad pairs and
    # garbage windows included).
    from genomics_rs_tpu.ops.gotoh_matrix import (
        _alpha_bytes as _ab_m,
    )
    from genomics_rs_tpu.ops.gotoh_matrix import (
        _ext_matrix as _ext_m,
    )
    from genomics_rs_tpu.ops.gotoh_matrix_stream import (
        _mstream_build,
        _mstream_build_fast,
    )

    import jax.numpy as jnp

    abv, fb_m, _A_m = _ab_m(b62)
    ext_m = _ext_m(b62)
    akw = dict(
        B=B,
        Lm=int(p1.shape[1]),
        Ln=int(p2.shape[1]),
        A=int(ext_m.shape[0]),
        fallback=fb_m,
    )
    st_ref = _retry(
        lambda: np.asarray(
            _mstream_build(
                jnp.asarray(p1), jnp.asarray(p2), ms, ns,
                jnp.asarray(abv), jnp.asarray(ext_m), **akw,
            )
        ),
        label="smoke massemble ref",
    )
    st_got = _retry(
        lambda: np.asarray(
            _mstream_build_fast(
                jnp.asarray(p1), jnp.asarray(p2), ms, ns,
                jnp.asarray(abv), jnp.asarray(ext_m), **akw,
            )
        ),
        label="smoke massemble",
    )
    ok = np.array_equal(st_ref, st_got)
    print(f"[smoke] massemble: {'ok' if ok else 'MISMATCH'}")
    if not ok:
        failures.append(
            ("massemble", int((st_ref != st_got).sum()), 0, 0, 0)
        )

    # Matrix stream dirs (round 5): the 2-D packed stream fill + ONE
    # walk_many dispatch (word-row + lane offsets) must reproduce the
    # per-pair scan matrix aligner's alignments bit-for-bit on chip.
    from genomics_rs_tpu.models.aligner import (
        PairwiseAligner as _PA_m,
    )
    from genomics_rs_tpu.models.aligner import matrix_align_batch
    from genomics_rs_tpu.sequence import Sequence as _Seq_m

    mpairs = [
        (
            _Seq_m("q", bytes(p1[i][: ms[i]]).decode()),
            _Seq_m("r", bytes(p2[i][: ns[i]]).decode()),
        )
        for i in range(B)
    ]
    for loc in (False, True):
        got_b = _retry(
            lambda loc=loc: matrix_align_batch(
                mpairs, b62, g=kim.g, h=kim.h, is_local=loc
            ),
            label="smoke matrix stream dirs",
        )
        oracle_m = _PA_m(
            Scores(0, 0, kim.g, kim.h),
            is_local=loc,
            engine="scan",
            matrix=b62,
        )
        for i, ((a, bq), gm) in enumerate(zip(mpairs, got_b)):
            wm = oracle_m.align(a, bq)
            ok = (
                gm.alignment == wm.alignment
                and gm.score == wm.score
                and (
                    gm.matches,
                    gm.mismatches,
                    gm.gap_extensions,
                    gm.opening_gaps,
                )
                == (
                    wm.matches,
                    wm.mismatches,
                    wm.gap_extensions,
                    wm.opening_gaps,
                )
            )
            status = "ok" if ok else "MISMATCH"
            print(
                f"[smoke] matrix_stream_dirs local={loc} pair{i}: "
                f"{status}"
            )
            if not ok:
                failures.append(
                    ("matrix_stream_dirs", loc, i, gm.score, wm.score)
                )

    # Streamed dirs fill (round 4): one continuous wavefront emitting
    # packed direction words; per-segment slices walked by the device
    # walker must reproduce the monolithic pallas aligner's alignment
    # bit-for-bit (path, stats, score).
    from genomics_rs_tpu.models.aligner import PairwiseAligner
    from genomics_rs_tpu.ops.gotoh_stream import gotoh_stream_fill_dirs
    from genomics_rs_tpu.ops.traceback import classify_moves
    from genomics_rs_tpu.ops.traceback_device import device_walk
    from genomics_rs_tpu.sequence import Sequence

    # Kimura variant of the streamed dirs path (global mode): the
    # fill + walk + classify pipeline under transition scoring must
    # also match the monolithic kimura aligner (the consumers —
    # align_batch, the MSA star stage — inherit Scores verbatim).
    sres_k = _retry(
        lambda: gotoh_stream_fill_dirs(
            s1b, s2b, ms, ns, kim, is_local=False
        ),
        label="smoke stream dirs kimura",
    )
    if sres_k is None:
        print("[smoke] stream_dirs_kimura: unexpectedly inapplicable — FAIL")
        failures.append(("stream_dirs_kimura", False, 0, None, None))
    else:
        from genomics_rs_tpu.models.aligner import PairwiseAligner
        from genomics_rs_tpu.ops.traceback import classify_moves
        from genomics_rs_tpu.ops.traceback_device import device_walk
        from genomics_rs_tpu.sequence import Sequence

        mono_k = PairwiseAligner(kim, is_local=False)
        sci_k = np.asarray(sres_k.start_i)
        scj_k = np.asarray(sres_k.start_j)
        for i in range(B):
            q = Sequence("q", bytes(s1b[i][: ms[i]]).decode())
            r = Sequence("r", bytes(s2b[i][: ns[i]]).decode())
            want_k = mono_k.align(q, r)
            codes_k, fi, fj, done_k = device_walk(
                sres_k.segment_dirs(i),
                np.int32(sci_k[i]),
                np.int32(scj_k[i]),
                np.int32(0),
                max_steps=8192,
            )
            got_k = classify_moves(
                np.asarray(codes_k),
                int(sci_k[i]),
                int(scj_k[i]),
                int(np.asarray(sres_k.score)[i]),
                q,
                r,
            )
            ok = (
                bool(done_k)
                and (int(fi), int(fj)) == (0, 0)
                and got_k.alignment == want_k.alignment
                and got_k.score == want_k.score
            )
            print(
                f"[smoke] stream_dirs_kimura pair{i}: "
                f"{'ok' if ok else 'MISMATCH vs monolithic aligner'}"
            )
            if not ok:
                failures.append(("stream_dirs_kimura", False, i, None, None))

    for loc in (False, True):
        sres = _retry(
            lambda loc=loc: gotoh_stream_fill_dirs(
                s1b, s2b, ms, ns, scores, is_local=loc
            ),
            label="smoke stream dirs",
        )
        if sres is None:
            # The fixed smoke geometry can never hit the wrapper's
            # bail-outs (probe spacing >> CHUNK) — a None here means
            # the stream path silently stopped applying: FAIL.
            print(
                f"[smoke] stream_dirs local={loc}: unexpectedly "
                "inapplicable — FAIL"
            )
            failures.append(("stream_dirs_geometry", loc, 0, None, None))
            continue
        mono = PairwiseAligner(scores, is_local=loc)
        sci = np.asarray(sres.start_i)
        scj = np.asarray(sres.start_j)
        for i in range(B):
            q = Sequence("q", bytes(s1b[i][: ms[i]]).decode())
            r = Sequence("r", bytes(s2b[i][: ns[i]]).decode())
            want_sd = mono.align(q, r)
            codes_sd, fi, fj, done_sd = device_walk(
                sres.segment_dirs(i),
                np.int32(sci[i]),
                np.int32(scj[i]),
                np.int32(0),
                max_steps=8192,
            )
            got_sd = classify_moves(
                np.asarray(codes_sd),
                int(sci[i]),
                int(scj[i]),
                int(np.asarray(sres.score)[i]),
                q,
                r,
            )
            ok = (
                bool(done_sd)
                and (loc or (int(fi), int(fj)) == (0, 0))
                and got_sd.alignment == want_sd.alignment
                and got_sd.score == want_sd.score
                and (
                    got_sd.matches,
                    got_sd.mismatches,
                    got_sd.opening_gaps,
                    got_sd.gap_extensions,
                )
                == (
                    want_sd.matches,
                    want_sd.mismatches,
                    want_sd.opening_gaps,
                    want_sd.gap_extensions,
                )
            )
            print(
                f"[smoke] stream_dirs local={loc} pair{i}: "
                f"{'ok' if ok else 'MISMATCH vs monolithic aligner'}"
            )
            if not ok:
                failures.append(("stream_dirs", loc, i, None, None))

        # The one-dispatch batched walker must chase the same global
        # stream bitmap to identical move lists (it replaces the
        # per-segment device_walk dispatches in stream_walk_group).
        from genomics_rs_tpu.ops.gotoh_stream import PACK as _PACK
        from genomics_rs_tpu.ops.traceback_pallas import (
            unpack_moves,
            walk_many,
        )

        koffs = np.arange(B, dtype=np.int32) * (sres.L1 // _PACK)
        wm_words, wm_counts, wm_if, wm_jf, wm_done = _retry(
            lambda: walk_many(
                sres.dirs,
                sci.astype(np.int32),
                scj.astype(np.int32),
                koffs,
                KW=sres.KW,
                max_steps=8192,
            ),
            label="smoke walk_many",
        )
        for i in range(B):
            ref_codes, ri, rj, rdone = device_walk(
                sres.segment_dirs(i),
                np.int32(sci[i]),
                np.int32(scj[i]),
                np.int32(0),
                max_steps=8192,
            )
            got_codes = unpack_moves(
                np.asarray(wm_words)[i], int(wm_counts[i])
            )
            ok = (
                np.array_equal(got_codes, np.asarray(ref_codes))
                and (int(wm_if[i]), int(wm_jf[i]), bool(wm_done[i]))
                == (int(ri), int(rj), bool(rdone))
            )
            print(
                f"[smoke] walk_many local={loc} pair{i}: "
                f"{'ok' if ok else 'MISMATCH vs device_walk'}"
            )
            if not ok:
                failures.append(("walk_many", loc, i, None, None))

    # Lean forward row-block engine (score_long's rolling path),
    # multi-block (255-row blocks over a 384-row pair).
    from genomics_rs_tpu.models.longalign import score_long
    from genomics_rs_tpu.sequence import Sequence

    sa = Sequence("a", bytes(s1b[0][: ms[0]]).decode())
    sb = Sequence("b", bytes(s2b[0][: ns[0]]).decode())
    for loc in (False, True):
        got = _retry(
            lambda loc=loc: score_long(
                sa, sb, scores, loc, block_rows=255
            ),
            label="smoke rowblock",
        )
        w = want[loc][0]
        g = tuple(int(x) for x in got)
        ok = g == tuple(w)
        print(
            f"[smoke] rowblock_long local={loc}: "
            f"{'ok' if ok else f'MISMATCH got {g} want {w}'}"
        )
        if not ok:
            failures.append(("rowblock_long", loc, 0, g, w))

    # Short-read row-scan kernel (Lpad <= 256 on both sides).
    s1s = s1b[:, :256].copy()
    mss = np.minimum(ms, 250)
    for i in range(B):
        s1s[i, mss[i] :] = PAD_S1
    for loc in (False, True):
        got = _retry(
            lambda loc=loc: gotoh_scores_shortread(
                s1s, s2b, mss, ns, scores, loc
            ),
            label="smoke shortread",
        )
        want_sr = [
            gotoh_score_cpu(
                bytes(s1s[i][: mss[i]]),
                bytes(s2b[i][: ns[i]]),
                1,
                -2,
                -1,
                -5,
                loc,
            )
            for i in range(B)
        ]
        for i in range(B):
            g = (int(got[0][i]), int(got[1][i]), int(got[2][i]))
            ok = g == want_sr[i]
            print(
                f"[smoke] shortread local={loc} pair{i}: "
                f"{'ok' if ok else f'MISMATCH got {g} want {want_sr[i]}'}"
            )
            if not ok:
                failures.append(("shortread", loc, i, g, want_sr[i]))

    # Full read pipeline: packed-dirs short-read kernel + batched
    # device walk + vectorized classification, vs the scan engine
    # (paths, stats and CIGARs must be bit-identical).
    from genomics_rs_tpu.models.reads import align_reads, cigar
    from genomics_rs_tpu.sequence import Sequence as Seq

    rq = [Seq(f"q{i}", bytes(s1s[i][: mss[i]]).decode()) for i in range(B)]
    rr = [Seq(f"r{i}", bytes(s2b[i][: ns[i]]).decode()) for i in range(B)]
    for loc in (False, True):
        got_r = _retry(
            lambda loc=loc: align_reads(
                rq, rr, scores, is_local=loc, engine="pallas"
            ),
            label="smoke reads pipeline",
        )
        want_r = align_reads(rq, rr, scores, is_local=loc, engine="scan")
        for i in range(B):
            ok = (
                got_r[i].alignment == want_r[i].alignment
                and got_r[i].score == want_r[i].score
                and cigar(got_r[i]) == cigar(want_r[i])
                and (
                    got_r[i].matches,
                    got_r[i].mismatches,
                    got_r[i].gap_extensions,
                    got_r[i].opening_gaps,
                )
                == (
                    want_r[i].matches,
                    want_r[i].mismatches,
                    want_r[i].gap_extensions,
                    want_r[i].opening_gaps,
                )
            )
            print(
                f"[smoke] reads_pipeline local={loc} pair{i}: "
                f"{'ok' if ok else 'MISMATCH vs scan engine'}"
            )
            if not ok:
                failures.append(("reads_pipeline", loc, i, None, None))

    # Seed-and-extend mapper: device seeding + pallas extension vs
    # host seeding + scan extension on a small planted corpus.
    from genomics_rs_tpu.models.mapper import map_reads
    from genomics_rs_tpu.sequence import Sequence as _SeqM

    mref = _SeqM(
        "smokeref", "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    )
    comp_m = str.maketrans("ACGT", "TGCA")
    mreads = [
        _SeqM("sf", mref.sequence[500:590]),
        _SeqM("sr", mref.sequence[1200:1290].translate(comp_m)[::-1]),
        _SeqM("sn", "N" * 90),
    ]
    got_m = _retry(
        lambda: map_reads(
            mreads, mref, scores, k=15, engine="pallas",
            seed_engine="device",
        ),
        label="smoke mapper",
    )
    want_m = map_reads(
        mreads, mref, scores, k=15, engine="scan", seed_engine="host"
    )
    for i, (g, w) in enumerate(zip(got_m, want_m)):
        ok = (g.mapped, g.strand, g.score, g.mapinfo, g.cigar) == (
            w.mapped, w.strand, w.score, w.mapinfo, w.cigar,
        )
        print(f"[smoke] mapper read{i}: {'ok' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(("mapper", None, i, None, None))

    # Single-pair fill with dirs (the lean row-block dirs engine).
    # Scores/starts vs the C++ oracle; the packed direction words
    # themselves vs interpret mode cell-exactly over the true region
    # (a pack/flush miscompile would not move the score).
    for loc in (False, True):
        res = _retry(
            lambda loc=loc: gotoh_fill_pallas(
                s1b[0], s2b[0], ms[0], ns[0], scores, loc
            ),
            label="smoke fill",
        )
        w = want[loc][0]
        g = (int(res.score), int(res.start_i), int(res.start_j))
        ok = g[0] == w[0] and (not loc or g[1:] == w[1:])
        ref_dirs = gotoh_fill_pallas(
            s1b[0], s2b[0], ms[0], ns[0], scores, loc, interpret=True
        ).dirs
        got_d, ref_d = np.asarray(res.dirs), np.asarray(ref_dirs)
        m0, n0 = int(ms[0]), int(ns[0])
        kk = np.arange(got_d.shape[0])[:, None]
        ii = np.arange(got_d.shape[1])[None, :]
        valid = (ii <= m0) & (ii <= kk) & (kk - ii <= n0)
        dirs_ok = bool(np.array_equal(got_d[valid], ref_d[valid]))
        ok = ok and dirs_ok
        print(
            f"[smoke] fill_dirs local={loc}: "
            f"{'ok' if ok else f'MISMATCH got {g} want {w} dirs_ok={dirs_ok}'}"
        )
        if not ok:
            failures.append(("fill_dirs", loc, 0, g, w))

        # The aligner's real retrace: packed fill + ON-DEVICE walk,
        # classified on host — vs the host traceback over the
        # interpret-mode per-cell table.
        from genomics_rs_tpu.ops.traceback import (
            classify_moves,
            traceback_host,
        )
        from genomics_rs_tpu.ops.traceback_device import walk_block

        pres = _retry(
            lambda loc=loc: gotoh_fill_pallas(
                s1b[0], s2b[0], ms[0], ns[0], scores, loc, packed_dirs=True
            ),
            label="smoke packed fill",
        )
        moves, count, i_f, j_f, done = walk_block(
            pres.dirs,
            pres.start_i,
            pres.start_j,
            np.int32(0),
            max_steps=8192,
        )
        got_al = classify_moves(
            np.asarray(moves)[: int(count)],
            int(pres.start_i),
            int(pres.start_j),
            int(pres.score),
            sa,
            sb,
        )
        want_al = traceback_host(
            ref_d,
            int(res.start_i),
            int(res.start_j),
            int(res.score),
            sa,
            sb,
            loc,
        )
        walk_ok = bool(done) and (
            got_al.alignment == want_al.alignment
            and got_al.score == want_al.score
            and got_al.matches == want_al.matches
            and got_al.mismatches == want_al.mismatches
            and got_al.opening_gaps == want_al.opening_gaps
            and got_al.gap_extensions == want_al.gap_extensions
        )
        print(
            f"[smoke] packed_walk local={loc}: "
            f"{'ok' if walk_ok else 'MISMATCH vs host traceback'}"
        )
        if not walk_ok:
            failures.append(("packed_walk", loc, 0, None, None))

        # The Mosaic hardware-loop walker must chase the same packed
        # words to the identical move list (small max_steps forces
        # its internal resume loop on the chip too).
        from genomics_rs_tpu.ops.traceback_pallas import walk_full

        pcodes, pi_f, pj_f, pdone = _retry(
            lambda: walk_full(
                pres.dirs,
                int(pres.start_i),
                int(pres.start_j),
                0,
                max_steps=8192,
            ),
            label="smoke pallas walk",
        )
        pwalk_ok = (
            np.array_equal(pcodes, np.asarray(moves)[: int(count)])
            and (int(pi_f), int(pj_f), bool(pdone))
            == (int(i_f), int(j_f), bool(done))
        )
        print(
            f"[smoke] pallas_walk local={loc}: "
            f"{'ok' if pwalk_ok else 'MISMATCH vs walk_block'}"
        )
        if not pwalk_ok:
            failures.append(("pallas_walk", loc, 0, None, None))

    # Sequence-parallel pipeline (tile kernel w/ bottom+right) on the
    # 1-device mesh.
    from genomics_rs_tpu.parallel.longseq import sharded_gotoh_score
    from genomics_rs_tpu.parallel.mesh import SEQ_AXIS, make_mesh

    mesh = make_mesh(1, axis_name=SEQ_AXIS)
    for loc in (False, True):
        out = _retry(
            lambda loc=loc: sharded_gotoh_score(
                mesh,
                s1b[0],
                s2b[0],
                np.int32(ms[0]),
                np.int32(ns[0]),
                scores,
                loc,
                engine="pallas",
            ),
            label="smoke seqpar",
        )
        w = want[loc][0]
        if loc:
            g = tuple(int(x) for x in np.asarray(out.best))
            ok = g == w
        else:
            g = (int(out.score), int(ms[0]), int(ns[0]))
            ok = g[0] == w[0]
        print(
            f"[smoke] seqpar_pallas local={loc}: "
            f"{'ok' if ok else f'MISMATCH got {g} want {w}'}"
        )
        if not ok:
            failures.append(("seqpar_pallas", loc, 0, g, w))

    # Sharded data-parallel batch with a per-shard Pallas fill on a
    # 1-device mesh (the single-process multi-chip all-pairs path,
    # compiled — CPU tests only cover interpret mode).
    from genomics_rs_tpu.parallel.batch import (
        batch_scores_sharded,
        mesh_bucket_engine,
    )
    from genomics_rs_tpu.parallel.mesh import make_mesh

    dmesh = make_mesh(1)
    for loc in (False, True):
        eng = mesh_bucket_engine("auto", Lm, Ln, loc)
        out = _retry(
            lambda loc=loc, eng=eng: batch_scores_sharded(
                dmesh, s1b, s2b, ms, ns, scores, loc, engine=eng
            ),
            label="smoke sharded batch",
        )
        for i in range(B):
            w = want[loc][i]
            g = (
                int(np.asarray(out.score)[i]),
                int(np.asarray(out.start_i)[i]),
                int(np.asarray(out.start_j)[i]),
            )
            ok = g[0] == w[0] and (not loc or g[1:] == w[1:])
            print(
                f"[smoke] sharded_batch[{eng}] local={loc} pair{i}: "
                f"{'ok' if ok else f'MISMATCH got {g} want {w}'}"
            )
            if not ok:
                failures.append(("sharded_batch", loc, i, g, w))

    # Windowed checkpointed traceback (stride-V column checkpoints,
    # compiled rowblock fills + left-exit device walks) vs the
    # monolithic pallas aligner on the same pair — path, stats and
    # score must be bit-identical (the chr12 full-alignment path in
    # miniature; block_rows=1023 puts the walk into jc>0 windows
    # whenever the pair is wider than 2048).
    from genomics_rs_tpu.models.aligner import PairwiseAligner
    from genomics_rs_tpu.models.longalign import align_checkpointed

    for loc in (False, True):
        want_h = PairwiseAligner(scores, is_local=loc).align(sa, sb)
        got_h = _retry(
            lambda loc=loc: align_checkpointed(
                sa, sb, scores, is_local=loc, block_rows=1023
            ),
            label="smoke windowed",
        )
        ok = (
            got_h.alignment == want_h.alignment
            and got_h.score == want_h.score
            and (
                got_h.matches,
                got_h.mismatches,
                got_h.opening_gaps,
                got_h.gap_extensions,
            )
            == (
                want_h.matches,
                want_h.mismatches,
                want_h.opening_gaps,
                want_h.gap_extensions,
            )
        )
        print(
            f"[smoke] hier_traceback local={loc}: "
            f"{'ok' if ok else 'MISMATCH vs monolithic aligner'}"
        )
        if not ok:
            failures.append(("hier_traceback", loc, 0, None, None))

    # Windowed backward with jc > 0 on hardware: a 2100 x 2600 pair
    # at block_rows=1023 (V=1024) forces captured-column left
    # boundaries and (for the deletion-heavy pair below) a LEFT
    # window exit — compiled, against the monolithic aligner.
    rng_w = np.random.default_rng(41)
    aw = "".join(rng_w.choice(list("ACGT"), 2100))
    bw = aw[:1000] + "".join(rng_w.choice(list("ACGT"), 500)) + aw[1000:]
    for loc in (False, True):
        sw1, sw2 = Sequence("wa", aw), Sequence("wb", bw)
        want_w = PairwiseAligner(scores, is_local=loc).align(sw1, sw2)
        got_w = _retry(
            lambda loc=loc: align_checkpointed(
                sw1, sw2, scores, is_local=loc, block_rows=1023
            ),
            label="smoke windowed jc>0",
        )
        ok = (
            got_w.alignment == want_w.alignment
            and got_w.score == want_w.score
        )
        print(
            f"[smoke] windowed_traceback local={loc}: "
            f"{'ok' if ok else 'MISMATCH vs monolithic aligner'}"
        )
        if not ok:
            failures.append(("windowed_traceback", loc, 0, None, None))

    # Banded global alignment (compiled): with band >= n the band
    # covers the whole matrix and the output must be bit-identical to
    # the monolithic pallas aligner on the same pair.
    from genomics_rs_tpu.models.banded import align_banded

    ba, bb = (sa, sb) if len(sb) <= len(sa) else (sb, sa)
    want_b = PairwiseAligner(scores).align(ba, bb)
    got_b = _retry(
        lambda: align_banded(ba, bb, scores, band=1024),
        label="smoke banded",
    )
    ok = (
        got_b.alignment == want_b.alignment
        and got_b.score == want_b.score
        and (
            got_b.matches,
            got_b.mismatches,
            got_b.opening_gaps,
            got_b.gap_extensions,
        )
        == (
            want_b.matches,
            want_b.mismatches,
            want_b.opening_gaps,
            want_b.gap_extensions,
        )
    )
    print(
        f"[smoke] banded_full_cover: "
        f"{'ok' if ok else 'MISMATCH vs monolithic aligner'}"
    )
    if not ok:
        failures.append(("banded_full_cover", False, 0, None, None))

    # Batched banded (round 5): 8 pairs per pane, shared window; with
    # W >= n the outputs must be bit-identical to the monolithic
    # aligner per pair.
    from genomics_rs_tpu.ops.gotoh_banded_batch import (
        banded_align_batch,
    )
    from genomics_rs_tpu.ops.traceback import (
        classify_moves as _cm_bb,
    )

    brng = np.random.default_rng(19)
    bbase = bases[brng.integers(0, 4, 300)]
    bs1, bs2 = [], []
    for _ in range(5):
        mutb = bbase.copy()
        for _ in range(8):
            mutb[brng.integers(0, 300)] = bases[brng.integers(0, 4)]
        mutb = np.delete(mutb, brng.integers(0, 290))
        bs1.append(bytes(bbase).decode())
        bs2.append(bytes(mutb).decode())
    from genomics_rs_tpu.sequence import Sequence as _SeqBB

    bb1 = np.stack(
        [
            _SeqBB("a", s).encoded(pad_to=384, pad_value=PAD_S1)
            for s in bs1
        ]
    )
    bb2 = np.stack(
        [
            _SeqBB("b", s).encoded(pad_to=384, pad_value=PAD_S2)
            for s in bs2
        ]
    )
    bms = np.array([len(s) for s in bs1], np.int32)
    bns = np.array([len(s) for s in bs2], np.int32)
    got_bb = _retry(
        lambda: banded_align_batch(bb1, bb2, bms, bns, scores, W=384),
        label="smoke banded batch",
    )
    for i, (sc_i, mv_i) in enumerate(got_bb):
        a = _SeqBB("a", bs1[i])
        b = _SeqBB("b", bs2[i])
        want_i = PairwiseAligner(scores).align(a, b)
        got_i = _cm_bb(
            np.asarray(mv_i), int(bms[i]), int(bns[i]), sc_i, a, b
        )
        ok = (
            got_i.alignment == want_i.alignment
            and got_i.score == want_i.score
        )
        print(
            f"[smoke] banded_batch pair{i}: "
            f"{'ok' if ok else 'MISMATCH'}"
        )
        if not ok:
            failures.append(("banded_batch", False, i, None, None))

    if failures:
        print(f"[smoke] FAILED: {len(failures)} mismatches", file=sys.stderr)
        return 1
    print("[smoke] all kernels match the C++ oracle on hardware")
    return 0


def _probe_device(timeout_s: int = 420) -> None:
    """Fail fast if the accelerator is unreachable.

    The axon tunnel in this environment goes down for stretches during
    which ``jax.devices()`` hangs indefinitely (no timeout of its own).
    Probe in a subprocess with a bound so a scheduled bench run during
    an outage exits nonzero with a clear message instead of hanging —
    a missing BENCH record is better than a silent multi-hour stall
    (and throughput measured through a degraded tunnel is noise).
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench: device probe hung >{timeout_s}s — accelerator "
            "tunnel down; rerun when it recovers",
            file=sys.stderr,
        )
        sys.exit(3)
    if r.returncode != 0:
        print(
            "bench: device probe failed:\n"
            + r.stderr.decode(errors="replace")[-2000:],
            file=sys.stderr,
        )
        sys.exit(3)


def main() -> None:
    from genomics_rs_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    _probe_device()

    if "--smoke" in sys.argv:
        sys.exit(run_smoke())

    # Driver contract: stdout carries EXACTLY one JSON line. Progress
    # prints from any depth (spinners, [full] rows, library logging)
    # go to stderr for the duration — round 4's BENCH_r04.json had
    # "parsed": null because interleaved progress broke the parse.
    real_stdout = sys.stdout
    sys.stdout = sys.stderr
    try:
        if "--full" in sys.argv:
            rows = run_full()
            print(json.dumps(rows, indent=1), file=sys.stderr)

        h = run_headline()
    finally:
        sys.stdout = real_stdout
    rows = None
    full_path = os.path.join(REPO, "BENCH_FULL.json")
    if os.path.exists(full_path):
        try:
            with open(full_path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            rows = None

    roof = h["roofline"]
    print(
        json.dumps(
            {
                "metric": (
                    "Gotoh DP cell-updates/sec/chip: all-pairs 10-genome "
                    f"corpus ({h['pairs']} pairs, {h['cells']:.3g} cells, "
                    "streamed multi-segment kernel, one continuous "
                    f"wavefront, fill {h['batch_ms']:.0f} ms, sample score "
                    f"{h['sample_score']}); roofline {roof['alu_ops_per_cell']}"
                    f" ALU ops/cell incl {roof['ramp_factor']}x residual ramp"
                    f" = {roof['pct_of_vpu_peak_alu']}% of v5e VPU peak ALU"
                    f" ({roof['vpu_peak_ops_per_s']:.3g} int32 op/s), "
                    f"{roof['pct_of_vpu_peak_slots']}% counting VMEM ld/st"
                    " issue slots;"
                    " CPU baseline (native/gotoh_cpu.cpp, 1 core) "
                    f"{h['cpu_baseline_cells_per_s']:.3g} cells/s"
                ),
                "value": h["cells_per_s"],
                "unit": "cells/s",
                "vs_baseline": h["vs_baseline"],
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
