"""Tests for the 2-D packed continuous-stream matrix kernel
(``ops/gotoh_matrix_stream``) and its consumers.

Oracles: the lax.scan matrix engine (``gotoh_matrix._matrix_scores_call``
— itself pinned against the int64 numpy fill and the C++ LUT oracle in
``test_subst.py``) and the per-pair scan aligner for full alignments.
The kernel runs in interpret mode here; ``bench.py --smoke`` runs the
same parities on real hardware (``matrix_stream`` rows).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.models.aligner import PairwiseAligner, matrix_align_batch
from genomics_rs_tpu.ops.gotoh_matrix import gotoh_scores_matrix
from genomics_rs_tpu.ops.gotoh_matrix_stream import (
    _plan_mstream,
    gotoh_matrix_stream_fill_dirs,
    gotoh_scores_matrix_stream,
)
from genomics_rs_tpu.ops.subst import blosum62, dna_matrix
from genomics_rs_tpu.ops.traceback_device import device_walk
from genomics_rs_tpu.ops.traceback_pallas import unpack_moves, walk_many
from genomics_rs_tpu.sequence import Sequence

PROT = "ARNDCQEGHILKMFPSTWYV"


def _prot_batch(rng, B, Lm, Ln, lo=5):
    s1b = np.frombuffer(
        "".join(
            "".join(rng.choice(list(PROT), Lm)) for _ in range(B)
        ).encode(),
        np.uint8,
    ).reshape(B, Lm).copy()
    s2b = np.frombuffer(
        "".join(
            "".join(rng.choice(list(PROT), Ln)) for _ in range(B)
        ).encode(),
        np.uint8,
    ).reshape(B, Ln).copy()
    ms = rng.integers(lo, Lm + 1, B).astype(np.int32)
    ns = rng.integers(lo, Ln + 1, B).astype(np.int32)
    return s1b, s2b, ms, ns


class TestPlan:
    def test_geometry_invariants(self):
        for Lm, Ln, B, vt in [
            (40, 35, 7, 512),
            (383, 383, 100, 12288),
            (120, 500, 3, 1024),
            (1000, 100, 5, 2048),
            (5, 5, 1, None),
        ]:
            S, G, V, C, L1, T, K, Kp = _plan_mstream(Lm, Ln, B, vt)
            assert S >= Lm + 1 and S % 128 == 0
            assert G >= 1 and G * T >= B
            assert V % 1024 == 0 and V >= G * S
            assert L1 >= Ln + 1 and L1 >= S + 128 and L1 % 128 == 0
            assert Lm + Ln + 1 <= L1 + S  # two-window overlay bound
            assert Kp % 128 == 0 and Kp >= K == T * L1 + S


class TestScores:
    @pytest.mark.parametrize("is_local", [False, True])
    def test_vs_scan_blosum(self, is_local):
        rng = np.random.default_rng(10)
        mat = blosum62()
        s1b, s2b, ms, ns = _prot_batch(rng, 9, 60, 45)
        ref = gotoh_scores_matrix(
            s1b, s2b, ms, ns, mat, -1, -5, is_local=is_local,
            engine="scan",
        )
        out = gotoh_scores_matrix_stream(
            s1b, s2b, ms, ns, mat, -1, -5, is_local=is_local,
            interpret=True, vtarget=512,
        )
        assert out is not None
        for k in range(3):
            np.testing.assert_array_equal(
                np.asarray(out[k]), np.asarray(ref[k])
            )

    @pytest.mark.parametrize("is_local", [False, True])
    def test_fuzz_shapes(self, is_local):
        rng = np.random.default_rng(11)
        mat = blosum62()
        for B, Lm, Ln, vt in [
            (1, 30, 30, 512),  # G = 1, T = 1
            (2, 30, 90, 256),  # G = 1 chain of 2
            (5, 30, 30, 640),  # G = 5 (one chain position each)
            (7, 33, 61, 384),  # G = 3, T = 3 with padding pairs
        ]:
            s1b, s2b, ms, ns = _prot_batch(rng, B, Lm, Ln, lo=1)
            ref = gotoh_scores_matrix(
                s1b, s2b, ms, ns, mat, -2, -3, is_local=is_local,
                engine="scan",
            )
            out = gotoh_scores_matrix_stream(
                s1b, s2b, ms, ns, mat, -2, -3, is_local=is_local,
                interpret=True, vtarget=vt,
            )
            assert out is not None, (B, Lm, Ln)
            for k in range(3):
                np.testing.assert_array_equal(
                    np.asarray(out[k]),
                    np.asarray(ref[k]),
                    err_msg=f"B={B} Lm={Lm} Ln={Ln} k={k}",
                )

    def test_dna_matrix_bridge_matches_char_scores(self):
        # dna_matrix(scores) under the stream engine == the classic
        # two-score scan fill on DNA bytes.
        from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan

        rng = np.random.default_rng(12)
        sc = Scores(s_match=2, s_mismatch=-3, g=-2, h=-4)
        mat = dna_matrix(sc)
        B, Lm, Ln = 4, 48, 40
        s1b = np.frombuffer(
            "".join(
                "".join(rng.choice(list("ACGT"), Lm)) for _ in range(B)
            ).encode(),
            np.uint8,
        ).reshape(B, Lm).copy()
        s2b = np.frombuffer(
            "".join(
                "".join(rng.choice(list("ACGT"), Ln)) for _ in range(B)
            ).encode(),
            np.uint8,
        ).reshape(B, Ln).copy()
        ms = rng.integers(10, Lm + 1, B).astype(np.int32)
        ns = rng.integers(10, Ln + 1, B).astype(np.int32)
        out = gotoh_scores_matrix_stream(
            s1b, s2b, ms, ns, mat, sc.g, sc.h, interpret=True,
            vtarget=512,
        )
        assert out is not None
        for b in range(B):
            fr = gotoh_fill_scan(
                jnp.asarray(s1b[b]),
                jnp.asarray(s2b[b]),
                int(ms[b]),
                int(ns[b]),
                sc,
                False,
                emit_dirs=False,
            )
            assert int(np.asarray(out[0])[b]) == int(fr.score)

    def test_large_batches_route_grouped(self, monkeypatch):
        # B >= STREAM_GROUPED_MIN_B routes the public wrapper through
        # the grouped single-dispatch call — values must match scan.
        import genomics_rs_tpu.ops.gotoh_matrix as gm

        monkeypatch.setattr(gm, "STREAM_GROUPED_MIN_B", 16)
        rng = np.random.default_rng(14)
        mat = blosum62()
        s1b, s2b, ms, ns = _prot_batch(rng, 20, 40, 40)
        ref = gotoh_scores_matrix(
            s1b, s2b, ms, ns, mat, -1, -5, engine="scan"
        )
        for loc in (False, True):
            refl = gotoh_scores_matrix(
                s1b, s2b, ms, ns, mat, -1, -5, engine="scan",
                is_local=loc,
            )
            out = gotoh_scores_matrix(
                s1b, s2b, ms, ns, mat, -1, -5, engine="stream",
                is_local=loc, interpret=True,
            )
            for k in range(3):
                np.testing.assert_array_equal(
                    np.asarray(out[k]), np.asarray(refl[k])
                )

    def test_auto_engine_routes_stream(self, monkeypatch):
        # engine="stream" through the public wrapper returns the same
        # values as scan.
        rng = np.random.default_rng(13)
        mat = blosum62()
        s1b, s2b, ms, ns = _prot_batch(rng, 8, 40, 40)
        ref = gotoh_scores_matrix(
            s1b, s2b, ms, ns, mat, -1, -5, engine="scan"
        )
        out = gotoh_scores_matrix(
            s1b, s2b, ms, ns, mat, -1, -5, engine="stream",
            interpret=True,
        )
        for k in range(3):
            np.testing.assert_array_equal(
                np.asarray(out[k]), np.asarray(ref[k])
            )


class TestDirs:
    @pytest.mark.parametrize("is_local", [False, True])
    def test_walks_match_scan_aligner(self, is_local):
        rng = np.random.default_rng(20)
        mat = blosum62()
        pairs = []
        for k in range(6):
            la = int(rng.integers(15, 100))
            lb = int(rng.integers(15, 100))
            pairs.append(
                (
                    Sequence(f"a{k}", "".join(rng.choice(list(PROT), la))),
                    Sequence(f"b{k}", "".join(rng.choice(list(PROT), lb))),
                )
            )
        outs = matrix_align_batch(
            pairs, mat, -1, -5, is_local=is_local, interpret=True
        )
        oracle = PairwiseAligner(
            Scores(0, 0, -1, -5),
            is_local=is_local,
            engine="scan",
            matrix=mat,
        )
        for (a, b), got in zip(pairs, outs):
            ref = oracle.align(a, b)
            assert got.alignment == ref.alignment
            assert got.score == ref.score
            assert (
                got.matches,
                got.mismatches,
                got.gap_extensions,
                got.opening_gaps,
            ) == (
                ref.matches,
                ref.mismatches,
                ref.gap_extensions,
                ref.opening_gaps,
            )

    def test_walk_many_lane_offsets_match_sliced_walks(self):
        rng = np.random.default_rng(21)
        mat = blosum62()
        B, Lm, Ln = 3, 270, 270
        s1b, s2b, ms, ns = _prot_batch(rng, B, Lm, Ln, lo=200)
        res = gotoh_matrix_stream_fill_dirs(
            s1b, s2b, ms, ns, mat, -1, -5, interpret=True, vtarget=768
        )
        assert res is not None
        assert res.G > 1  # exercises a nonzero lane offset
        koffs = np.array([res.koff(p) for p in range(B)], np.int32)
        loffs = np.array([res.loff(p) for p in range(B)], np.int32)
        words, counts, _, _, dones = jax.device_get(
            walk_many(
                res.dirs,
                res.start_i.astype(np.int32),
                res.start_j.astype(np.int32),
                koffs,
                KW=res.KW,
                max_steps=1024,
                interpret=True,
                loffs=loffs,
            )
        )
        for p in range(B):
            assert bool(dones[p])
            codes, _, _, done = device_walk(
                res.segment_dirs(p),
                np.int32(res.start_i[p]),
                np.int32(res.start_j[p]),
                np.int32(0),
                max_steps=1024,
                interpret=True,
            )
            assert bool(done)
            np.testing.assert_array_equal(
                unpack_moves(words[p], int(counts[p])),
                np.asarray(codes),
            )


class TestMSA:
    def test_matrix_msa_stream_matches_scan(self):
        from genomics_rs_tpu.models.msa import center_star_msa
        from genomics_rs_tpu.sequence import SequenceContainer

        rng = np.random.default_rng(22)
        cont = SequenceContainer()
        base = "".join(rng.choice(list(PROT), 90))
        for k in range(5):
            s = list(base)
            for _ in range(rng.integers(2, 9)):
                p = int(rng.integers(0, len(s)))
                s[p] = str(rng.choice(list(PROT)))
            cont.sequences.append(Sequence(f"p{k}", "".join(s)))
        sc = Scores(s_match=0, s_mismatch=0, g=-1, h=-5)
        mat = blosum62()
        # interpret=True drives the stream batch path; interpret=False
        # on CPU falls back to the per-pair scan aligner.
        a = center_star_msa(cont, sc, matrix=mat, interpret=True)
        b = center_star_msa(cont, sc, matrix=mat, interpret=False)
        assert a.rows == b.rows
        np.testing.assert_array_equal(a.score_matrix, b.score_matrix)


class TestAssembler:
    def test_fused_build_matches_xla_build(self):
        # The Pallas stream assembler must produce the EXACT stream
        # bytes of the XLA build (pad pairs and garbage windows
        # included) across lane-block / pane-row geometries.
        from genomics_rs_tpu.ops.gotoh_matrix import (
            _alpha_bytes,
            _ext_matrix,
        )
        from genomics_rs_tpu.ops.gotoh_matrix_stream import (
            _mstream_build,
            _mstream_build_fast,
        )

        rng = np.random.default_rng(25)
        mat = blosum62()
        ab, fallback, A = _alpha_bytes(mat)
        ext = _ext_matrix(mat)
        for B, Lm, Ln, vt in [
            (9, 60, 45, 512),  # S=128, one lane block, Gr=1
            (20, 33, 61, 1024),  # T=3 chains
            (5, 200, 300, 4096),  # S=256, nlb=2
            (10, 250, 250, 6144),  # S=256, Gr=3, nlb=2
        ]:
            s1b, s2b, ms, ns = _prot_batch(rng, B, Lm, Ln, lo=1)
            ref = np.asarray(
                _mstream_build(
                    jnp.asarray(s1b), jnp.asarray(s2b), ms, ns,
                    jnp.asarray(ab), jnp.asarray(ext),
                    B=B, Lm=Lm, Ln=Ln, A=A, fallback=fallback,
                    vtarget=vt,
                )
            )
            got = np.asarray(
                _mstream_build_fast(
                    jnp.asarray(s1b), jnp.asarray(s2b), ms, ns,
                    jnp.asarray(ab), jnp.asarray(ext),
                    B=B, Lm=Lm, Ln=Ln, A=A, fallback=fallback,
                    vtarget=vt, interpret=True,
                )
            )
            np.testing.assert_array_equal(
                got, ref, err_msg=f"B={B} Lm={Lm} Ln={Ln} vt={vt}"
            )


class TestLockstepWalks:
    @pytest.mark.parametrize("is_local", [False, True])
    def test_large_batch_uses_lockstep_walker(self, is_local):
        # B >= 16 routes the walks through the lockstep vector walker
        # (walk_batch diag16) — outputs must stay bit-identical to the
        # per-pair scan aligner.
        rng = np.random.default_rng(24)
        pairs = []
        for k in range(18):
            la = int(rng.integers(10, 80))
            lb = int(rng.integers(10, 80))
            pairs.append(
                (
                    Sequence(f"a{k}", "".join(rng.choice(list(PROT), la))),
                    Sequence(f"b{k}", "".join(rng.choice(list(PROT), lb))),
                )
            )
        mat = blosum62()
        outs = matrix_align_batch(
            pairs, mat, -1, -5, is_local=is_local, interpret=True
        )
        oracle = PairwiseAligner(
            Scores(0, 0, -1, -5),
            is_local=is_local,
            engine="scan",
            matrix=mat,
        )
        for (a, b), got in zip(pairs, outs):
            ref = oracle.align(a, b)
            assert got.alignment == ref.alignment
            assert got.score == ref.score
