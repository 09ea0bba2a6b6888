"""Substitution-scoring extensions: kimura transitions + full matrices.

TPU-framework capability beyond the reference's two-score model
(``/root/reference/src/config.rs:6-18``); cross-checked oracle vs
oracle vs kernels, plus the classic path's invariance.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.ops.gotoh_numpy import gotoh_tables_numpy
from genomics_rs_tpu.ops.gotoh_scan import gotoh_fill_scan
from genomics_rs_tpu.ops.subst import (
    KIMURA_ENC,
    SubstMatrix,
    blosum62,
    dna_matrix,
    get_matrix,
    kimura_active,
    load_matrix_file,
    sub_score_np,
)
from genomics_rs_tpu.sequence import PAD_S1, PAD_S2, Sequence

KIM = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5, s_transition=-1)
CLASSIC = Scores(s_match=1, s_mismatch=-2, g=-1, h=-5)


def _scan_score(a: str, b: str, scores, is_local, subst_lut=None) -> int:
    s1 = Sequence(name="a", sequence=a).encoded(pad_to=len(a) + 2)
    s2 = Sequence(name="b", sequence=b).encoded(
        pad_to=len(b) + 3, pad_value=PAD_S2
    )
    res = gotoh_fill_scan(
        jnp.asarray(s1),
        jnp.asarray(s2),
        len(a),
        len(b),
        scores,
        is_local,
        emit_dirs=False,
        subst_lut=None if subst_lut is None else jnp.asarray(subst_lut),
    )
    return int(res.score)


def _numpy_score(a: str, b: str, scores, is_local, matrix=None) -> int:
    I, S, D = gotoh_tables_numpy(a, b, scores, is_local, matrix=matrix)
    if is_local:
        return int(max(0, I.max(), S.max(), D.max()))
    return int(max(I[-1, -1], S[-1, -1], D[-1, -1]))


class TestKimuraEncoding:
    def test_acgt_codes(self):
        assert [KIMURA_ENC[ord(c)] for c in "AGCT"] == [0, 2, 1, 3]

    def test_injective(self):
        assert len(set(KIMURA_ENC.tolist())) == 256

    def test_transitions_only_for_acgt(self):
        # x ^ y == 2 exactly for the two transition pairs.
        enc = KIMURA_ENC
        pairs = {
            (i, j)
            for i in range(256)
            for j in range(256)
            if (int(enc[i]) ^ int(enc[j])) == 2
        }
        expected = {
            (ord(a), ord(b))
            for a, b in [("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")]
        }
        assert pairs == expected

    def test_pad_bytes_stay_distinct(self):
        assert KIMURA_ENC[PAD_S1] != KIMURA_ENC[PAD_S2]
        assert (int(KIMURA_ENC[PAD_S1]) ^ int(KIMURA_ENC[PAD_S2])) != 2

    def test_sub_score_np(self):
        got = sub_score_np(
            np.frombuffer(b"AAAA", dtype=np.uint8),
            np.frombuffer(b"AGCN", dtype=np.uint8),
            5,
            -4,
            -1,
        )
        assert got.tolist() == [5, -1, -4, -4]


class TestKimuraOracles:
    def test_single_char_transition(self):
        # A vs G global: one substitution at transition cost.
        assert _scan_score("A", "G", KIM, False) == -1
        assert _numpy_score("A", "G", KIM, False) == -1

    def test_single_char_transversion(self):
        assert _scan_score("A", "C", KIM, False) == -2
        assert _numpy_score("A", "C", KIM, False) == -2

    def test_classic_unchanged_when_st_equals_sx(self):
        st_eq = Scores(1, -2, -1, -5, s_transition=-2)
        rng = np.random.default_rng(7)
        for _ in range(5):
            a = "".join(rng.choice(list("ACGT"), size=30))
            b = "".join(rng.choice(list("ACGT"), size=25))
            for loc in (False, True):
                assert _scan_score(a, b, st_eq, loc) == _scan_score(
                    a, b, CLASSIC, loc
                )

    @pytest.mark.parametrize("is_local", [False, True])
    def test_scan_vs_numpy_fuzz(self, is_local):
        rng = np.random.default_rng(11)
        for _ in range(8):
            a = "".join(rng.choice(list("ACGTN"), size=int(rng.integers(5, 40))))
            b = "".join(rng.choice(list("ACGTN"), size=int(rng.integers(5, 40))))
            s = Scores(
                int(rng.integers(1, 4)),
                int(rng.integers(-5, -1)),
                int(rng.integers(-3, 0)),
                int(rng.integers(-7, -1)),
                s_transition=int(rng.integers(-4, 0)),
            )
            assert _scan_score(a, b, s, is_local) == _numpy_score(
                a, b, s, is_local
            )

    def test_transition_rich_pair_beats_classic(self):
        # Gap-unaffordable scoring forces the substitutions, so the
        # all-transition pair scores 2*st vs 2*sx — pins that st is
        # actually applied (not just plumbed).
        kim = Scores(1, -2, -1, -50, s_transition=-1)
        classic = Scores(1, -2, -1, -50)
        a, b = "AG", "GA"
        assert _scan_score(a, b, kim, False) == -2
        assert _scan_score(a, b, classic, False) == -4


class TestSubstMatrix:
    def test_blosum62_shape_and_symmetry(self):
        m = blosum62()
        assert m.matrix.shape == (24, 24)
        assert np.array_equal(m.matrix, m.matrix.T)
        al = m.alphabet
        assert m.matrix[al.index("W"), al.index("W")] == 11

    def test_byte_lut_unknown_maps_to_X(self):
        m = blosum62()
        lut = m.byte_lut()
        al = m.alphabet
        xa = m.matrix[al.index("X"), al.index("A")]
        assert lut[ord("J"), ord("A")] == xa  # J not in the alphabet
        assert lut[ord("A"), ord("A")] == 4

    def test_byte_lut_no_wildcard_uses_min(self):
        m = SubstMatrix("AB", np.array([[2, -1], [-1, 3]], dtype=np.int32))
        lut = m.byte_lut()
        assert lut[ord("Z"), ord("A")] == -1
        assert lut[ord("A"), ord("B")] == -1
        assert lut[ord("B"), ord("B")] == 3

    def test_dna_matrix_equals_kimura(self):
        lut = dna_matrix(KIM).byte_lut()
        rng = np.random.default_rng(3)
        for _ in range(4):
            a = "".join(rng.choice(list("ACGT"), size=20))
            b = "".join(rng.choice(list("ACGT"), size=24))
            for loc in (False, True):
                via_matrix = _scan_score(
                    a, b, CLASSIC, loc, subst_lut=lut
                )
                via_kimura = _scan_score(a, b, KIM, loc)
                assert via_matrix == via_kimura

    def test_matrix_numpy_vs_scan(self):
        m = blosum62()
        lut = m.byte_lut()
        rng = np.random.default_rng(5)
        aa = list("ARNDCQEGHILKMFPSTWYV")
        for _ in range(4):
            a = "".join(rng.choice(aa, size=int(rng.integers(8, 30))))
            b = "".join(rng.choice(aa, size=int(rng.integers(8, 30))))
            for loc in (False, True):
                assert _scan_score(
                    a, b, CLASSIC, loc, subst_lut=lut
                ) == _numpy_score(a, b, CLASSIC, loc, matrix=m)

    def test_known_blosum_global(self):
        # Hand-derivable: identical peptides score the sum of their
        # diagonal entries.
        pep = "WHW"
        m = blosum62()
        expect = 11 + 8 + 11
        assert _scan_score(pep, pep, CLASSIC, False, subst_lut=m.byte_lut()) == expect

    def test_lut_exclusive_with_transition(self):
        with pytest.raises(ValueError, match="mutually exclusive"):
            _scan_score("A", "A", KIM, False, subst_lut=blosum62().byte_lut())


class TestMatrixIO:
    def test_ncbi_round_trip(self, tmp_path):
        m = blosum62()
        p = tmp_path / "b62.mat"
        lines = ["# test matrix", "   " + "  ".join(m.alphabet)]
        for i, ch in enumerate(m.alphabet):
            lines.append(
                ch + " " + " ".join(str(v) for v in m.matrix[i])
            )
        p.write_text("\n".join(lines) + "\n")
        m2 = load_matrix_file(str(p))
        assert m2.alphabet == m.alphabet
        assert np.array_equal(m2.matrix, m.matrix)

    def test_get_matrix_builtin(self):
        assert get_matrix("blosum62").name == "BLOSUM62"

    def test_bad_header(self, tmp_path):
        p = tmp_path / "bad.mat"
        p.write_text("AB CD\nA 1 2\n")
        with pytest.raises(ValueError):
            load_matrix_file(str(p))

    def test_row_mismatch(self, tmp_path):
        p = tmp_path / "bad2.mat"
        p.write_text("A B\nA 1 2\nC 3 4\n")
        with pytest.raises(ValueError):
            load_matrix_file(str(p))


class TestConfig:
    def test_toml_transition_key(self, tmp_path):
        p = tmp_path / "c.toml"
        p.write_text(
            "[scores]\ns_match = 1\ns_mismatch = -2\ng = -1\nh = -5\n"
            "s_transition = -1\n"
        )
        from genomics_rs_tpu.config import get_config

        cfg = get_config(str(p))
        assert cfg.scores.s_transition == -1
        assert kimura_active(cfg.scores)

    def test_toml_without_transition(self, tmp_path):
        p = tmp_path / "c.toml"
        p.write_text("[scores]\ns_match = 1\ns_mismatch = -2\ng = -1\nh = -5\n")
        from genomics_rs_tpu.config import get_config

        assert get_config(str(p)).scores.s_transition is None

    def test_as_tuple_roundtrip(self):
        assert Scores(*KIM.as_tuple()) == KIM
        assert Scores(*CLASSIC.as_tuple()) == CLASSIC
        assert len(CLASSIC.as_tuple()) == 4
