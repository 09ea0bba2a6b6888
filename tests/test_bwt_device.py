"""Device suffix-array BWT vs the reference golden BWT files and the
suffix-tree implementations."""

import numpy as np
import pytest

from genomics_rs_tpu.ops.bwt_device import bwt_device, suffix_array
from genomics_rs_tpu.sequence import SequenceContainer

from conftest import reference_path


def _golden_bwt(fname: str) -> str:
    with open(reference_path("BWTs", fname)) as f:
        return f.read().replace("\n", "")


def test_bwt_tiny_analytic():
    # BANANA / MISSISSIPPI goldens from the reference tests
    # (test_suffixtree.rs:8-48); the tree BWT output strips the
    # terminator row's '$'? No — it includes it; goldens keep it.
    assert bwt_device("BANANA") == "ANNB$AA"
    assert bwt_device("MISSISSIPPI") == "IPSSM$PISSII"


def test_suffix_array_matches_numpy():
    rng = np.random.default_rng(71)
    for trial in range(4):
        n = int(rng.integers(2, 200))
        s = bytes(rng.choice(list(b"ACGT"), n)) + b"$"
        want = sorted(range(len(s)), key=lambda i: s[i:])
        got = suffix_array(s[:-1])
        assert list(got) == want, trial


@pytest.mark.parametrize(
    "fasta,golden",
    [
        ("Covid_Wuhan.fasta", "Covid_Wuhan.fasta.BWT.out"),
        ("Human-BRCA2-cds.fasta", "Human-BRCA2-cds.fasta.BWT.txt"),
        ("Slyco.fasta", "Slyco.fas.BWT.out"),
    ],
)
def test_bwt_genome_goldens(fasta, golden):
    sc = SequenceContainer()
    sc.from_fasta(reference_path("test_data", fasta))
    got = bwt_device(sc.sequences[0].sequence)
    assert got == _golden_bwt(golden)
