"""FASTA loader parity pins (reference sequence.rs:45-95)."""

import numpy as np

from genomics_rs_tpu.sequence import Sequence, SequenceContainer


def test_multiple_sequences_and_accumulation(tmp_path):
    f1 = tmp_path / "a.fasta"
    f1.write_text(">one\nACGT\nACGT\n\n>two\nTTTT\n")
    f2 = tmp_path / "b.fasta"
    f2.write_text(">three\nGGGG\n")
    c = SequenceContainer()
    c.from_fasta(str(f1))
    c.from_fasta(str(f2))  # cross-file accumulation (sequence.rs:45-95)
    assert [s.name for s in c.sequences] == ["one", "two", "three"]
    assert c.sequences[0].sequence == "ACGTACGT"  # body lines appended


def test_data_before_header_dropped(tmp_path):
    f = tmp_path / "bad.fasta"
    f.write_text("ACGT\n>ok\nTTTT\n")
    c = SequenceContainer().from_fasta(str(f))
    # Pre-header data is dropped with a warning (sequence.rs parity).
    assert len(c.sequences) == 1
    assert c.sequences[0].sequence == "TTTT"


def test_crlf_and_whitespace(tmp_path):
    f = tmp_path / "crlf.fasta"
    f.write_bytes(b">x\r\nAC GT\r\nTT\r\n")
    c = SequenceContainer().from_fasta(str(f))
    # Ends are trimmed like the reference's .trim(); interior spaces
    # survive into the sequence (and would panic downstream in the
    # tree) — we match.
    assert c.sequences[0].sequence == "AC GTTT"


def test_missing_file_logs_not_raises(tmp_path):
    c = SequenceContainer().from_fasta(str(tmp_path / "nope.fasta"))
    assert c.sequences == []


def test_encoded_padding():
    s = Sequence("s", "ACGT")
    e = s.encoded(pad_to=8, pad_value=0xFE)
    assert e.tolist() == [65, 67, 71, 84, 0xFE, 0xFE, 0xFE, 0xFE]
    assert e.dtype == np.uint8
