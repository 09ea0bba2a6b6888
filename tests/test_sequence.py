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


def test_fastq_parsing(tmp_path):
    f = tmp_path / "reads.fastq"
    f.write_text(
        "@read1 some description\nACGTACGT\n+\nIIIIIIII\n"
        "\n"  # blank line between records tolerated
        "@read2\nTTTT\n+read2\n!!!!\n"
    )
    c = SequenceContainer().from_fastq(str(f))
    assert [s.name for s in c.sequences] == [
        "read1 some description",
        "read2",
    ]
    assert c.sequences[0].sequence == "ACGTACGT"
    assert c.sequences[0].quality == "IIIIIIII"
    assert c.sequences[1].quality == "!!!!"


def test_fastq_malformed_raises(tmp_path):
    import pytest

    bad_sep = tmp_path / "sep.fastq"
    bad_sep.write_text("@r\nACGT\nIIII\nACGT\n")
    with pytest.raises(ValueError, match="'\\+' separator"):
        SequenceContainer().from_fastq(str(bad_sep))

    bad_len = tmp_path / "len.fastq"
    bad_len.write_text("@r\nACGT\n+\nII\n")
    with pytest.raises(ValueError, match="quality length"):
        SequenceContainer().from_fastq(str(bad_len))

    trunc = tmp_path / "trunc.fastq"
    trunc.write_text("@r\nACGT\n+\n")
    with pytest.raises(ValueError, match="truncated"):
        SequenceContainer().from_fastq(str(trunc))


def test_from_reads_autodetect(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">s\nACGT\n")
    fq = tmp_path / "x.fq"
    fq.write_text("@s\nACGT\n+\nIIII\n")
    missing = tmp_path / "nope.fq"
    c = SequenceContainer()
    c.from_reads(str(fa))
    c.from_reads(str(fq))
    c.from_reads(str(missing))  # falls through to FASTA log-only path
    assert len(c.sequences) == 2
    assert c.sequences[0].quality is None
    assert c.sequences[1].quality == "IIII"
