"""FASTA sequences and device encoding.

Parsing semantics mirror the reference loader
(``/root/reference/src/sequence.rs:45-95``): ``>`` headers start a new
sequence (name = rest of line, trimmed), body lines are trimmed and
appended, empty lines are skipped, body data before any header is
dropped with a warning, and multiple files accumulate into one
container.

On top of that the container provides TPU-side encoding: sequences are
turned into uint8 ASCII arrays padded to a lane-friendly multiple, with
lengths carried separately (static shapes + masking is the XLA-friendly
way to handle ragged genomic data).
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

log = logging.getLogger(__name__)

#: Padding bytes guaranteed never to match each other or any ASCII base.
PAD_S1 = 0xFE
PAD_S2 = 0xFF


@dataclasses.dataclass
class Sequence:
    name: str
    sequence: str

    def __str__(self) -> str:  # parity: `Display for Sequence` (sequence.rs:14-18)
        return f"{self.name}: {self.sequence}"

    def __len__(self) -> int:
        return len(self.sequence)

    def encoded(self, pad_to: int | None = None, pad_value: int = PAD_S1) -> np.ndarray:
        """ASCII bytes as uint8, optionally right-padded to ``pad_to``."""
        arr = np.frombuffer(self.sequence.encode("ascii"), dtype=np.uint8)
        if pad_to is not None:
            if pad_to < arr.size:
                raise ValueError(f"pad_to={pad_to} < sequence length {arr.size}")
            arr = np.concatenate(
                [arr, np.full(pad_to - arr.size, pad_value, dtype=np.uint8)]
            )
        return arr


@dataclasses.dataclass
class SequenceContainer:
    sequences: list[Sequence] = dataclasses.field(default_factory=list)

    def from_fasta(self, filepath: str) -> "SequenceContainer":
        """Append all sequences found in ``filepath`` (reference parity)."""
        loaded: list[Sequence] = []
        seen_header = False
        try:
            with open(filepath, "r") as f:
                for line in f:
                    line = line.rstrip("\n").rstrip("\r")
                    if not line:
                        continue
                    if line.startswith(">"):
                        name = line[1:].strip()
                        log.info(
                            "Sequence Found (ID: %d): %s",
                            len(self.sequences) + len(loaded),
                            filepath,
                        )
                        loaded.append(Sequence(name=name, sequence=""))
                        seen_header = True
                    elif seen_header:
                        loaded[-1].sequence += line.strip()
                    else:
                        log.warning("Sequence data found without a header")
        except OSError:
            log.error("Could not open file: %s", filepath)

        log.debug("Loaded %d sequences", len(loaded))
        self.sequences.extend(loaded)
        return self

    def is_match(self, i: int, j: int, reverse_sequences: bool = False) -> bool:
        """Byte equality of ``s1[i]`` vs ``s2[j]``.

        Replicates ``is_match`` (``sequence.rs:102-115``) including its
        out-of-range semantics: Rust's ``bytes().nth()`` yields ``None``
        past the end and ``None == None`` counts as a match — this is
        load-bearing for the reference's retrace stats (SURVEY §2.4-5).
        """
        s1 = self.sequences[0].sequence
        s2 = self.sequences[1].sequence
        ip = len(s2) - i if reverse_sequences else i
        jp = len(s1) - j if reverse_sequences else j
        c1 = s1[ip] if 0 <= ip < len(s1) else None
        c2 = s2[jp] if 0 <= jp < len(s2) else None
        return c1 == c2


def round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple
