"""Device-side compute ops: Gotoh DP fill kernels and traceback."""

from genomics_rs_tpu.ops.gotoh_scan import FillResult, gotoh_fill_scan
from genomics_rs_tpu.ops.traceback import (
    AlignedSequences,
    AlignmentChoice,
    traceback_host,
)

__all__ = [
    "FillResult",
    "gotoh_fill_scan",
    "AlignedSequences",
    "AlignmentChoice",
    "traceback_host",
]
