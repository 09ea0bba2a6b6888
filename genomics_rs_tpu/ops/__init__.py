"""Device-side compute ops: Gotoh DP fill kernels, traceback, BWT.

Pallas kernels (``gotoh_pallas``: single-pair fill, batched score,
streamed-boundary tile, blocked long-pair batch;
``gotoh_segmented``: 8-pairs-per-pane mid-length batch;
``gotoh_shortread``: row-scan read batches) are imported lazily by
their users to keep CPU-only imports light.
"""

from genomics_rs_tpu.ops.bwt_device import bwt_device, suffix_array
from genomics_rs_tpu.ops.gotoh_scan import FillResult, gotoh_fill_scan
from genomics_rs_tpu.ops.gotoh_tile import tile_fill
from genomics_rs_tpu.ops.traceback import (
    AlignedSequences,
    AlignmentChoice,
    classify_moves,
    traceback_host,
)

__all__ = [
    "FillResult",
    "gotoh_fill_scan",
    "tile_fill",
    "AlignedSequences",
    "AlignmentChoice",
    "classify_moves",
    "traceback_host",
    "bwt_device",
    "suffix_array",
]
