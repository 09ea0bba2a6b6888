"""High-level model-like APIs (aligners over the DP kernels)."""

from genomics_rs_tpu.models.aligner import PairwiseAligner, align_pair

__all__ = ["PairwiseAligner", "align_pair"]
