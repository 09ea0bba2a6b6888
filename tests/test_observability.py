"""Observability plumbing: profiler spans must never swallow errors."""

import pytest

from genomics_rs_tpu.utils.profiling import PhaseTimer, annotate


def test_annotate_propagates_exceptions():
    """An exception raised inside an annotate() block must surface
    as-is, not be replaced by a generator-protocol RuntimeError."""
    with pytest.raises(ValueError, match="boom"):
        with annotate("test"):
            raise ValueError("boom")


def test_phase_timer_span_propagates_exceptions():
    t = PhaseTimer("t")
    with pytest.raises(KeyError, match="inner"):
        with t.span("phase"):
            raise KeyError("inner")
    # The span still records its elapsed time.
    assert "phase" in t.spans
