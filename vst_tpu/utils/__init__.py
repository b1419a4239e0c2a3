"""Utilities: profiling/tracing hooks (SURVEY.md §5.1 — absent in the
reference, first-class here)."""

from vst_tpu.utils.profiling import StepTimer, trace_context

__all__ = ["StepTimer", "trace_context"]
