"""Utilities: profiling/tracing hooks and debug toggles (SURVEY §5 — absent
in the reference; built here as first-class subsystems)."""

from enhanced_unet_tpu.utils.init import init_variables
from enhanced_unet_tpu.utils.profiler import StepTimer, trace_context, enable_debug

__all__ = ["StepTimer", "trace_context", "enable_debug", "init_variables"]
