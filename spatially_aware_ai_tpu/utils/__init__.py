from .profiling import PhaseTimer, trace_to
