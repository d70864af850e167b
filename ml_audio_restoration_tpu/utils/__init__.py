"""Framework utilities: profiling/tracing."""

from .profiling import trace, annotate, sync, StepTimer

__all__ = ["trace", "annotate", "sync", "StepTimer"]
