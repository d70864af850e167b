"""End-to-end inference pipeline (batch + streaming + staged)."""

from .restore import RestorationPipeline, restore_audio
from .streaming import StreamingRestorer
from .staged import StagedRestorationPipeline

__all__ = ["RestorationPipeline", "restore_audio", "StreamingRestorer",
           "StagedRestorationPipeline"]
