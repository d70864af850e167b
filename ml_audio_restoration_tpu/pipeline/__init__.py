"""End-to-end inference pipeline (batch + streaming)."""

from .restore import RestorationPipeline, restore_audio
from .streaming import StreamingRestorer

__all__ = ["RestorationPipeline", "restore_audio", "StreamingRestorer"]
