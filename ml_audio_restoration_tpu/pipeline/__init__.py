"""End-to-end inference pipeline (batch + streaming + staged + serving)."""

from .restore import RestorationPipeline, restore_audio
from .streaming import StreamingRestorer
from .staged import StagedRestorationPipeline
from .server import RestorationServer, StreamServer

__all__ = ["RestorationPipeline", "restore_audio", "StreamingRestorer",
           "StagedRestorationPipeline", "RestorationServer", "StreamServer"]
