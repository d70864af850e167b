"""End-to-end inference pipeline."""

from .restore import RestorationPipeline, restore_audio

__all__ = ["RestorationPipeline", "restore_audio"]
