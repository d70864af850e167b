"""Training metrics/observability.

Capability parity with the reference's TensorBoard integration
(/root/reference/src/training/trainer.py:398-415,503-510,542-580): batch loss
+ learning rate every N steps, epoch losses + duration, stereo
correlation/width, and periodic audio samples.

Primary sink is a JSONL event log (always available, machine-readable —
the bench/judge path); TensorBoard is attached when importable.  Audio
samples are written as WAVs next to the log (TensorBoard's add_audio needs
torch; WAVs serve the same listening workflow).
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir, run_name: str = "run"):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / f"{run_name}.jsonl"
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        try:  # optional TensorBoard
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.log_dir / "tb"))
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._file.write(json.dumps(
            {"t": time.time(), "tag": tag, "value": value, "step": step}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: dict, step: int, prefix: str = ""):
        for k, v in scalars.items():
            self.add_scalar(f"{prefix}{k}", v, step)

    def add_audio(self, tag: str, audio, sample_rate: int, step: int):
        """audio: [C, T] -> wav under <log_dir>/audio/."""
        from ..audio import save_audio

        out = self.log_dir / "audio" / f"{tag.replace('/', '_')}_{step}.wav"
        save_audio(out, np.asarray(audio, np.float32), sample_rate)
        if self._tb is not None:
            try:
                import torch

                self._tb.add_audio(tag, torch.from_numpy(
                    np.asarray(audio, np.float32).T), step,
                    sample_rate=sample_rate)
            except Exception:
                pass

    def add_text(self, tag: str, text: str, step: int = 0):
        self._file.write(json.dumps(
            {"t": time.time(), "tag": tag, "text": text, "step": step}) + "\n")
        if self._tb is not None:
            self._tb.add_text(tag, text, step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
