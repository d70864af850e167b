"""Data pipeline: on-device artifact simulation + dataset/loader stack."""

from .artifacts import (
    simulate_vinyl_artifacts,
    simulate_batch,
    zero_phase_fir,
    zero_phase_fir_bank,
)
from .datasets import (
    ChunkDataset,
    RestorationDataset,
    StereoDataset,
    SuperResolutionDataset,
    MixedRestorationDataset,
    AdaptiveArtifactDataset,
)
from .loader import DataLoader, collate, train_val_split, prepare_dataset

__all__ = [
    "simulate_vinyl_artifacts",
    "simulate_batch",
    "zero_phase_fir",
    "zero_phase_fir_bank",
    "ChunkDataset",
    "RestorationDataset",
    "StereoDataset",
    "SuperResolutionDataset",
    "MixedRestorationDataset",
    "AdaptiveArtifactDataset",
    "DataLoader",
    "collate",
    "train_val_split",
    "prepare_dataset",
]
