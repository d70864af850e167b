"""Training-loss library (jnp, channels-last [B, T, C])."""

import jax.numpy as jnp

from .spectral import (
    multiscale_spectral_loss,
    transient_spectral_loss,
    detect_transients,
    FFT_SIZES,
)
from .impulse import impulse_loss
from .stereo import (
    spectral_clustering_loss,
    temporal_consistency_loss,
    stereo_balance_loss,
    decorrelation_loss,
    low_frequency_centering_loss,
    stereo_metrics,
)
from .semi_supervised import (
    supervised_loss,
    consistency_loss,
    contrastive_loss,
    cycle_consistency_loss,
    semi_supervised_loss,
)

# Reference Trainer loss weights (trainer.py:70-79)
SPECTRAL_WEIGHT = 0.5
IMPULSE_WEIGHT = 0.3
CLUSTERING_WEIGHT = 0.1
CONSISTENCY_WEIGHT = 0.05


def restoration_loss(output, target):
    """The reference Trainer's combined per-batch loss (trainer.py:352-368):
    time MSE + 0.5*multi-scale-spectral, plus impulse loss (mono output) or
    spectral-clustering + temporal-consistency (stereo output).

    Channel-count dispatch is static under jit (shapes are trace-time).
    Returns (total, components dict).
    """
    time_loss = jnp.mean(jnp.square(output - target))
    spec = multiscale_spectral_loss(output, target)
    recon = time_loss + SPECTRAL_WEIGHT * spec
    parts = {"time": time_loss, "spectral": spec}
    if output.shape[-1] == 1:
        imp = impulse_loss(output, target)
        parts["impulse"] = imp
        total = recon + IMPULSE_WEIGHT * imp
    else:
        clus = spectral_clustering_loss(output)
        cons = temporal_consistency_loss(output)
        parts["clustering"] = clus
        parts["consistency"] = cons
        total = recon + CLUSTERING_WEIGHT * clus + CONSISTENCY_WEIGHT * cons
    parts["total"] = total
    return total, parts


__all__ = [
    "multiscale_spectral_loss",
    "transient_spectral_loss",
    "detect_transients",
    "impulse_loss",
    "spectral_clustering_loss",
    "temporal_consistency_loss",
    "stereo_balance_loss",
    "decorrelation_loss",
    "low_frequency_centering_loss",
    "stereo_metrics",
    "supervised_loss",
    "consistency_loss",
    "contrastive_loss",
    "cycle_consistency_loss",
    "semi_supervised_loss",
    "restoration_loss",
    "FFT_SIZES",
]
