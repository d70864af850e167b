"""ml_audio_restoration_tpu — TPU-native 78rpm audio restoration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
JonathanBedrava/ml-audio-restoration (reference mounted read-only at
/root/reference). The reference is a single-GPU PyTorch application; this
package is a TPU-first framework:

- models/   three restoration model families (denoiser U-Net, bandwidth
            extension, mono->stereo separation) as functional pytree modules
- ops/      TPU-friendly DSP + NN primitives (NWC conv, scan LSTM, STFT,
            IIR filters as scans, overlap-add chunking)
- losses/   the full training-loss library (multi-scale spectral, impulse,
            stereo clustering/consistency, semi-supervised suite)
- data/     on-device 78rpm artifact simulator + dataset/loader stack
- train/    training runtime (optax, plateau scheduler, checkpoints, metrics)
- parallel/ mesh construction + sharded train/inference steps
- compat/   .pth (PyTorch reference) checkpoint -> pytree weight converter
- pipeline/ end-to-end restore (denoise -> super-res -> stereo)
- audio/    WAV I/O, normalization, resampling, impulse analytics
"""

__version__ = "0.1.0"

from . import ops, models, losses, audio  # noqa: F401
