"""Model families: denoiser (U-Net), super_resolution (bandwidth extension),
stereo_separator (mono->stereo). All are functional pytree modules with
  init(key, **cfg)              -> (params, state)
  apply(params, state, x, ...)  -> (y, new_state)
operating on [batch, time, channels] arrays.
"""

from . import denoiser, super_resolution, stereo_separator
from .common import count_params

__all__ = ["denoiser", "super_resolution", "stereo_separator", "count_params"]
