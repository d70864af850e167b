"""1-D convolution primitives in NWC layout.

TPU-first design notes:
- All tensors are [batch, time, channels] (NWC). XLA tiles the channel axis
  onto the 128-wide lane dimension and lowers convolutions onto the MXU;
  NCW (the PyTorch layout used throughout the reference, e.g.
  /root/reference/src/models/denoiser.py:88) would force relayouts.
- Kernels are stored [width, in_ch, out_ch] ('WIO').
- ConvTranspose is expressed as an input-dilated convolution with a flipped
  kernel so both directions share the same XLA conv HLO (no gather/scatter).

Semantics match torch.nn.Conv1d / ConvTranspose1d / MaxPool1d defaults so
reference .pth checkpoints convert losslessly (see compat/torch_loader.py).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NWC", "WIO", "NWC")


def conv1d(x, w, b=None, *, stride: int = 1, padding: int = 0,
           dilation: int = 1, groups: int = 1):
    """Conv1d matching torch.nn.Conv1d semantics (incl. groups).

    Args:
      x: [B, T, Cin]
      w: [K, Cin // groups, Cout]
      b: optional [Cout]
    Returns [B, T_out, Cout].
    """
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b
    return out


def conv_transpose1d(x, w, b=None, *, stride: int = 2, padding: int = 0):
    """ConvTranspose1d matching torch.nn.ConvTranspose1d semantics.

    Args:
      x: [B, T, Cin]
      w: [K, Cin, Cout] — torch's weight[in, out, k] transposed to (k, in, out)
         with the *torch* kernel index order (the flip happens here).
      b: optional [Cout]
    Returns [B, (T-1)*stride - 2*padding + K, Cout].
    """
    k = w.shape[0]
    w_flipped = w[::-1]
    pad = k - 1 - padding
    out = lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMNUMS,
    )
    if b is not None:
        out = out + b
    return out


def max_pool1d(x, *, window: int = 2, stride: int = 2):
    """MaxPool1d (VALID, floor-mode) matching torch.nn.MaxPool1d defaults.

    x: [B, T, C] -> [B, T//stride, C]
    """
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )


def moving_average(x, kernel_size: int):
    """Box filter with zero 'same' padding, as used by the reference's
    impulse-score smoothing (F.conv1d with a ones/k kernel, padding=k//2;
    /root/reference/src/models/denoiser.py:81-84).

    x: [B, T, 1] (single channel). Returns same shape.
    """
    w = jnp.ones((kernel_size, 1, 1), x.dtype) / kernel_size
    return conv1d(x, w, padding=kernel_size // 2)


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


def batch_norm(x, scale, bias, mean, var, *, eps: float = 1e-5):
    """Inference-mode batch norm over the channel axis of [B, T, C]."""
    inv = lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + bias


def batch_norm_train(x, scale, bias, running_mean, running_var, *,
                     eps: float = 1e-5, momentum: float = 0.1,
                     axis_name: str | None = None):
    """Training-mode batch norm: normalize by batch statistics and return
    updated running stats (torch momentum convention:
    running <- (1-m)*running + m*batch, unbiased var for the running update).

    If `axis_name` is given, batch statistics are synchronized across that
    mesh axis (sync-BN over the data-parallel axis via psum).

    Statistics are computed in f32 REGARDLESS of x's dtype (the standard
    AMP contract, torch autocast keeps *_norm in f32): in bf16 the
    E[x2] - E[x]2 cancellation loses all ~3 significant digits whenever
    var << mean^2, goes negative, and rsqrt(v + eps) turns the whole
    forward NaN — reproduced at step 2 of a bf16 denoiser gate run
    (2026-08-21). The clamp guards the same cancellation at f32 precision.
    Output returns in x's dtype; running stats stay f32.
    """
    f32 = jnp.float32
    xf = x.astype(f32)
    n = x.shape[0] * x.shape[1]
    m = jnp.mean(xf, axis=(0, 1))
    sq = jnp.mean(jnp.square(xf), axis=(0, 1))
    if axis_name is not None:
        m = lax.pmean(m, axis_name)
        sq = lax.pmean(sq, axis_name)
        n = n * lax.psum(1, axis_name)
    v = jnp.maximum(sq - jnp.square(m), 0.0)
    y = ((xf - m) * lax.rsqrt(v + eps) * scale.astype(f32)
         + bias.astype(f32)).astype(x.dtype)
    unbiased = v * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean + momentum * m.astype(
        running_mean.dtype)
    new_var = (1 - momentum) * running_var + momentum * unbiased.astype(
        running_var.dtype)
    return y, new_mean, new_var


def batch_norm_train_packed(xp, r: int, c: int, scale, bias, running_mean,
                            running_var, *, eps: float = 1e-5,
                            momentum: float = 0.1,
                            axis_name: str | None = None):
    """batch_norm_train on an r-packed [B, Tp, r*C] tensor (phase-major
    j*C+c layout — ops/packed.py::pack).

    The packed tensor holds exactly the plain tensor's elements (requires
    every phase valid, i.e. the unpacked length is a multiple of r — the
    packed train path asserts t % 4 == 0 upstream), so per-original-channel
    statistics are the same mean over the (..., r, C) reshape and the
    y / running-stat updates equal batch_norm_train(unpack(xp)) up to float
    reassociation. Statistics in f32, same contract as batch_norm_train."""
    f32 = jnp.float32
    b_, tp, rc = xp.shape
    assert rc == r * c, (rc, r, c)
    xf = xp.astype(f32)
    g = xf.reshape(b_, tp, r, c)
    n = b_ * tp * r
    m = jnp.mean(g, axis=(0, 1, 2))
    sq = jnp.mean(jnp.square(g), axis=(0, 1, 2))
    if axis_name is not None:
        m = lax.pmean(m, axis_name)
        sq = lax.pmean(sq, axis_name)
        n = n * lax.psum(1, axis_name)
    v = jnp.maximum(sq - jnp.square(m), 0.0)
    inv = lax.rsqrt(v + eps)
    y = ((xf - jnp.tile(m, r)) * jnp.tile(inv * scale.astype(f32), r)
         + jnp.tile(bias.astype(f32), r)).astype(xp.dtype)
    unbiased = v * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean + momentum * m.astype(
        running_mean.dtype)
    new_var = (1 - momentum) * running_var + momentum * unbiased.astype(
        running_var.dtype)
    return y, new_mean, new_var
