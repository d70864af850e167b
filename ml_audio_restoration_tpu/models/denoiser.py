"""AudioDenoiser: 1-D U-Net with dual impulse/crackle suppression.

Capability parity with the reference AudioDenoiser
(/root/reference/src/models/denoiser.py:6-144): 3-level encoder
(features 32/64/128), bottleneck 256, transpose-conv decode with skip
concatenation, a learned 3-conv sigmoid transient-mask branch, an analytic
derivative+amplitude impulse score on the raw input, element-wise max of the
two masks, and up-to-90% suppression of the reconstructed signal at detected
impulses. Default config has 676,242 parameters (matches the reference's
"676K param U-Net" note, train_denoiser.py:20).

TPU-native: everything in NWC so the conv stack tiles onto the MXU; whole
forward is one fused XLA program (jit at the pipeline level), no Python loop
over layers at runtime beyond trace time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import (
    conv1d,
    conv_transpose1d,
    max_pool1d,
    moving_average,
    leaky_relu,
)
from .common import (
    conv_init,
    conv_transpose_init,
    double_conv_block_init,
    double_conv_block_apply,
)

DEFAULT_FEATURES = (32, 64, 128)


def init(key, in_channels: int = 1, out_channels: int = 1,
         features=DEFAULT_FEATURES):
    keys = iter(jax.random.split(key, 64))
    params, state = {}, {}

    enc_p, enc_s = [], []
    ch = in_channels
    for f in features:
        p, s = double_conv_block_init(next(keys), ch, f)
        enc_p.append(p)
        enc_s.append(s)
        ch = f
    params["encoder"], state["encoder"] = enc_p, enc_s

    params["bottleneck"], state["bottleneck"] = double_conv_block_init(
        next(keys), features[-1], features[-1] * 2
    )

    up_p, dec_p, dec_s = [], [], []
    for f in reversed(features):
        up_p.append(conv_transpose_init(next(keys), 2, f * 2, f))
        p, s = double_conv_block_init(next(keys), f * 2, f)
        dec_p.append(p)
        dec_s.append(s)
    params["up"], params["decoder"], state["decoder"] = up_p, dec_p, dec_s

    f0 = features[0]
    params["transient_detector"] = [
        conv_init(next(keys), 3, f0, f0 // 2),
        conv_init(next(keys), 3, f0 // 2, f0 // 4),
        conv_init(next(keys), 3, f0 // 4, 1),
    ]
    params["final_conv"] = conv_init(next(keys), 1, f0, out_channels)
    return params, state


def detect_impulses(x):
    """Analytic impulse score: |d1|, |d2| and amplitude blended 1:2:0.5 /3.5,
    box-smoothed (k=5) and clipped to [0, 1]
    (reference _detect_impulses, denoiser.py:62-86).

    x: [B, T, 1] -> [B, T, 1]
    """
    zero_tail = ((0, 0), (0, 1), (0, 0))
    diff = jnp.pad(jnp.abs(x[:, 1:] - x[:, :-1]), zero_tail)
    diff2 = jnp.pad(jnp.abs(diff[:, 1:] - diff[:, :-1]), zero_tail)
    amplitude = jnp.abs(x)
    score = (diff2 * 2.0 + diff + amplitude * 0.5) / 3.5
    score = moving_average(score, 5)
    return jnp.clip(score, 0.0, 1.0)


def encode(params, state, x, train: bool = False,
           axis_name: str | None = None):
    """Encoder + bottleneck only: [B, T, in_ch] -> [B, T/8, 256] features.

    Used as the representation for the contrastive objective
    (losses/semi_supervised.py::contrastive_loss): the bottleneck carries
    the degradation-type information the masks act on. Runs with the given
    BN mode but never returns updated state — feature extraction is an
    auxiliary read of the network."""
    h = x
    for p, s in zip(params["encoder"], state["encoder"]):
        h, _ = double_conv_block_apply(p, s, h, train, axis_name)
        h = max_pool1d(h)
    h, _ = double_conv_block_apply(
        params["bottleneck"], state["bottleneck"], h, train, axis_name)
    return h


def apply(params, state, x, train: bool = False,
          axis_name: str | None = None):
    """x: [B, T, in_ch] -> ([B, T, out_ch], new_state)."""
    input_audio = x
    new_state = {"encoder": [], "decoder": []}

    skips = []
    h = x
    for p, s in zip(params["encoder"], state["encoder"]):
        h, ns = double_conv_block_apply(p, s, h, train, axis_name)
        new_state["encoder"].append(ns)
        skips.append(h)
        h = max_pool1d(h)

    h, ns = double_conv_block_apply(
        params["bottleneck"], state["bottleneck"], h, train, axis_name
    )
    new_state["bottleneck"] = ns

    for i, (up, p, s) in enumerate(
        zip(params["up"], params["decoder"], state["decoder"])
    ):
        h = conv_transpose1d(h, up["w"], up["b"], stride=2, padding=0)
        skip = skips[-(i + 1)]
        if h.shape[1] != skip.shape[1]:
            # odd-length level: right-pad to the skip length (denoiser.py:121-122)
            h = jnp.pad(h, ((0, 0), (0, skip.shape[1] - h.shape[1]), (0, 0)))
        h = jnp.concatenate([skip, h], axis=-1)
        h, ns = double_conv_block_apply(p, s, h, train, axis_name)
        new_state["decoder"].append(ns)

    td = h
    for j, layer in enumerate(params["transient_detector"]):
        td = conv1d(td, layer["w"], layer["b"], padding=1)
        td = jax.nn.sigmoid(td) if j == 2 else leaky_relu(td)

    combined_mask = jnp.maximum(td, detect_impulses(input_audio))

    denoised = conv1d(h, params["final_conv"]["w"], params["final_conv"]["b"])
    suppression = 1.0 - combined_mask * 0.9
    return denoised * suppression, new_state
