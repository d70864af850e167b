"""StereoSeparator: mono -> stereo upmix (dilated convs + LSTM + dual decoders).

Capability parity with the reference StereoSeparator
(/root/reference/src/models/stereo_separator.py:5-122): conv-k7 stem,
4 dilated blocks (k3 dilations 1/2/4/8 + pointwise k1, each conv-BN-LeakyReLU),
a unidirectional 1-layer LSTM (hidden 64), and two independent 4-conv k7
decoders for L and R. Default config has 494,786 parameters ("~500K").

TPU-native: the LSTM input projection is hoisted out of the recurrence
(ops/lstm.py) and the whole model is NWC, so the reference's
permute/.contiguous() dance around cuDNN (stereo_separator.py:93-113) has no
equivalent here — layouts never change.
"""
from __future__ import annotations

import jax

from ..ops import conv1d, lstm_init
from ..ops.lstm import stacked_lstm
from .common import (
    conv_init,
    bn_init,
    conv_bn_lrelu_apply,
)

import jax.numpy as jnp


def _conv_bn(key, k, in_ch, out_ch):
    p = {"conv": conv_init(key, k, in_ch, out_ch)}
    bn_p, bn_s = bn_init(out_ch)
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def init(key, base_channels: int = 32, lstm_hidden: int = 64,
         num_lstm_layers: int = 1):
    keys = iter(jax.random.split(key, 64))
    c = base_channels
    params, state = {}, {}

    stem_p, stem_s = _conv_bn(next(keys), 7, 1, c)
    params["stem"], state["stem"] = stem_p, stem_s

    # (in, out, dilation) per dilated block; each block = dilated k3 + pointwise k1
    specs = [(c, c * 2, 1), (c * 2, c * 4, 2), (c * 4, c * 4, 4), (c * 4, c * 4, 8)]
    blocks_p, blocks_s, dils = [], [], []
    for in_ch, out_ch, dil in specs:
        p1, s1 = _conv_bn(next(keys), 3, in_ch, out_ch)
        p2, s2 = _conv_bn(next(keys), 1, out_ch, out_ch)
        blocks_p.append({"dilated": p1, "pointwise": p2})
        blocks_s.append({"dilated": s1, "pointwise": s2})
        dils.append(dil)
    params["blocks"], state["blocks"] = blocks_p, blocks_s

    params["lstm"] = [
        lstm_init(next(keys), c * 4 if layer == 0 else lstm_hidden,
                  lstm_hidden)
        for layer in range(num_lstm_layers)
    ]

    def decoder(key):
        ks = jax.random.split(key, 4)
        p1, s1 = _conv_bn(ks[0], 7, lstm_hidden, c * 4)
        p2, s2 = _conv_bn(ks[1], 7, c * 4, c * 2)
        p3, s3 = _conv_bn(ks[2], 7, c * 2, c)
        final = conv_init(ks[3], 7, c, 1)
        return ({"l1": p1, "l2": p2, "l3": p3, "final": final},
                {"l1": s1, "l2": s2, "l3": s3})

    params["left"], state["left"] = decoder(next(keys))
    params["right"], state["right"] = decoder(next(keys))
    return params, state


_DILATIONS = (1, 2, 4, 8)


def _decoder_apply(p, s, h, train, axis_name):
    h, s1 = conv_bn_lrelu_apply(p["l1"], s["l1"], h, train, padding=3,
                                axis_name=axis_name)
    h, s2 = conv_bn_lrelu_apply(p["l2"], s["l2"], h, train, padding=3,
                                axis_name=axis_name)
    h, s3 = conv_bn_lrelu_apply(p["l3"], s["l3"], h, train, padding=3,
                                axis_name=axis_name)
    h = conv1d(h, p["final"]["w"], p["final"]["b"], padding=3)
    return h, {"l1": s1, "l2": s2, "l3": s3}


def encode(params, state, x, train: bool = False,
           axis_name: str | None = None):
    """Stem + dilated blocks: [B, T, 1] -> ([B, T, 4C], new_block_states)."""
    new_state = {"blocks": []}
    h, stem_s = conv_bn_lrelu_apply(params["stem"], state["stem"], x, train,
                                    padding=3, axis_name=axis_name)
    new_state["stem"] = stem_s
    for p, s, dil in zip(params["blocks"], state["blocks"], _DILATIONS):
        h, s1 = conv_bn_lrelu_apply(p["dilated"], s["dilated"], h, train,
                                    padding=dil, dilation=dil,
                                    axis_name=axis_name)
        h, s2 = conv_bn_lrelu_apply(p["pointwise"], s["pointwise"], h, train,
                                    padding=0, axis_name=axis_name)
        new_state["blocks"].append({"dilated": s1, "pointwise": s2})
    return h, new_state


def decode(params, state, h, train: bool = False,
           axis_name: str | None = None):
    """Dual decoders: LSTM output [B, T, H] -> ([B, T, 2], new_states)."""
    left, left_s = _decoder_apply(params["left"], state["left"], h, train,
                                  axis_name)
    right, right_s = _decoder_apply(params["right"], state["right"], h, train,
                                    axis_name)
    return jnp.concatenate([left, right], axis=-1), (left_s, right_s)


def apply(params, state, x, train: bool = False,
          axis_name: str | None = None):
    """x: [B, T, 1] -> ([B, T, 2], new_state). Channel order: (L, R)."""
    h, new_state = encode(params, state, x, train, axis_name)
    h = stacked_lstm(h, params["lstm"])  # [B, T, H] — already channels-last
    stereo, (left_s, right_s) = decode(params, state, h, train, axis_name)
    new_state["left"], new_state["right"] = left_s, right_s
    return stereo, new_state
