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

from ..ops import conv1d, lstm_init, leaky_relu
from ..ops.lstm import stacked_lstm
from ..ops.packed import pack, unpack, mask_tail, packed_conv
from .common import (
    conv_init,
    bn_init,
    conv_bn_lrelu_apply,
    fold_conv_bn,
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


# ----------------------------------------------------- packed serving path
def _packed_fold_lrelu(p, s, xp, *, r, c_out, t, padding, dilation=1):
    w, b = fold_conv_bn(p["conv"], p["bn"], s["bn"])
    y = leaky_relu(packed_conv(xp, w, b, r=r, padding=padding,
                               dilation=dilation))
    return mask_tail(y, r, c_out, t)


def encode_packed(params, state, x):
    """Eval-mode encoder with the C<=64 full-rate stages packed
    (ops/packed.py): stem (1->C) and dilated block 0 (C->2C + pointwise) at
    r=4, then unpack — blocks 1..3 are C>=4C=128 and already lane-dense.
    Handles any T via tail masks (the stereo stage sees sub-chunk lengths
    that need not divide 4). Equal to encode() up to float reassociation.
    x: [B, T, 1] -> [B, T, 4C]."""
    b, t, _ = x.shape
    c = params["stem"]["conv"]["w"].shape[2]
    xp = pack(x, 4)
    h = _packed_fold_lrelu(params["stem"], state["stem"], xp, r=4, c_out=c,
                           t=t, padding=3)
    p0, s0 = params["blocks"][0], state["blocks"][0]
    h = _packed_fold_lrelu(p0["dilated"], s0["dilated"], h, r=4,
                           c_out=2 * c, t=t, padding=1)
    h = _packed_fold_lrelu(p0["pointwise"], s0["pointwise"], h, r=4,
                           c_out=2 * c, t=t, padding=0)
    h = unpack(h, 4, 2 * c, t)
    for p, s, dil in zip(params["blocks"][1:], state["blocks"][1:],
                         _DILATIONS[1:]):
        h, _ = conv_bn_lrelu_apply(p["dilated"], s["dilated"], h, False,
                                   padding=dil, dilation=dil)
        h, _ = conv_bn_lrelu_apply(p["pointwise"], s["pointwise"], h, False,
                                   padding=0)
    return h


def _decoder_apply_packed(p, s, h, t):
    """Eval decoder with the C<=2C tail packed at r=2: l1 (H->4C) stays
    plain (output already 128 lanes), l2/l3/final run r=2-packed so the
    [B, T2, 64]/[B, T2, 32] tensors move dense. h: [B, T, H] -> [B, T, 1]."""
    h, _ = conv_bn_lrelu_apply(p["l1"], s["l1"], h, False, padding=3)
    c4 = h.shape[-1]           # 4C
    hp = pack(h, 2)            # pure reshape when T even
    hp = _packed_fold_lrelu(p["l2"], s["l2"], hp, r=2, c_out=c4 // 2, t=t,
                            padding=3)
    hp = _packed_fold_lrelu(p["l3"], s["l3"], hp, r=2, c_out=c4 // 4, t=t,
                            padding=3)
    out = packed_conv(hp, p["final"]["w"], p["final"]["b"], r=2, padding=3)
    return unpack(out, 2, 1, t)


def apply_packed(params, state, x):
    """Eval-mode apply() with the packed encoder/decoder stages; the LSTM
    recurrence itself is untouched (it is latency-bound, not traffic-bound —
    docs/PERFORMANCE.md). x: [B, T, 1] -> [B, T, 2]."""
    t = x.shape[1]
    h = encode_packed(params, state, x)
    h = stacked_lstm(h, params["lstm"])
    left = _decoder_apply_packed(params["left"], state["left"], h, t)
    right = _decoder_apply_packed(params["right"], state["right"], h, t)
    return jnp.concatenate([left, right], axis=-1)
