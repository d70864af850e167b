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
from ..ops.packed import packed_conv, packed_conv_r
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
def encode_packed(params, state, x):
    """Eval-mode encoder with the C<=64 full-rate stages packed
    (ops/packed.py): the stem enters packed space straight from the plain
    [B, T, 1] input (rate-raising fused conv), dilated block 0 runs at r=4,
    and block 1's dilated conv exits fused back to the plain layout —
    blocks 1..3 are C>=128 and already lane-dense, and no standalone
    pack/unpack reshape (= relayout copy) exists anywhere. Equal to
    encode() up to float reassociation. Requires T % 4 == 0.
    x: [B, T, 1] -> [B, T, 4C]."""
    b, t, _ = x.shape
    assert t % 4 == 0, t
    w, bb = fold_conv_bn(params["stem"]["conv"], params["stem"]["bn"],
                         state["stem"]["bn"])
    h = leaky_relu(packed_conv_r(x, w, bb, r_in=1, r_out=4, padding=3,
                                 t_in=t))
    p0, s0 = params["blocks"][0], state["blocks"][0]
    w, bb = fold_conv_bn(p0["dilated"]["conv"], p0["dilated"]["bn"],
                         s0["dilated"]["bn"])
    h = leaky_relu(packed_conv(h, w, bb, r=4, padding=1))
    w, bb = fold_conv_bn(p0["pointwise"]["conv"], p0["pointwise"]["bn"],
                         s0["pointwise"]["bn"])
    h = leaky_relu(packed_conv(h, w, bb, r=4, padding=0))
    p1, s1 = params["blocks"][1], state["blocks"][1]
    w, bb = fold_conv_bn(p1["dilated"]["conv"], p1["dilated"]["bn"],
                         s1["dilated"]["bn"])
    h = leaky_relu(packed_conv_r(h, w, bb, r_in=4, r_out=1, padding=2,
                                 dilation=2, t_in=t))  # -> plain [B, T, 4C]
    h, _ = conv_bn_lrelu_apply(p1["pointwise"], s1["pointwise"], h, False,
                               padding=0)
    for p, s, dil in zip(params["blocks"][2:], state["blocks"][2:],
                         _DILATIONS[2:]):
        h, _ = conv_bn_lrelu_apply(p["dilated"], s["dilated"], h, False,
                                   padding=dil, dilation=dil)
        h, _ = conv_bn_lrelu_apply(p["pointwise"], s["pointwise"], h, False,
                                   padding=0)
    return h


def _decoder_apply_packed(p, s, h, t):
    """Eval decoder with the conv stack r=2-packed, boundary-fused both
    ways: l1 raises plain LSTM output [B, T, H] into packed space, l2/l3
    run r=2 (the [B, T2, 64]/[B, T2, 32] tensors move lane-dense), and the
    final conv exits fused to plain [B, T, 1]."""
    w1, b1 = fold_conv_bn(p["l1"]["conv"], p["l1"]["bn"], s["l1"]["bn"])
    hp = leaky_relu(packed_conv_r(h, w1, b1, r_in=1, r_out=2, padding=3,
                                  t_in=t))
    w2, b2 = fold_conv_bn(p["l2"]["conv"], p["l2"]["bn"], s["l2"]["bn"])
    hp = leaky_relu(packed_conv(hp, w2, b2, r=2, padding=3))
    w3, b3 = fold_conv_bn(p["l3"]["conv"], p["l3"]["bn"], s["l3"]["bn"])
    hp = leaky_relu(packed_conv(hp, w3, b3, r=2, padding=3))
    return packed_conv_r(hp, p["final"]["w"], p["final"]["b"], r_in=2,
                         r_out=1, padding=3, t_in=t)


def apply_packed(params, state, x):
    """Eval-mode apply() with the packed encoder/decoder stages; the LSTM
    recurrence itself is untouched (it is latency-bound, not traffic-bound —
    docs/PERFORMANCE.md). Requires T % 4 == 0 (callers fall back to
    apply() otherwise). x: [B, T, 1] -> [B, T, 2]."""
    t = x.shape[1]
    h = encode_packed(params, state, x)
    h = stacked_lstm(h, params["lstm"])
    left = _decoder_apply_packed(params["left"], state["left"], h, t)
    right = _decoder_apply_packed(params["right"], state["right"], h, t)
    return jnp.concatenate([left, right], axis=-1)
