"""AudioSuperResolution: ×2 bandwidth extension (22.05 kHz -> 44.1 kHz).

Capability parity with the reference AudioSuperResolution
(/root/reference/src/models/super_resolution.py:6-122): conv-k7 stem,
N residual blocks (conv3-BN-LeakyReLU-conv3-BN + identity), middle conv+BN
with a long skip from the stem, log2(upscale) transpose-conv (k4, s2, p1)
upsample stages, HF-emphasis conv k5, k7 reconstruction, and a global
residual of the linearly-interpolated (align_corners=False) input.
Default config (base=32, 4 blocks) has 38,273 parameters.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import conv1d, conv_transpose1d, leaky_relu, upsample_linear
from ..ops.packed import packed_conv, packed_conv_r, packed_conv_transpose
from .common import (
    conv_init,
    conv_transpose_init,
    bn_init,
    bn_apply,
    fold_conv_bn,
)


def init(key, upscale_factor: int = 2, channels: int = 1,
         base_channels: int = 32, num_residual_blocks: int = 4):
    keys = iter(jax.random.split(key, 64))
    params, state = {}, {}
    c = base_channels

    params["initial"] = conv_init(next(keys), 7, channels, c)

    blocks_p, blocks_s = [], []
    for _ in range(num_residual_blocks):
        p = {"conv1": conv_init(next(keys), 3, c, c),
             "conv2": conv_init(next(keys), 3, c, c)}
        bn1_p, bn1_s = bn_init(c)
        bn2_p, bn2_s = bn_init(c)
        p["bn1"], p["bn2"] = bn1_p, bn2_p
        blocks_p.append(p)
        blocks_s.append({"bn1": bn1_s, "bn2": bn2_s})
    params["blocks"], state["blocks"] = blocks_p, blocks_s

    params["middle"] = {"conv": conv_init(next(keys), 3, c, c)}
    mid_bn_p, mid_bn_s = bn_init(c)
    params["middle"]["bn"] = mid_bn_p
    state["middle"] = {"bn": mid_bn_s}

    num_up = int(math.log2(upscale_factor))
    params["upsample"] = [
        conv_transpose_init(next(keys), 4, c, c) for _ in range(num_up)
    ]
    params["hf"] = conv_init(next(keys), 5, c, c)
    params["recon"] = conv_init(next(keys), 7, c, channels)
    return params, state


def apply(params, state, x, train: bool = False,
          axis_name: str | None = None):
    """x: [B, T, ch] -> ([B, T*upscale, ch], new_state)."""
    upscale = 2 ** len(params["upsample"])  # one transpose-conv per ×2 stage
    new_state = {"blocks": []}

    h0 = leaky_relu(conv1d(x, params["initial"]["w"], params["initial"]["b"],
                           padding=3))

    h = h0
    for p, s in zip(params["blocks"], state["blocks"]):
        r = h
        if not train:  # fold BN into the conv weights (models/common.py)
            w1, b1 = fold_conv_bn(p["conv1"], p["bn1"], s["bn1"])
            h = leaky_relu(conv1d(h, w1, b1, padding=1))
            w2, b2 = fold_conv_bn(p["conv2"], p["bn2"], s["bn2"])
            h = conv1d(h, w2, b2, padding=1) + r
            new_state["blocks"].append(s)
            continue
        h = conv1d(h, p["conv1"]["w"], p["conv1"]["b"], padding=1)
        h, bn1 = bn_apply(p["bn1"], s["bn1"], h, train, axis_name)
        h = leaky_relu(h)
        h = conv1d(h, p["conv2"]["w"], p["conv2"]["b"], padding=1)
        h, bn2 = bn_apply(p["bn2"], s["bn2"], h, train, axis_name)
        h = h + r
        new_state["blocks"].append({"bn1": bn1, "bn2": bn2})

    if not train:
        wm, bm = fold_conv_bn(params["middle"]["conv"], params["middle"]["bn"],
                              state["middle"]["bn"])
        h = conv1d(h, wm, bm, padding=1)
        new_state["middle"] = state["middle"]
    else:
        h = conv1d(h, params["middle"]["conv"]["w"],
                   params["middle"]["conv"]["b"], padding=1)
        h, mid_bn = bn_apply(params["middle"]["bn"], state["middle"]["bn"], h,
                             train, axis_name)
        new_state["middle"] = {"bn": mid_bn}

    h = h0 + h

    for up in params["upsample"]:
        h = leaky_relu(conv_transpose1d(h, up["w"], up["b"], stride=2, padding=1))

    h = leaky_relu(conv1d(h, params["hf"]["w"], params["hf"]["b"], padding=2))
    out = conv1d(h, params["recon"]["w"], params["recon"]["b"], padding=3)

    return out + upsample_linear(x, upscale), new_state


# ----------------------------------------------------- packed serving path
def _upsample2_linear_conv(x, c: int, t: int):
    """upsample_linear(x, 2) as a conv: align_corners=False x2 linear
    interpolation is the k=4/s=2/p=1 transpose conv with kernel
    [0.25, 0.75, 0.75, 0.25] per channel, plus edge-clamp corrections at the
    first/last output sample (the conv sees zeros past the signal where the
    interpolation clamps to the edge value). Avoids the plain path's gather
    (ops/interp.py:25) entirely. Plain [B, t, c] -> plain [B, 2t, c]."""
    w = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    w = w[:, None, None] * jnp.eye(c, dtype=x.dtype)
    y = packed_conv_transpose(x, w, None, r_in=1, r_out=1, stride=2,
                              padding=1, t_in=t)
    first = x[:, :1, :] * 0.25   # missing 0.25*x[0] at out[0]
    last = x[:, -1:, :] * 0.25   # missing 0.25*x[t-1] at out[2t-1]
    y = y + jnp.pad(first, ((0, 0), (0, 2 * t - 1), (0, 0)))
    y = y + jnp.pad(last, ((0, 0), (2 * t - 1, 0), (0, 0)))
    return y


def apply_packed(params, state, x):
    """Eval-mode x2 forward in r-packed (space-to-depth) form.

    The ENTIRE model is C=32 (stem through recon), so the whole forward runs
    in dense 128-lane packed form: the stem enters packed space straight
    from the plain input (rate-raising fused conv), the k4/s2 upsample
    raises the packing rate r4->r8 as a stride-1 packed conv, and the recon
    conv exits fused to the plain layout — no standalone pack/unpack
    reshapes (they cost relayout copies; ops/packed.py::packed_conv_r).
    Exactly equal to apply() up to float reassociation. Requires
    t % 4 == 0, channels == 1, upscale == 2 (callers fall back to apply()
    otherwise). x: plain [B, t, 1] -> plain [B, 2t, 1].
    """
    b_sz, t, cin = x.shape
    assert t % 4 == 0 and cin == 1 and len(params["upsample"]) == 1
    r = 4

    h0 = leaky_relu(packed_conv_r(x, params["initial"]["w"],
                                  params["initial"]["b"], r_in=1, r_out=r,
                                  padding=3, t_in=t))
    h = h0
    for p, s in zip(params["blocks"], state["blocks"]):
        w1, b1 = fold_conv_bn(p["conv1"], p["bn1"], s["bn1"])
        hh = leaky_relu(packed_conv(h, w1, b1, r=r, padding=1))
        w2, b2 = fold_conv_bn(p["conv2"], p["bn2"], s["bn2"])
        h = packed_conv(hh, w2, b2, r=r, padding=1) + h
    wm, bm = fold_conv_bn(params["middle"]["conv"], params["middle"]["bn"],
                          state["middle"]["bn"])
    h = h0 + packed_conv(h, wm, bm, r=r, padding=1)

    up = params["upsample"][0]
    h = leaky_relu(packed_conv_transpose(h, up["w"], up["b"], r_in=r,
                                         r_out=2 * r, stride=2, padding=1,
                                         t_in=t))
    h = leaky_relu(packed_conv(h, params["hf"]["w"], params["hf"]["b"],
                               r=2 * r, padding=2))
    out = packed_conv_r(h, params["recon"]["w"], params["recon"]["b"],
                        r_in=2 * r, r_out=1, padding=3, t_in=2 * t)
    return out + _upsample2_linear_conv(x, 1, t)
