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

import numpy as np
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
          axis_name: str | None = None, packed: bool = False):
    """x: [B, T, ch] -> ([B, T*upscale, ch], new_state).

    packed=True routes TRAIN-mode forwards through apply_train_packed
    (the whole model is C=32 at 4x lane padding — round-5 train roofline)
    when the shape qualifies; eval forwards and non-qualifying shapes use
    this plain path (serving has its own packed path, apply_packed)."""
    if packed and train and x.shape[1] % 4 == 0 and x.shape[2] == 1:
        return apply_train_packed(params, state, x, axis_name)
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
def _upsample_linear_conv(x, c: int, t: int, m: int):
    """upsample_linear(x, m) as a conv: align_corners=False xm linear
    interpolation is a k=2m / stride=m / padding=m-1 transpose conv whose
    kernel is the triangular filter [(a+0.5)/m for both tap directions],
    plus edge-clamp corrections on the first/last ceil(m/2) output samples
    (the conv sees zeros past the signal where the interpolation clamps to
    the edge value). Avoids the plain path's gather (ops/interp.py:25)
    entirely. Plain [B, t, c] -> plain [B, m*t, c]."""
    # output phase a at base index w reads x[w] with weight 1-|frac| and
    # x[w +- 1] with weight |frac|, frac = (a+0.5)/m - 0.5. As a transpose
    # conv with p = m//2: tap j = a + p for x[w], j = a + p -+ m for the
    # neighbor (all land in [0, 2m) exactly when m is even).
    assert m % 2 == 0, m
    p = m // 2
    taps = np.zeros(2 * m, np.float64)
    edge = []  # (phase a, clamp weight missing at each edge)
    for a in range(m):
        frac = (a + 0.5) / m - 0.5  # src offset from v=w
        taps[a + p] += 1 - abs(frac)
        if frac > 0:  # also reads x[w+1]
            taps[a + p - m] += frac
        elif frac < 0:  # also reads x[w-1]
            taps[a + p + m] += -frac
            edge.append((a, -frac))
    w = jnp.asarray(taps, x.dtype)[:, None, None] * jnp.eye(c, dtype=x.dtype)
    y = packed_conv_transpose(x, w, None, r_in=1, r_out=1, stride=m,
                              padding=p, t_in=t)
    # clamp corrections: out[a] misses weight*x[0]; out[m*t-1-a] misses
    # weight*x[t-1] (mirror symmetry of the triangular kernel)
    t_out = m * t
    for a, wgt in edge:
        first = x[:, :1, :] * wgt
        last = x[:, -1:, :] * wgt
        y = y + jnp.pad(first, ((0, 0), (a, t_out - 1 - a), (0, 0)))
        y = y + jnp.pad(last, ((0, 0), (t_out - 1 - a, a), (0, 0)))
    return y


def apply_packed(params, state, x, q=None):
    """Eval-mode forward in r-packed (space-to-depth) form.

    The ENTIRE model is C=32 (stem through recon), so the whole forward runs
    in dense 128-lane packed form: the stem enters packed space straight
    from the plain input (rate-raising fused conv), each k4/s2 upsample
    stage DOUBLES the packing rate as a stride-1 packed conv (r4->r8 for
    x2; ->r16 for x4), and the recon conv exits fused to the plain layout —
    no standalone pack/unpack reshapes (they cost relayout copies;
    ops/packed.py::packed_conv_r). Exactly equal to apply() up to float
    reassociation. Requires t % 4 == 0 and channels == 1 (callers fall
    back to apply() otherwise). x: plain [B, t, 1] -> plain [B, m*t, 1].

    `q`: optional ops/quant.py QuantCtx for int8 serving / calibration;
    residual adds dequantize both sides in the consuming conv's epilogue.
    The global linear-interp residual stays float.
    """
    from ..ops.quant import ctx_or_null, make_qops

    q = ctx_or_null(q)
    qconv, _ = make_qops(q)
    b_sz, t, cin = x.shape
    assert t % 4 == 0 and cin == 1
    r = 4
    lrelu = leaky_relu

    xq = q.quantize_in("in", x)
    h0 = qconv("stem", xq, params["initial"]["w"], params["initial"]["b"],
               op=packed_conv_r, act=lrelu, r_in=1, r_out=r, padding=3,
               t_in=t)
    h = h0
    for i, (p, s) in enumerate(zip(params["blocks"], state["blocks"])):
        w1, b1 = fold_conv_bn(p["conv1"], p["bn1"], s["bn1"])
        hh = qconv(f"blk{i}.c1", h, w1, b1, op=packed_conv, act=lrelu,
                   r=r, padding=1)
        w2, b2 = fold_conv_bn(p["conv2"], p["bn2"], s["bn2"])
        h = qconv(f"blk{i}.c2", hh, w2, b2, op=packed_conv, add=h,
                  r=r, padding=1)
    wm, bm = fold_conv_bn(params["middle"]["conv"], params["middle"]["bn"],
                          state["middle"]["bn"])
    h = qconv("middle", h, wm, bm, op=packed_conv, add=h0, r=r, padding=1)

    t_cur = t
    for i, up in enumerate(params["upsample"]):
        h = qconv(f"up{i}", h, up["w"], up["b"], op=packed_conv_transpose,
                  act=lrelu, r_in=r, r_out=2 * r, stride=2, padding=1,
                  t_in=t_cur)
        r, t_cur = 2 * r, 2 * t_cur
    h = qconv("hf", h, params["hf"]["w"], params["hf"]["b"], op=packed_conv,
              act=lrelu, r=r, padding=2)
    out = qconv("recon", h, params["recon"]["w"], params["recon"]["b"],
                op=packed_conv_r, requant=False, r_in=r, r_out=1, padding=3,
                t_in=t_cur)
    return out + _upsample_linear_conv(x, 1, t, 2 ** len(params["upsample"]))


def apply_train_packed(params, state, x, axis_name: str | None = None):
    """TRAIN-mode forward fully r-packed (round 5) — the whole model is
    C=32, lane-padded 4x in plain NWC, and apply_packed's structure (stem
    enters packed, upsamples double the rate, recon exits fused) carries
    over directly with live batch-norm statistics
    (ops/conv.py::batch_norm_train_packed) instead of folded weights.
    Outputs, BN running-stat updates and gradients equal apply(train=True)
    up to float reassociation (tests/test_trainer.py). Requires t % 4 == 0
    and channels == 1 (the Trainer falls back to apply() otherwise)."""
    from ..ops import batch_norm_train_packed

    b_sz, t, cin = x.shape
    assert t % 4 == 0 and cin == 1, (t, cin)
    c = params["initial"]["w"].shape[2]
    r = 4
    new_state = {"blocks": []}

    def bn(bn_p, bn_s, h, rr):
        y, nm, nv = batch_norm_train_packed(
            h, rr, c, bn_p["scale"], bn_p["bias"],
            bn_s["mean"], bn_s["var"], axis_name=axis_name)
        return y, {"mean": nm, "var": nv}

    h0 = leaky_relu(packed_conv_r(x, params["initial"]["w"],
                                  params["initial"]["b"], r_in=1, r_out=r,
                                  padding=3, t_in=t))
    h = h0
    for p, s in zip(params["blocks"], state["blocks"]):
        res = h
        h = packed_conv(h, p["conv1"]["w"], p["conv1"]["b"], r=r, padding=1)
        h, bn1 = bn(p["bn1"], s["bn1"], h, r)
        h = leaky_relu(h)
        h = packed_conv(h, p["conv2"]["w"], p["conv2"]["b"], r=r, padding=1)
        h, bn2 = bn(p["bn2"], s["bn2"], h, r)
        h = h + res
        new_state["blocks"].append({"bn1": bn1, "bn2": bn2})

    h = packed_conv(h, params["middle"]["conv"]["w"],
                    params["middle"]["conv"]["b"], r=r, padding=1)
    h, mid_bn = bn(params["middle"]["bn"], state["middle"]["bn"], h, r)
    new_state["middle"] = {"bn": mid_bn}
    h = h0 + h

    t_cur = t
    for up in params["upsample"]:
        h = leaky_relu(packed_conv_transpose(
            h, up["w"], up["b"], r_in=r, r_out=2 * r, stride=2, padding=1,
            t_in=t_cur))
        r, t_cur = 2 * r, 2 * t_cur
    h = leaky_relu(packed_conv(h, params["hf"]["w"], params["hf"]["b"],
                               r=r, padding=2))
    out = packed_conv_r(h, params["recon"]["w"], params["recon"]["b"],
                        r_in=r, r_out=1, padding=3, t_in=t_cur)
    return (out + _upsample_linear_conv(x, 1, t,
                                        2 ** len(params["upsample"])),
            new_state)


def packed_amax(params, state, x):
    """Calibration forward for apply_packed's int8 mode (ops/quant.py)."""
    from ..ops import quant

    return quant.packed_amax(apply_packed, params, state, x)
