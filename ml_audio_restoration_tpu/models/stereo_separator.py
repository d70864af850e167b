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
          axis_name: str | None = None, lstm_impl: str = "auto",
          packed: bool = False):
    """x: [B, T, 1] -> ([B, T, 2], new_state). Channel order: (L, R).

    lstm_impl: recurrence implementation ('auto'|'scan'|'pallas') — the
    serving pipeline routes to the Pallas kernel on TPU where it measured
    faster (ops/lstm.py::lstm docstring); training routes 'pallas_train'
    (the fused fwd+bwd VJP) through the Trainer.

    packed=True routes TRAIN-mode forwards through apply_train_packed
    (the stereo analogue of the round-5 denoiser/SR lane-padding fix)
    when the shape qualifies; eval forwards and non-qualifying shapes use
    this plain path (serving has its own packed path, apply_packed)."""
    if packed and train and x.shape[1] % 4 == 0 and x.shape[2] == 1:
        return apply_train_packed(params, state, x, axis_name=axis_name,
                                  lstm_impl=lstm_impl)
    h, new_state = encode(params, state, x, train, axis_name)
    h = stacked_lstm(h, params["lstm"], impl=lstm_impl)  # [B, T, H]
    stereo, (left_s, right_s) = decode(params, state, h, train, axis_name)
    new_state["left"], new_state["right"] = left_s, right_s
    return stereo, new_state


def apply_train_packed(params, state, x, axis_name: str | None = None,
                       lstm_impl: str = "auto"):
    """TRAIN-mode forward with the lane-padded conv stages r-packed — the
    stereo analogue of denoiser/super_resolution.apply_train_packed,
    mirroring the serving path's block structure (encode_packed /
    _decoder_apply_packed) with LIVE batch-norm statistics
    (ops/conv.py::batch_norm_train_packed) and no weight folding, so
    outputs, running-stat updates AND gradients equal apply(train=True)
    up to float reassociation (pinned by tests/test_trainer.py).

    Packing map (base_channels c=32, full 22.05 kHz rate throughout —
    stereo has no pooling): stem out C=c enters r=4 via the rate-raising
    fused conv; dilated block 0 (C=2c) stays r=4; block 1's dilated conv
    exits fused to plain (C=4c is lane-dense); blocks 1..3 and the LSTM
    run the plain path (the recurrence is latency-bound, and
    'pallas_train' carries its own layout). Each decoder re-enters packed
    space at l1 (r=2), runs l2/l3 packed (C=2c/c move lane-dense), and
    the final conv exits fused to plain [B, T, 1]. Every rate change is
    fused into a boundary conv — no standalone pack/unpack relayout
    exists anywhere (the round-3 lesson, ops/packed.py docstring).

    Requires t % 4 == 0 and mono input (the apply() router falls back
    otherwise). x: [B, t, 1] -> ([B, t, 2], new_state)."""
    from ..ops import batch_norm_train_packed

    b_sz, t, cin = x.shape
    assert t % 4 == 0 and cin == 1, (t, cin)
    c = params["stem"]["conv"]["w"].shape[2]          # base_channels

    def bn_lrelu(p, s, h, r, c_out):
        y, nm, nv = batch_norm_train_packed(
            h, r, c_out, p["bn"]["scale"], p["bn"]["bias"],
            s["bn"]["mean"], s["bn"]["var"], axis_name=axis_name)
        return leaky_relu(y), {"bn": {"mean": nm, "var": nv}}

    # ---- encoder: stem + block 0 at r=4, fused exit at block 1's dilated
    new_state = {"blocks": [None] * len(params["blocks"])}
    stem = params["stem"]
    h = packed_conv_r(x, stem["conv"]["w"], stem["conv"]["b"],
                      r_in=1, r_out=4, padding=3, t_in=t)
    h, new_state["stem"] = bn_lrelu(stem, state["stem"], h, 4, c)
    p0, s0 = params["blocks"][0], state["blocks"][0]
    h = packed_conv(h, p0["dilated"]["conv"]["w"], p0["dilated"]["conv"]["b"],
                    r=4, padding=1)
    h, sd = bn_lrelu(p0["dilated"], s0["dilated"], h, 4, 2 * c)
    h = packed_conv(h, p0["pointwise"]["conv"]["w"],
                    p0["pointwise"]["conv"]["b"], r=4, padding=0)
    h, sp = bn_lrelu(p0["pointwise"], s0["pointwise"], h, 4, 2 * c)
    new_state["blocks"][0] = {"dilated": sd, "pointwise": sp}

    p1, s1 = params["blocks"][1], state["blocks"][1]
    h = packed_conv_r(h, p1["dilated"]["conv"]["w"],
                      p1["dilated"]["conv"]["b"], r_in=4, r_out=1,
                      padding=2, dilation=2, t_in=t)   # -> plain [B, t, 4c]
    h, sd = bn_lrelu(p1["dilated"], s1["dilated"], h, 1, 4 * c)
    h, sp = conv_bn_lrelu_apply(p1["pointwise"], s1["pointwise"], h, True,
                                padding=0, axis_name=axis_name)
    new_state["blocks"][1] = {"dilated": sd, "pointwise": sp}
    for i, (p, s, dil) in enumerate(zip(params["blocks"][2:],
                                        state["blocks"][2:],
                                        _DILATIONS[2:]), start=2):
        h, sd = conv_bn_lrelu_apply(p["dilated"], s["dilated"], h, True,
                                    padding=dil, dilation=dil,
                                    axis_name=axis_name)
        h, sp = conv_bn_lrelu_apply(p["pointwise"], s["pointwise"], h, True,
                                    padding=0, axis_name=axis_name)
        new_state["blocks"][i] = {"dilated": sd, "pointwise": sp}

    # ---- recurrence: plain layout, training impl routed by the caller
    h = stacked_lstm(h, params["lstm"], impl=lstm_impl)  # [B, t, H]

    # ---- dual decoders at r=2, boundary-fused both ways
    def decoder(p, s):
        hp = packed_conv_r(h, p["l1"]["conv"]["w"], p["l1"]["conv"]["b"],
                           r_in=1, r_out=2, padding=3, t_in=t)
        hp, s1_ = bn_lrelu(p["l1"], s["l1"], hp, 2, 4 * c)
        hp = packed_conv(hp, p["l2"]["conv"]["w"], p["l2"]["conv"]["b"],
                         r=2, padding=3)
        hp, s2_ = bn_lrelu(p["l2"], s["l2"], hp, 2, 2 * c)
        hp = packed_conv(hp, p["l3"]["conv"]["w"], p["l3"]["conv"]["b"],
                         r=2, padding=3)
        hp, s3_ = bn_lrelu(p["l3"], s["l3"], hp, 2, c)
        out = packed_conv_r(hp, p["final"]["w"], p["final"]["b"],
                            r_in=2, r_out=1, padding=3, t_in=t)
        return out, {"l1": s1_, "l2": s2_, "l3": s3_}

    left, new_state["left"] = decoder(params["left"], state["left"])
    right, new_state["right"] = decoder(params["right"], state["right"])
    return jnp.concatenate([left, right], axis=-1), new_state


# ---------------------------------------------------- grouped dual decoders
def _fold_lr(params, state, layer):
    """Fold BN into the L and R decoders' `layer` conv -> ((wL, wR), (bL, bR))."""
    ws, bs = [], []
    for side in ("left", "right"):
        if layer == "final":
            w, b = params[side]["final"]["w"], params[side]["final"]["b"]
        else:
            w, b = fold_conv_bn(params[side][layer]["conv"],
                                params[side][layer]["bn"],
                                state[side][layer]["bn"])
        ws.append(w)
        bs.append(b)
    return tuple(ws), tuple(bs)


def decode_grouped(params, state, h):
    """Eval-only grouped dual decoder: the L and R stacks run as ONE conv
    stack — layer 1 reads the shared LSTM output once (kernels concatenated
    along the output axis), layers 2/3/final are feature_group_count=2
    convs. Identical math to decode() per output channel (same multiply-add
    set), but half the op count, one HBM read of `h` instead of two, and
    the per-decoder 64/32-channel tensors travel as 128/64-lane-dense
    group-major tensors. [B, T, H] -> [B, T, 2] (L, R).

    The reference runs its decoders as two sequential nn.Sequential stacks
    (stereo_separator.py:66-88 upstream). MEASURED OUTCOME: this
    plain-layout grouped form is SLOWER than decode() in every production
    regime (full 2-s windows -11%, sub-chunked fast_serve -8%, streaming
    feeds -7% device time — docs/PERFORMANCE.md "Grouped dual decoders"),
    so no production path calls it; grouping pays only in the r=2-packed
    layout (_decoders_apply_packed_grouped, the apply_packed default).
    Kept for ablation and as the exactness baseline for the packed form."""
    (w1l, w1r), (b1l, b1r) = _fold_lr(params, state, "l1")
    h = leaky_relu(conv1d(h, jnp.concatenate([w1l, w1r], axis=2),
                          jnp.concatenate([b1l, b1r]), padding=3))
    for layer in ("l2", "l3"):
        (wl, wr), (bl, br) = _fold_lr(params, state, layer)
        h = leaky_relu(conv1d(h, jnp.concatenate([wl, wr], axis=2),
                              jnp.concatenate([bl, br]), padding=3,
                              groups=2))
    (wfl, wfr), (bfl, bfr) = _fold_lr(params, state, "final")
    return conv1d(h, jnp.concatenate([wfl, wfr], axis=2),
                  jnp.concatenate([bfl, bfr]), padding=3, groups=2)


def apply_grouped(params, state, x, lstm_impl: str = "auto"):
    """Eval-mode apply() with the grouped dual decoder (plain layout).
    x: [B, T, 1] -> [B, T, 2]. Ablation-only — see decode_grouped's
    measured-outcome note; production paths use apply()/apply_packed()."""
    h, _ = encode(params, state, x, train=False)
    h = stacked_lstm(h, params["lstm"], impl=lstm_impl)
    return decode_grouped(params, state, h)


def _decoders_apply_packed_grouped(params, state, h, t, q=None):
    """Grouped dual decoder in r=2-packed layout (see decode_grouped):
    l1 raises the shared LSTM output into group-major packed space in one
    conv, l2/l3 run as feature_group_count=2 packed convs, and the final
    convs exit fused to plain [B, T, 2] — the group-major output channels
    ARE the (L, R) pair, so even the output concat disappears.

    `q`: ops/quant.py QuantCtx — int8 serving/calibration. Quantization
    points use TUPLE names (left.*, right.*): per output channel the
    grouped conv folds/quantizes identically to the two independent
    decoders (quant.py::int8_exec grouped fold), so calibration through
    either path yields the SAME scales file and grouped int8 serving
    consumes scales calibrated on the ungrouped names (and vice versa)."""
    from ..ops.quant import ctx_or_null, make_qops

    q = ctx_or_null(q)
    qconv, _ = make_qops(q)
    hq = q.quantize_in("lstm_out", h.astype(jnp.float32) if q.quantized
                       else h)
    (w1l, w1r), (b1l, b1r) = _fold_lr(params, state, "l1")
    hp = qconv(("left.l1", "right.l1"), hq, (w1l, w1r), (b1l, b1r),
               op=packed_conv_r, act=leaky_relu, shared_input=True,
               r_in=1, r_out=2, padding=3, t_in=t)
    for layer in ("l2", "l3"):
        (wl, wr), (bl, br) = _fold_lr(params, state, layer)
        hp = qconv((f"left.{layer}", f"right.{layer}"), hp, (wl, wr),
                   (bl, br), op=packed_conv, act=leaky_relu, r=2, padding=3)
    (wfl, wfr), (bfl, bfr) = _fold_lr(params, state, "final")
    return qconv(("left.final", "right.final"), hp, (wfl, wfr), (bfl, bfr),
                 op=packed_conv_r, requant=False, r_in=2, r_out=1,
                 padding=3, t_in=t)


# ----------------------------------------------------- packed serving path
def encode_packed(params, state, x, q=None):
    """Eval-mode encoder with the C<=64 full-rate stages packed
    (ops/packed.py): the stem enters packed space straight from the plain
    [B, T, 1] input (rate-raising fused conv), dilated block 0 runs at r=4,
    and block 1's dilated conv exits fused back to the plain layout —
    blocks 1..3 are C>=128 and already lane-dense, and no standalone
    pack/unpack reshape (= relayout copy) exists anywhere. Equal to
    encode() up to float reassociation. Requires T % 4 == 0.
    x: [B, T, 1] -> [B, T, 4C] (float — the LSTM consumes it).

    `q`: optional ops/quant.py QuantCtx for int8 serving / calibration."""
    from ..ops.quant import ctx_or_null, make_qops

    q = ctx_or_null(q)
    qconv, _ = make_qops(q)
    b, t, _ = x.shape
    assert t % 4 == 0, t
    xq = q.quantize_in("in", x)
    w, bb = fold_conv_bn(params["stem"]["conv"], params["stem"]["bn"],
                         state["stem"]["bn"])
    h = qconv("stem", xq, w, bb, op=packed_conv_r, act=leaky_relu,
              r_in=1, r_out=4, padding=3, t_in=t)
    p0, s0 = params["blocks"][0], state["blocks"][0]
    w, bb = fold_conv_bn(p0["dilated"]["conv"], p0["dilated"]["bn"],
                         s0["dilated"]["bn"])
    h = qconv("b0.d", h, w, bb, op=packed_conv, act=leaky_relu,
              r=4, padding=1)
    w, bb = fold_conv_bn(p0["pointwise"]["conv"], p0["pointwise"]["bn"],
                         s0["pointwise"]["bn"])
    h = qconv("b0.p", h, w, bb, op=packed_conv, act=leaky_relu,
              r=4, padding=0)
    p1, s1 = params["blocks"][1], state["blocks"][1]
    w, bb = fold_conv_bn(p1["dilated"]["conv"], p1["dilated"]["bn"],
                         s1["dilated"]["bn"])
    # Blocks 1..3 are plain-layout C>=128: quantized only under full
    # scope — XLA's int8 lowering of plain dilated/pointwise convs
    # measured slower than bf16 on v5e (ops/quant.py QuantCtx docstring),
    # so packed scope exits the quantized domain at b1.d.
    full_tail = q.active and q.full
    h = qconv("b1.d", h, w, bb, op=packed_conv_r, act=leaky_relu,
              requant=full_tail, r_in=4, r_out=1, padding=2, dilation=2,
              t_in=t)                               # -> plain [B, T, 4C]
    if not full_tail:
        # packed-scope exit lands in f32 (dequant epilogue); run the plain
        # tail in the parameter/compute dtype (bf16 under fast_serve)
        h = h.astype(w.dtype)
        h, _ = conv_bn_lrelu_apply(p1["pointwise"], s1["pointwise"], h,
                                   False, padding=0)
        for p, s, dil in zip(params["blocks"][2:], state["blocks"][2:],
                             _DILATIONS[2:]):
            h, _ = conv_bn_lrelu_apply(p["dilated"], s["dilated"], h, False,
                                       padding=dil, dilation=dil)
            h, _ = conv_bn_lrelu_apply(p["pointwise"], s["pointwise"], h,
                                       False, padding=0)
        return h
    # quantized tail: same math with r=1 packed convs (== plain conv1d)
    w, bb = fold_conv_bn(p1["pointwise"]["conv"], p1["pointwise"]["bn"],
                         s1["pointwise"]["bn"])
    h = qconv("b1.p", h, w, bb, op=packed_conv, act=leaky_relu,
              r=1, padding=0)
    for i, (p, s, dil) in enumerate(zip(params["blocks"][2:],
                                        state["blocks"][2:],
                                        _DILATIONS[2:]), start=2):
        w, bb = fold_conv_bn(p["dilated"]["conv"], p["dilated"]["bn"],
                             s["dilated"]["bn"])
        h = qconv(f"b{i}.d", h, w, bb, op=packed_conv, act=leaky_relu,
                  r=1, padding=dil, dilation=dil)
        w, bb = fold_conv_bn(p["pointwise"]["conv"], p["pointwise"]["bn"],
                             s["pointwise"]["bn"])
        last = i == len(params["blocks"]) - 1
        h = qconv(f"b{i}.p", h, w, bb, op=packed_conv, act=leaky_relu,
                  r=1, padding=0, requant=not last)
    return h  # float: the LSTM recurrence stays f32/bf16


def _decoder_apply_packed(p, s, h, t, q=None, name: str = "dec"):
    """Eval decoder with the conv stack r=2-packed, boundary-fused both
    ways: l1 raises plain LSTM output [B, T, H] into packed space, l2/l3
    run r=2 (the [B, T2, 64]/[B, T2, 32] tensors move lane-dense), and the
    final conv exits fused to plain [B, T, 1]."""
    from ..ops.quant import ctx_or_null, make_qops

    q = ctx_or_null(q)
    qconv, _ = make_qops(q)
    w1, b1 = fold_conv_bn(p["l1"]["conv"], p["l1"]["bn"], s["l1"]["bn"])
    hp = qconv(f"{name}.l1", h, w1, b1, op=packed_conv_r, act=leaky_relu,
               r_in=1, r_out=2, padding=3, t_in=t)
    w2, b2 = fold_conv_bn(p["l2"]["conv"], p["l2"]["bn"], s["l2"]["bn"])
    hp = qconv(f"{name}.l2", hp, w2, b2, op=packed_conv, act=leaky_relu,
               r=2, padding=3)
    w3, b3 = fold_conv_bn(p["l3"]["conv"], p["l3"]["bn"], s["l3"]["bn"])
    hp = qconv(f"{name}.l3", hp, w3, b3, op=packed_conv, act=leaky_relu,
               r=2, padding=3)
    return qconv(f"{name}.final", hp, p["final"]["w"], p["final"]["b"],
                 op=packed_conv_r, requant=False, r_in=2, r_out=1,
                 padding=3, t_in=t)


def apply_packed(params, state, x, q=None, grouped: bool | None = None,
                 lstm_impl: str = "auto"):
    """Eval-mode apply() with the packed encoder/decoder stages; the LSTM
    recurrence itself is untouched (it is latency-bound, not traffic-bound —
    docs/PERFORMANCE.md) and runs in the parameter dtype even under int8
    serving. Requires T % 4 == 0 (callers fall back to apply() otherwise).
    `grouped=None` (default) routes by measurement: the dual decoders run
    grouped (one feature_group_count=2 stack — decode_grouped docstring) in
    FLOAT mode, where grouping wins +13% device; under int8 the grouped
    lowering measured 7% SLOWER (179.3 vs 167.8 ms/120 s, scripts/
    profile_serve_ablate.py int8_grouped/int8_ungrouped), so int8 defaults
    to the two-stack decode. Explicit True/False forces a layout; grouped
    int8 remains bit-identical to ungrouped and the two layouts' scales
    files are interchangeable (tuple quantization points — test_quant.py).
    x: [B, T, 1] -> [B, T, 2]."""
    from ..ops.quant import ctx_or_null

    q = ctx_or_null(q)
    if grouped is None:
        grouped = not q.active
    t = x.shape[1]
    h = encode_packed(params, state, x, q=q)
    h = h.astype(params["lstm"][0]["w_hh"].dtype)
    h = stacked_lstm(h, params["lstm"], impl=lstm_impl)
    if grouped:
        return _decoders_apply_packed_grouped(params, state, h, t, q=q)
    hq = q.quantize_in("lstm_out", h.astype(jnp.float32) if q.quantized
                       else h)
    left = _decoder_apply_packed(params["left"], state["left"], hq, t, q,
                                 "left")
    right = _decoder_apply_packed(params["right"], state["right"], hq, t, q,
                                  "right")
    return jnp.concatenate([left, right], axis=-1)


def packed_amax(params, state, x):
    """Calibration forward for apply_packed's int8 mode (ops/quant.py)."""
    from ..ops import quant

    return quant.packed_amax(apply_packed, params, state, x)
