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
from ..ops.packed import (
    packed_conv,
    packed_conv_r,
    packed_conv_transpose,
    packed_max_pool2,
)
from .common import (
    conv_init,
    conv_transpose_init,
    double_conv_block_init,
    double_conv_block_apply,
    fold_conv_bn,
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
          axis_name: str | None = None, packed: bool = False):
    """x: [B, T, in_ch] -> ([B, T, out_ch], new_state).

    packed=True routes TRAIN-mode forwards through apply_train_packed
    (2.2x on the lane-padded low-C stages — round-5 probe) when the shape
    qualifies; eval forwards and non-qualifying shapes use this plain
    path (serving has its own packed path, apply_packed)."""
    if packed and train and x.shape[1] % 4 == 0 and x.shape[2] == 1:
        return apply_train_packed(params, state, x, axis_name)
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


# ----------------------------------------------------- packed serving path
def _detect_impulses_dense(xf):
    """detect_impulses on a dense [B, T] layout (time on the lane axis, no
    channel padding): shifted-slice diffs + an unrolled k=5 box filter, all
    one fused elementwise pass. Values match detect_impulses to float
    rounding (the conv formulation multiplies each tap by 1/k before
    summing)."""
    d1 = jnp.pad(jnp.abs(xf[:, 1:] - xf[:, :-1]), ((0, 0), (0, 1)))
    d2 = jnp.pad(jnp.abs(d1[:, 1:] - d1[:, :-1]), ((0, 0), (0, 1)))
    score = (d2 * 2.0 + d1 + jnp.abs(xf) * 0.5) / 3.5
    sp = jnp.pad(score, ((0, 0), (2, 2)))
    ma = (sp[:, 0:-4] + sp[:, 1:-3] + sp[:, 2:-2] + sp[:, 3:-1]
          + sp[:, 4:]) / 5.0
    return jnp.clip(ma, 0.0, 1.0)


def _fold(p, s):
    return fold_conv_bn(p["conv"], p["bn"], s["bn"])


# int8 serving (ops/quant.py): quantization points that stay float under
# the default skip set — sensitivity-measured on the trained fid10
# checkpoint: the LAST two decoder blocks' quantization noise reaches the
# output waveform nearly unattenuated (all-int8 output lands 14.7 dB from
# f32; floating dec2 -> 22.8 dB, dec1+dec2 -> 24.7 dB) while costing only
# ~0.6 ms of the 3.8 ms int8 stage win (10.3 -> 10.9 ms vs 14.1 bf16 at
# batch-60 serve shapes). Encoder/bottleneck/detector quantization is
# benign: their noise is attenuated by the decoder stack above it.
INT8_FLOAT_LAYERS = frozenset(
    {"dec1.c1", "dec1.c2", "dec2.c1", "dec2.c2"})


def apply_packed(params, state, x, q=None):
    """Eval-mode forward with the C<=32 full-rate stages in r-packed
    (space-to-depth) form — exactly equal to apply() up to float
    reassociation, but without the 4x (C=32) HBM lane-padding expansion
    that makes those stages the serve-path traffic (docs/PERFORMANCE.md
    "Future lever", adopted; ops/packed.py).

    All packing-rate changes are FUSED INTO convs (packed_conv_r /
    packed_conv_transpose / packed pooling): no standalone pack/unpack
    reshape exists, because XLA materializes those as full relayout copies
    that were measured to eat the conv win. x: plain [B, t, 1] -> plain
    [B, t, 1]; requires t % 4 == 0 and in/out_channels == 1 (the pipeline
    falls back to apply() otherwise). Packed region: enc0 (r4) -> pool ->
    enc1 (r2) -> pool (exits exactly to the plain layout) -> [plain
    enc2/bottleneck/dec0 at C>=128] -> up1 (r1->r2) -> dec1 (r2) -> up2
    (r2->r4 — a single pointwise 128x128 matmul) -> dec2/detector/final
    (r4, exits fused to plain).

    `q`: optional ops/quant.py QuantCtx — int8 serving (or its calibration
    pass). With q=None the emitted HLOs are exactly the default packed
    path; when quantized, activations travel between convs as int8 and the
    concat-consuming convs run as kernel-split sums (no shared scale
    needed). The sigmoid detector exit, analytic impulse score, and the
    final mask multiply stay float.
    """
    from ..ops.quant import (QT, ctx_or_null, make_qops, pooled_scale,
                             tie_pool_pairs)

    q = ctx_or_null(q)
    b_sz, t, cin = x.shape
    assert t % 4 == 0 and cin == 1, (t, cin)
    enc_p, enc_s = params["encoder"], state["encoder"]
    dec_p, dec_s = params["decoder"], state["decoder"]
    lrelu = leaky_relu
    qconv, qconv2 = make_qops(q)

    def block(name, p, s, h, r, split=None, pool_tie_c=None):
        """Eval double-conv block at packing r; `split` runs c1 as a
        kernel-split sum over (skip, up) instead of materializing the
        packed concat. `pool_tie_c`: this block's output feeds a packed
        max pool over channel pairs — tie the c2 quantization scales
        pairwise so the int8 pool compares like with like."""
        w1, b1 = _fold(p["c1"], s["c1"])
        if split is None:
            h = qconv(f"{name}.c1", h, w1, b1, op=packed_conv, act=lrelu,
                      r=r, padding=1)
        else:
            skip, up, c_skip = split
            h = qconv2(f"{name}.c1", skip, w1[:, :c_skip], up,
                       w1[:, c_skip:], b1, act=lrelu, r=r, padding=1)
        w2, b2 = _fold(p["c2"], s["c2"])
        return qconv(f"{name}.c2", h, w2, b2, op=packed_conv, act=lrelu,
                     r=r, padding=1,
                     scale_tx=(tie_pool_pairs(pool_tie_c)
                               if pool_tie_c else None))

    def qpool_packed(h, c):
        if isinstance(h, QT):
            return QT(packed_max_pool2(h.q, c), pooled_scale(h.scale, c))
        return packed_max_pool2(h, c)

    xq = q.quantize_in("in", x)

    # enc0: c1 enters packed space straight from the plain input (rate-
    # raising fused conv), c2 runs r4; pool halves the packing rate in
    # place (packed_max_pool2), so level 1 exits to the plain layout exactly
    w1, b1 = _fold(enc_p[0]["c1"], enc_s[0]["c1"])
    h = qconv("enc0.c1", xq, w1, b1, op=packed_conv_r, act=lrelu,
              r_in=1, r_out=4, padding=1, t_in=t)
    w2, b2 = _fold(enc_p[0]["c2"], enc_s[0]["c2"])
    c_e0 = enc_p[0]["c2"]["conv"]["w"].shape[2]
    skip0 = qconv("enc0.c2", h, w2, b2, op=packed_conv, act=lrelu,
                  r=4, padding=1, scale_tx=tie_pool_pairs(c_e0))
    h = qpool_packed(skip0, c_e0)
    c_e1 = enc_p[1]["c2"]["conv"]["w"].shape[2]
    skip1 = block("enc1", enc_p[1], enc_s[1], h, 2,
                  pool_tie_c=c_e1)                         # [B, t/4, 128]
    h = qpool_packed(skip1, c_e1)

    # middle (C>=128 is already lane-dense, plain layout): enc2 ->
    # bottleneck -> up0 -> dec0. Quantized only under full scope — XLA's
    # int8 lowering of plain-layout C>=128 convs measured slower than
    # bf16 on v5e (ops/quant.py QuantCtx docstring).
    up0 = params["up"][0]
    if not (q.active and q.full):
        # default path: same code path as apply() (concat decode); the
        # packed-scope dequant lands in f32 — run the plain middle in the
        # parameter/compute dtype
        h = q.deq(h).astype(up0["w"].dtype)
        h, _ = double_conv_block_apply(enc_p[2], enc_s[2], h, False)
        skip2 = h
        h = max_pool1d(h)
        h, _ = double_conv_block_apply(params["bottleneck"],
                                       state["bottleneck"], h, False)
        h = conv_transpose1d(h, up0["w"], up0["b"], stride=2, padding=0)
        if h.shape[1] != skip2.shape[1]:
            h = jnp.pad(h, ((0, 0), (0, skip2.shape[1] - h.shape[1]), (0, 0)))
        h = jnp.concatenate([skip2, h], axis=-1)
        h, _ = double_conv_block_apply(dec_p[0], dec_s[0], h, False)
    else:
        # quantized middle: same math with r=1 packed convs (== plain
        # conv1d HLO) through the ctx; dec0.c1 as a kernel-split sum
        skip2 = block("enc2", enc_p[2], enc_s[2], h, 1)
        arr2 = skip2.q if isinstance(skip2, QT) else skip2
        if isinstance(skip2, QT):
            h = QT(lax_max_pool_int8(skip2.q), skip2.scale)
        else:
            h = max_pool1d(skip2)
        h = block("bot", params["bottleneck"], state["bottleneck"], h, 1)
        t8 = (h.q if isinstance(h, QT) else h).shape[1]
        h = qconv("up0", h, up0["w"], up0["b"], op=packed_conv_transpose,
                  r_in=1, r_out=1, stride=2, padding=0, t_in=t8)
        harr = h.q if isinstance(h, QT) else h
        if harr.shape[1] != arr2.shape[1]:
            pad = ((0, 0), (0, arr2.shape[1] - harr.shape[1]), (0, 0))
            h = (QT(jnp.pad(h.q, pad), h.scale) if isinstance(h, QT)
                 else jnp.pad(h, pad))
        c2 = arr2.shape[-1]
        h = block("dec0", dec_p[0], dec_s[0], None, 1, split=(skip2, h, c2))

    # packed decoder: the k2/s2 up-convs become stride-1 packed convs that
    # also raise the packing rate (r1->r2, r2->r4)
    skip1_arr = skip1.q if isinstance(skip1, QT) else skip1
    skip0_arr = skip0.q if isinstance(skip0, QT) else skip0
    c1 = skip1_arr.shape[-1] // 2  # 64
    up1 = params["up"][1]
    h = qconv("up1", h, up1["w"], up1["b"], op=packed_conv_transpose,
              r_in=1, r_out=2, stride=2, padding=0, t_in=t // 4)
    h = block("dec1", dec_p[1], dec_s[1], None, 2, split=(skip1, h, c1))

    c0 = skip0_arr.shape[-1] // 4  # 32
    up2 = params["up"][2]
    h = qconv("up2", h, up2["w"], up2["b"], op=packed_conv_transpose,
              r_in=2, r_out=4, stride=2, padding=0, t_in=t // 2)
    h = block("dec2", dec_p[2], dec_s[2], None, 4, split=(skip0, h, c0))

    # detector: two r4 convs, then the 8->1 conv exits to plain (fused)
    l0, l1, l2 = params["transient_detector"]
    td = qconv("td0", h, l0["w"], l0["b"], op=packed_conv, act=lrelu,
               r=4, padding=1)
    td = qconv("td1", td, l1["w"], l1["b"], op=packed_conv, act=lrelu,
               r=4, padding=1)
    td = qconv("td2", td, l2["w"], l2["b"], op=packed_conv_r,
               act=jax.nn.sigmoid, requant=False, r_in=4, r_out=1,
               padding=1, t_in=t)                            # [B, t, 1]

    imp = _detect_impulses_dense(x[..., 0])
    combined = jnp.maximum(td, imp[..., None])

    fc = params["final_conv"]
    denoised = qconv("final", h, fc["w"], fc["b"], op=packed_conv_r,
                     requant=False, r_in=4, r_out=1, padding=0, t_in=t)
    return denoised * (1.0 - combined * 0.9)


def apply_train_packed(params, state, x, axis_name: str | None = None):
    """TRAIN-mode forward with the C<=64 stages r-packed — same block
    structure as apply_packed (round 3, eval/folded-BN) but with live
    batch-norm statistics (ops/conv.py::batch_norm_train_packed: exact
    per-channel stats over the (r, C) reshape) and no weight folding, so
    outputs, running-stat updates AND gradients equal apply(train=True) up
    to float reassociation (pinned by tests/test_framework.py).

    Motivation (round-5 train-step roofline, docs/PERFORMANCE.md): the
    dominant train-step fusions are C=32/64 NWC tensors lane-padded
    4x/2x in HBM; the isolated probe (scripts/pack_train_probe.py)
    measured the packed formulation 2.2x faster fwd+bwd on exactly these
    stages. Requires t % 4 == 0 and mono in/out (the Trainer falls back
    to apply() otherwise). x: [B, t, 1] -> ([B, t, 1], new_state)."""
    from ..ops import batch_norm_train_packed

    b_sz, t, cin = x.shape
    assert t % 4 == 0 and cin == 1, (t, cin)
    enc_p, enc_s = params["encoder"], state["encoder"]
    dec_p, dec_s = params["decoder"], state["decoder"]
    new_state = {"encoder": [None, None, None], "decoder": [None, None, None]}

    def bn_lrelu(p, s, h, r, c):
        y, nm, nv = batch_norm_train_packed(
            h, r, c, p["bn"]["scale"], p["bn"]["bias"],
            s["bn"]["mean"], s["bn"]["var"], axis_name=axis_name)
        return leaky_relu(y), {"bn": {"mean": nm, "var": nv}}

    def block(p, s, h, r, c, split=None):
        """Train double-conv block at packing r; `split`=(skip, up, w_cols)
        runs c1 as a kernel-split sum over the two concat halves instead of
        materializing the packed concat (same trick as apply_packed)."""
        cw, cb = p["c1"]["conv"]["w"], p["c1"]["conv"]["b"]
        if split is None:
            h = packed_conv(h, cw, cb, r=r, padding=1)
        else:
            skip, up, c_skip = split
            h = (packed_conv(skip, cw[:, :c_skip], None, r=r, padding=1)
                 + packed_conv(up, cw[:, c_skip:], cb, r=r, padding=1))
        h, s1 = bn_lrelu(p["c1"], s["c1"], h, r, c)
        h = packed_conv(h, p["c2"]["conv"]["w"], p["c2"]["conv"]["b"],
                        r=r, padding=1)
        h, s2 = bn_lrelu(p["c2"], s["c2"], h, r, c)
        return h, {"c1": s1, "c2": s2}

    # encoder: enc0 at r4 (entered via the rate-raising fused conv),
    # enc1 at r2; each packed pool halves the rate, so enc1's pool exits
    # exactly to the plain layout for the C>=128 middle
    h = packed_conv_r(x, enc_p[0]["c1"]["conv"]["w"],
                      enc_p[0]["c1"]["conv"]["b"], r_in=1, r_out=4,
                      padding=1, t_in=t)
    h, s1 = bn_lrelu(enc_p[0]["c1"], enc_s[0]["c1"], h, 4, 32)
    h = packed_conv(h, enc_p[0]["c2"]["conv"]["w"],
                    enc_p[0]["c2"]["conv"]["b"], r=4, padding=1)
    skip0, s2 = bn_lrelu(enc_p[0]["c2"], enc_s[0]["c2"], h, 4, 32)
    new_state["encoder"][0] = {"c1": s1, "c2": s2}
    h = packed_max_pool2(skip0, 32)                          # r4 -> r2

    skip1, ns = block(enc_p[1], enc_s[1], h, 2, 64)
    new_state["encoder"][1] = ns
    h = packed_max_pool2(skip1, 64)                          # r2 -> plain

    # plain middle (C>=128 is already lane-dense): enc2 -> bottleneck ->
    # up0 -> dec0, the same code path as apply()
    h, ns = double_conv_block_apply(enc_p[2], enc_s[2], h, True, axis_name)
    new_state["encoder"][2] = ns
    skip2 = h
    h = max_pool1d(h)
    h, ns = double_conv_block_apply(params["bottleneck"],
                                    state["bottleneck"], h, True, axis_name)
    new_state["bottleneck"] = ns
    up0 = params["up"][0]
    h = conv_transpose1d(h, up0["w"], up0["b"], stride=2, padding=0)
    if h.shape[1] != skip2.shape[1]:
        h = jnp.pad(h, ((0, 0), (0, skip2.shape[1] - h.shape[1]), (0, 0)))
    h = jnp.concatenate([skip2, h], axis=-1)
    h, ns = double_conv_block_apply(dec_p[0], dec_s[0], h, True, axis_name)
    new_state["decoder"][0] = ns

    # packed decoder: the k2/s2 up-convs raise the packing rate in place
    up1 = params["up"][1]
    h = packed_conv_transpose(h, up1["w"], up1["b"], r_in=1, r_out=2,
                              stride=2, padding=0, t_in=t // 4)
    h, ns = block(dec_p[1], dec_s[1], None, 2, 64, split=(skip1, h, 64))
    new_state["decoder"][1] = ns

    up2 = params["up"][2]
    h = packed_conv_transpose(h, up2["w"], up2["b"], r_in=2, r_out=4,
                              stride=2, padding=0, t_in=t // 2)
    h, ns = block(dec_p[2], dec_s[2], None, 4, 32, split=(skip0, h, 32))
    new_state["decoder"][2] = ns

    # transient detector (no BN) + analytic impulses + suppression
    l0, l1, l2 = params["transient_detector"]
    td = leaky_relu(packed_conv(h, l0["w"], l0["b"], r=4, padding=1))
    td = leaky_relu(packed_conv(td, l1["w"], l1["b"], r=4, padding=1))
    td = jax.nn.sigmoid(packed_conv_r(td, l2["w"], l2["b"], r_in=4,
                                      r_out=1, padding=1, t_in=t))

    imp = _detect_impulses_dense(x[..., 0])
    combined = jnp.maximum(td, imp[..., None])

    fc = params["final_conv"]
    denoised = packed_conv_r(h, fc["w"], fc["b"], r_in=4, r_out=1,
                             padding=0, t_in=t)
    return denoised * (1.0 - combined * 0.9), new_state


def lax_max_pool_int8(x):
    """MaxPool1d(2) on an int8 [B, T, C] tensor (reduce_window needs an
    integer identity, not -inf)."""
    from jax import lax

    return lax.reduce_window(
        x, jnp.int8(-128), lax.max,
        window_dimensions=(1, 2, 1), window_strides=(1, 2, 1),
        padding="VALID")


def packed_amax(params, state, x):
    """Calibration forward: per-quantization-point amax dict for
    apply_packed's int8 mode (ops/quant.py::calibrate)."""
    from ..ops import quant

    return quant.packed_amax(apply_packed, params, state, x)
