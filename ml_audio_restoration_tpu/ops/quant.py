"""int8 serving quantization for the HBM-bound conv stacks.

Why: serving is HBM-bandwidth-bound outside the LSTM recurrence
(docs/PERFORMANCE.md), so int8 activations halve the conv stacks' traffic
vs bf16 and quarter it vs f32 — and TPU v5e's MXU runs s8 x s8 -> s32
natively at 2x the bf16 rate. Probe (scripts/int8_conv_probe.py): the
packed-shape C=128 k=3 conv stack runs ~1.6x faster in int8 than f32/bf16
device-side.

Scheme: symmetric linear quantization. Weights are quantized per output
channel inside the trace (the tensors are tiny — this constant-folds into
a few small HLOs per program, like the packed-kernel gathers). Activations
use STATIC per-point PER-CHANNEL scales from a calibration pass
(amax/127 over the batch+time axes): dynamic absmax would cost the very
HBM reduction pass the scheme saves, and a single per-tensor scale
measured catastrophically coarse on trained checkpoints (the folded BN
leaves channels with wildly different ranges: the fid10 denoiser's int8
output came out 8 dB from f32 per-tensor vs ~30 dB per-channel). The
consuming conv folds its input's per-channel scales into its f32 kernel
BEFORE weight quantization (conv is linear per channel pair, so
x_q[c]*s[c] commutes into w[k,c,o]*s[c]) — per-channel activation
scaling is therefore runtime-free AND equalizes the weight columns ahead
of their own quantization. Each conv runs s8 conv -> s32, then its
epilogue dequantizes (per-output-channel), adds bias/residual, applies
the activation, and requantizes for the next layer — all elementwise,
fused into the conv output by XLA, so the tensors that actually move
through HBM are int8.

No reference counterpart (/root/reference serves f32/AMP on GPU); this is
an opt-in serving mode (PipelineConfig.quantize_int8) — quantization error
(~1e-2 waveform deviation) is far above the 1e-3 parity bar, so the
default path is untouched. Quality on trained checkpoints is measured in
docs/RESULTS.md (scripts/full_chain_eval.py --int8).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NWC", "WIO", "NWC")


class QT(NamedTuple):
    """A quantized activation: int8 values + its static per-channel dequant
    scale ([C] vector over the trailing axis; constant-folded by XLA)."""
    q: jnp.ndarray
    scale: jnp.ndarray


def quantize_weight(wp):
    """f32/bf16 [k, ci, co] -> (int8 [k, ci, co], f32 [co] per-channel scales).

    Runs on the PACKED kernel (after ops/packed.py's block-Toeplitz gather),
    so each packed output channel gets its own scale."""
    wp = wp.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wp), axis=(0, 1)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wp / s), -127, 127).astype(jnp.int8)
    return wq, s


def requantize(y, scale):
    """f32/bf16 [..., C] -> int8 with a per-channel [C] (or scalar) scale."""
    inv = 1.0 / jnp.asarray(scale, jnp.float32)
    return jnp.clip(jnp.round(y.astype(jnp.float32) * inv), -127, 127
                    ).astype(jnp.int8)


def dequantize(x):
    if isinstance(x, QT):
        return x.q.astype(jnp.float32) * jnp.asarray(x.scale, jnp.float32)
    return x


def int8_exec(x_scale):
    """Conv executor for ops/packed.py's `_exec` hook: s8 x s8 -> s32 on the
    MXU, dequantized (+bias) in the epilogue. The caller's packed op builds
    the packed f32 kernel and the tiled bias; quantization happens here so
    per-packed-channel weight scales line up with the packed output.
    `x_scale`: the input's per-channel dequant scales, folded into the
    kernel's input-channel axis before weight quantization (free at
    runtime; the fold constant-folds with the kernel gathers)."""

    def _exec(xq, wp, bias, *, window_strides, padding, lhs_dilation=None,
              groups: int = 1):
        xs = jnp.asarray(x_scale, jnp.float32).reshape(-1)
        if groups > 1:
            # feature_group_count=G conv: the kernel's input axis spans ONE
            # group's channels while the input scale vector spans all G
            # groups (group-major, matching ops/packed.py's grouped layout).
            # Fold each group's input scales into its own group-major output
            # columns — per output channel this reproduces the ungrouped
            # fold exactly, so grouped int8 decoders quantize identically
            # to two independent ones (models/stereo_separator.py).
            k, ci, co = wp.shape
            xs_g = xs.reshape(groups, ci)
            w4 = (wp.reshape(k, ci, groups, co // groups)
                  * xs_g.T[None, :, :, None])
            wq, ws = quantize_weight(w4.reshape(k, ci, co))
        else:
            wq, ws = quantize_weight(wp * xs[None, :, None])
        acc = lax.conv_general_dilated(
            xq, wq, window_strides, padding,
            lhs_dilation=lhs_dilation, dimension_numbers=_DIMNUMS,
            feature_group_count=groups,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * ws
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y

    return _exec


class QuantCtx:
    """Threads int8 serving (or its calibration pass) through a forward.

    Modes:
      QuantCtx()            — CALIBRATE: forward computes in f32; `out()`
        records each quantization point's running amax (traced scalars in
        .amax, to be maxed over batches and turned into scales host-side).
        Calibration always records EVERY point (scope-independent), so one
        scales file serves either serving scope.
      QuantCtx(scales=dict) — QUANTIZED: activations travel between convs
        as int8 `QT`s; `exec_for()` yields the int8 executor per input.

    `scope` (quantized mode only): "full" quantizes every conv stack;
    "packed" quantizes only the stages that run in r>1 packed layout —
    measured (docs/PERFORMANCE.md "int8"): XLA's int8 lowering of the
    plain-layout C>=128 dilated/pointwise convs (stereo encoder tail,
    denoiser middle) is SLOWER than bf16 on v5e, while the packed stages
    (dense stride-1 block-Toeplitz convs) win, so the model forwards route
    those plain stages back to the float path when `full` is False.

    Model forwards take `q=None` (a null ctx) by default and emit exactly
    the HLOs they always did — the ctx indirection exists only at trace
    time.
    """

    active = True

    def __init__(self, scales: dict | None = None, scope: str = "full",
                 skip=frozenset()):
        """`skip`: quantization-point names that stay float (sensitivity-
        driven mixed precision — e.g. the denoiser's last decoder block,
        whose quantization noise reaches the output unattenuated:
        models/denoiser.py::INT8_FLOAT_LAYERS). Ignored while calibrating
        (amax is still recorded so the same scales file serves any skip)."""
        assert scope in ("full", "packed"), scope
        self.scales = scales
        self.scope = scope
        self.skip = frozenset(skip)
        self.amax: dict = {}

    @property
    def full(self) -> bool:
        """True when the plain-layout (non-packed) stages also quantize.
        Calibration is always full: it records every point."""
        return self.scales is None or self.scope == "full"

    @property
    def quantized(self) -> bool:
        return self.scales is not None

    def record(self, name, y):
        # per-channel amax over the batch/time axes ([C] vector). A TUPLE
        # name marks a group-major grouped tensor (e.g. the grouped dual
        # decoders' (left.*, right.*)): its amax splits into equal per-group
        # slices recorded under the individual names, so grouped and
        # ungrouped forwards produce the SAME calibration (and one scales
        # file serves both paths).
        m = jnp.max(jnp.abs(y.astype(jnp.float32)),
                    axis=tuple(range(y.ndim - 1)))
        names = name if isinstance(name, tuple) else (name,)
        for n, part in zip(names, jnp.split(m, len(names))):
            self.amax[n] = (jnp.maximum(self.amax[n], part)
                            if n in self.amax else part)

    def scale_of(self, name, tx=None):
        if isinstance(name, tuple):
            # group-major grouped point: concatenate the per-group scales
            s = jnp.concatenate([self.scale_of(n) for n in name])
            return tx(s) if tx is not None else s
        if name not in self.scales:
            raise KeyError(
                f"int8 scales have no entry for quantization point {name!r}"
                f" — they were calibrated for a different pipeline/stage "
                f"configuration. Recalibrate (PipelineConfig.quantize_int8 "
                f"auto-calibrates when no scales file is loaded).")
        s = jnp.asarray(self.scales[name], jnp.float32).reshape(-1)
        return tx(s) if tx is not None else s

    def quantize_in(self, name: str, x):
        """Entry point: bring an f32 tensor into the quantized domain."""
        if not self.quantized:
            self.record(name, x)
            return x
        if name in self.skip:
            return x
        s = self.scale_of(name)
        return QT(requantize(x, s), s)

    def exec_for(self, x):
        """(raw array, _exec hook) for a conv input that may be f32 or QT."""
        if isinstance(x, QT):
            return x.q, int8_exec(x.scale)
        return x, None

    def out(self, name: str, y, act=None, requant: bool = True,
            scale_tx=None):
        """Close a conv layer: activation, then requantize (or record amax
        when calibrating). requant=False marks an exit back to float.
        `scale_tx`: optional transform applied to the stored scale vector
        before use (e.g. tie_pool_pairs for outputs feeding a packed max
        pool, where pooled channel pairs must share a scale)."""
        if act is not None:
            y = act(y)
        if not self.quantized:
            if requant:
                self.record(name, y)
            return y
        if not requant or name in self.skip:
            return y
        s = self.scale_of(name, scale_tx)
        return QT(requantize(y, s), s)

    def deq(self, x):
        return dequantize(x)


class _NullCtx:
    """Inactive ctx: the default (non-quantized) serving path."""

    active = False
    quantized = False
    full = False

    def quantize_in(self, name, x):
        return x

    def exec_for(self, x):
        return x, None

    def out(self, name, y, act=None, requant=True, scale_tx=None):
        return act(y) if act is not None else y

    def deq(self, x):
        return x


NULL_CTX = _NullCtx()


def ctx_or_null(q):
    return NULL_CTX if q is None else q


def make_qops(q):
    """(qconv, qconv2) layer helpers bound to a ctx.

    qconv: one conv layer — conv (+ optional residual `add`) + activation,
    then requantize/record. With the null ctx this emits exactly
    `act(op(h, w, bias, **kw) + add)`.
    qconv2: kernel-split sum of two convs over differently-scaled inputs
    (replaces a concat-consuming conv; bias rides the first half).
    """
    from .packed import packed_conv

    def qconv(name, h, w, bias, *, op, act=None, requant=True, add=None,
              scale_tx=None, **kw):
        # `w` may be a tuple of per-group kernels (grouped packed convs —
        # ops/packed.py::_group_kernels); dtype bookkeeping uses group 0
        w0 = w[0] if isinstance(w, (list, tuple)) else w
        hr, ex = q.exec_for(h)
        if q.quantized and ex is None:
            # float input in quantized mode (a skipped/exited section):
            # run the conv in the parameter dtype, not the f32 the dequant
            # epilogue produced
            hr = hr.astype(w0.dtype)
        y = op(hr, w, bias, _exec=ex, **kw)
        if add is not None:
            y = y + q.deq(add)
        out = q.out(name, y, act=act, requant=requant, scale_tx=scale_tx)
        if q.quantized and not isinstance(out, QT):
            out = out.astype(w0.dtype)  # float exits land in compute dtype
        return out

    def qconv2(name, h1, w1, h2, w2, bias, *, act=None, **kw):
        h1r, ex1 = q.exec_for(h1)
        h2r, ex2 = q.exec_for(h2)
        if q.quantized and ex1 is None:
            h1r = h1r.astype(w1.dtype)
        if q.quantized and ex2 is None:
            h2r = h2r.astype(w2.dtype)
        y = (packed_conv(h1r, w1, bias, _exec=ex1, **kw)
             + packed_conv(h2r, w2, None, _exec=ex2, **kw))
        out = q.out(name, y, act=act)
        if q.quantized and not isinstance(out, QT):
            out = out.astype(w1.dtype)
        return out

    return qconv, qconv2


def tie_pool_pairs(c: int):
    """scale_tx for a quantization point feeding packed_max_pool2: the pool
    maxes raw int8 across the (2i, 2i+1) packing-phase channel pairs, which
    is only meaningful when each pair shares one scale — tie each pair to
    its max. The pooled QT's scale is then every other entry (see the
    models' qpool helpers)."""

    def tx(s):
        m = jnp.max(s.reshape(-1, 2, c), axis=1, keepdims=True)
        return jnp.broadcast_to(m, (s.size // (2 * c), 2, c)).reshape(-1)

    return tx


def pooled_scale(s, c: int):
    """Scale vector of packed_max_pool2's output given the (tied) input
    scale vector: one entry per surviving pair."""
    return jnp.asarray(s, jnp.float32).reshape(-1, 2, c)[:, 0, :].reshape(-1)


def scales_from_amax(amax: dict) -> dict:
    """Host-side: accumulated per-point per-channel amaxes -> static scales
    (plain Python lists — JSON-serializable)."""
    import numpy as np

    return {k: (np.maximum(np.asarray(v, np.float32).reshape(-1), 1e-8)
                / 127.0).tolist()
            for k, v in amax.items()}


def packed_amax(apply_packed, params, state, x) -> dict:
    """Calibration forward for any apply_packed-style model entry: run it
    with a recording QuantCtx and return the per-quantization-point amax
    dict. The single home of the calibration entry protocol; the model
    modules wrap it with their own apply_packed."""
    ctx = QuantCtx()
    apply_packed(params, state, x, q=ctx)
    return ctx.amax


def calibrate(forward, batches) -> dict:
    """Run `forward(x) -> amax dict` (jitted) over batches; return scales."""
    import numpy as np

    import jax

    jf = jax.jit(forward)
    acc: dict | None = None
    for x in batches:
        am = {k: np.asarray(v, np.float32) for k, v in jf(x).items()}
        acc = am if acc is None else {k: np.maximum(acc[k], am[k])
                                      for k in am}
    assert acc is not None, "calibration needs at least one batch"
    return scales_from_amax(acc)


def save_scales_file(path, scales: dict):
    """THE scales-file format (stage -> point -> per-channel scales), shared
    by RestorationPipeline and StreamingRestorer — one writer so the
    documented interchangeability of their files can't drift.

    Written atomically (tmp + rename): `cli serve` persists scales at
    shutdown and auto-loads the file on the next start — a crash mid-write
    must not leave truncated JSON that poisons every later daemon start."""
    import json
    import os

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(scales, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path


def load_scales_file(path) -> dict:
    import json

    with open(path) as fh:
        return json.load(fh)
