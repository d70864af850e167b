#!/usr/bin/env python
"""Probe: do packed (space-to-depth) convs pay in TRAINING? (round 5)

The round-5 train-step itemization certified the denoiser/SR steps
padding-inflated-bandwidth-bound: the dominant backward fusions touch
C=32/64 NWC tensors that tile to 128 lanes at 4x/2x HBM padding — the
exact waste `ops/packed.py` removed from the serve path (eval-only,
folded BN). This probe measures the candidate fix in isolation before
any model integration: the denoiser's two low-C encoder levels
(double conv blocks + pools, k=3, C 1->32->32 -> pool -> 64->64 -> pool)
with TRAIN-mode batch norm, forward + backward, plain vs packed.

Packed BN-train is exact: the packed layout [B, T/r, r*C] (phase-major,
index j*C+c) holds exactly the plain tensor's elements, so per-channel
batch statistics are the same mean over a reshape(..., r, C); gamma/beta
broadcast back as jnp.tile(., r). No folded weights anywhere.

    python scripts/pack_train_probe.py [check|time] [batch] [t]

`check` (CPU ok): packed fwd + grads match plain to float tolerance.
`time` (TPU): device ms per fwd+bwd step for both formulations.
"""
from __future__ import annotations

import sys
import tempfile
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("MLAR_PROBE_CPU") == "1":  # exactness check without the
    jax.config.update("jax_platforms", "cpu")  # TPU compile round trip
import jax.numpy as jnp
import numpy as np


def _init(key):
    ks = iter(jax.random.split(key, 16))
    mk = lambda k, cin, cout: {
        "w": jax.random.normal(next(ks), (3, cin, cout)) * 0.1,
        "b": jnp.zeros((cout,)),
        "gamma": jnp.ones((cout,)), "beta": jnp.zeros((cout,)),
    }
    return [mk(None, 1, 32), mk(None, 32, 32),
            mk(None, 32, 64), mk(None, 64, 64)]


def _bn_train_plain(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(0, 1))
    v = jnp.maximum(jnp.mean(jnp.square(xf), axis=(0, 1)) - m * m, 0.0)
    return ((xf - m) * jax.lax.rsqrt(v + eps) * gamma + beta).astype(x.dtype)


def _bn_train_packed(xp, r, c, gamma, beta, eps=1e-5):
    b, tp, rc = xp.shape
    xf = xp.astype(jnp.float32)
    g = xf.reshape(b, tp, r, c)
    m = jnp.mean(g, axis=(0, 1, 2))
    v = jnp.maximum(jnp.mean(jnp.square(g), axis=(0, 1, 2)) - m * m, 0.0)
    scale = jnp.tile(jax.lax.rsqrt(v + eps) * gamma, r)
    shift = jnp.tile(beta - m * jax.lax.rsqrt(v + eps) * gamma, r)
    return (xf * scale + shift).astype(xp.dtype)


def plain_forward(params, x):
    from ml_audio_restoration_tpu.ops import conv1d, leaky_relu, max_pool1d

    h = x
    for i, p in enumerate(params):
        h = conv1d(h, p["w"], p["b"], padding=1)
        h = leaky_relu(_bn_train_plain(h, p["gamma"], p["beta"]))
        if i in (1, 3):
            h = max_pool1d(h)
    return h


def packed_forward(params, x):
    from ml_audio_restoration_tpu.ops import leaky_relu, max_pool1d
    from ml_audio_restoration_tpu.ops.packed import (
        packed_conv, packed_conv_r, packed_max_pool2)

    t = x.shape[1]
    # enc0.c1 enters packed space via the rate-raising fused conv (r 1->4)
    h = packed_conv_r(x, params[0]["w"], params[0]["b"], r_in=1, r_out=4,
                      padding=1, t_in=t)
    h = leaky_relu(_bn_train_packed(h, 4, 32, params[0]["gamma"],
                                    params[0]["beta"]))
    h = packed_conv(h, params[1]["w"], params[1]["b"], r=4, padding=1)
    h = leaky_relu(_bn_train_packed(h, 4, 32, params[1]["gamma"],
                                    params[1]["beta"]))
    h = packed_max_pool2(h, 32)  # r 4 -> 2
    h = packed_conv(h, params[2]["w"], params[2]["b"], r=2, padding=1)
    h = leaky_relu(_bn_train_packed(h, 2, 64, params[2]["gamma"],
                                    params[2]["beta"]))
    h = packed_conv(h, params[3]["w"], params[3]["b"], r=2, padding=1)
    h = leaky_relu(_bn_train_packed(h, 2, 64, params[3]["gamma"],
                                    params[3]["beta"]))
    h = packed_max_pool2(h, 64)  # r 2 -> 1 == plain layout
    return h


def loss_fn(forward, params, x):
    return jnp.sum(jnp.square(forward(params, x)))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mode = argv.pop(0) if argv else "check"
    batch = int(argv.pop(0)) if argv else 16
    t = int(argv.pop(0)) if argv else 44100

    key = jax.random.PRNGKey(0)
    params = _init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, t, 1)) * 0.3
    if t % 4:
        x = x[:, :t - t % 4]

    if mode == "check":
        a = plain_forward(params, x)
        b = packed_forward(params, x)
        print("fwd shapes", a.shape, b.shape)
        print("fwd max dev", float(jnp.abs(a - b).max()))
        ga = jax.grad(partial(loss_fn, plain_forward))(params, x)
        gb = jax.grad(partial(loss_fn, packed_forward))(params, x)
        for i, (pa, pb) in enumerate(zip(ga, gb)):
            for k in pa:
                d = float(jnp.abs(pa[k] - pb[k]).max())
                rel = d / (float(jnp.abs(pa[k]).max()) + 1e-9)
                print(f"grad[{i}].{k}: max abs dev {d:.3e} rel {rel:.3e}")
        return 0

    # time: device span of jitted fwd+bwd
    from ml_audio_restoration_tpu.utils.cache import (
        enable_persistent_compile_cache)
    from ml_audio_restoration_tpu.utils.profiling import (
        sync, trace, xplane_device_times)

    enable_persistent_compile_cache()
    for name, fwd in (("plain", plain_forward), ("packed", packed_forward)):
        g = jax.jit(jax.grad(partial(loss_fn, fwd)))
        out = g(params, x)
        sync(out[0]["w"])
        out = g(params, x)
        sync(out[0]["w"])
        logdir = tempfile.mkdtemp(prefix=f"packtrain_{name}_")
        with trace(logdir):
            for _ in range(3):
                out = g(params, x)
            sync(out[0]["w"])
        times = xplane_device_times(logdir)
        spans = [s for s in times["module_step_ms"] if s > 0.5]
        ms = sum(spans) / max(len(spans), 1)
        print({"formulation": name, "batch": batch, "t": x.shape[1],
               "device_ms_per_step": round(ms, 3),
               "breakdown": {k: v for k, v in times.items()
                             if k != "module_step_ms"}})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
