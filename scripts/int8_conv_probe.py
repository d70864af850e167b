#!/usr/bin/env python
"""Probe: does int8 conv serving beat bf16 on TPU v5e?

The serve path's non-LSTM portion is HBM-bound (docs/PERFORMANCE.md), so
int8 activations should halve its traffic vs bf16 — IF (a) XLA lowers
s8 x s8 -> s32 `conv_general_dilated` onto the MXU here, and (b) the
dequant -> leaky_relu -> requant epilogue fuses into the conv output
instead of materializing the s32 result (4 B/elem would be WORSE than
bf16).

Workload: an 8-layer k=3 C=128 conv stack at packed-serve shapes
(the denoiser/SR packed stacks are exactly this form), repeated R times
inside one jit so the measurement dwarfs the ~25 ms dispatch overhead.

    python scripts/int8_conv_probe.py            # TPU timing
    python scripts/int8_conv_probe.py --check-only   # CPU, small shapes
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

CHECK_ONLY = "--check-only" in sys.argv[1:]
if CHECK_ONLY:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def conv(x, w, pad=1, out_dtype=None):
    return lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=out_dtype)


def leaky(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def main():
    rng = np.random.default_rng(0)
    if CHECK_ONLY:
        b, t, c, layers, reps = 2, 256, 16, 3, 1
    else:
        b, t, c, layers, reps = 240, 2756, 128, 8, 10
    x = (rng.normal(size=(b, t, c)) * 0.2).astype(np.float32)
    ws = [(rng.normal(size=(3, c, c)) * (0.4 / np.sqrt(3 * c)))
          .astype(np.float32) for _ in range(layers)]

    # static per-layer activation scales, as a calibration pass would give:
    # measured here from the f32 reference activations (amax / 127)
    def f32_stack(x, ws):
        acts = [x]
        for w in ws:
            x = leaky(conv(x, w))
            acts.append(x)
        return x, acts

    y_ref, acts = jax.jit(lambda x, ws: f32_stack(x, ws))(
        jnp.asarray(x), [jnp.asarray(w) for w in ws])
    a_scales = [float(jnp.max(jnp.abs(a))) / 127.0 for a in acts]
    w_scales = [float(jnp.max(jnp.abs(w))) / 127.0 for w in ws]
    wq = [np.clip(np.round(w / s), -127, 127).astype(np.int8)
          for w, s in zip(ws, w_scales)]

    @jax.jit
    def run_f32(x, ws):
        for _ in range(reps):
            for w in ws:
                x = leaky(conv(x, w))
        return x

    @jax.jit
    def run_bf16(x, ws):
        x = x.astype(jnp.bfloat16)
        ws = [w.astype(jnp.bfloat16) for w in ws]
        for _ in range(reps):
            for w in ws:
                x = leaky(conv(x, w))
        return x.astype(jnp.float32)

    @jax.jit
    def run_int8(xq, wq, scales):
        # xq int8 in, each layer: s8 conv -> s32, dequant+leaky in f32,
        # requant to s8 for the next layer's input. scales[i] = product
        # scale for layer i output -> real units; static python floats.
        for _ in range(reps):
            for i, w in enumerate(wq):
                acc = conv(xq, w, out_dtype=jnp.int32)
                y = leaky(acc.astype(jnp.float32) * scales[i][0])
                xq = jnp.clip(jnp.round(y * scales[i][1]), -127, 127
                              ).astype(jnp.int8)
        return xq

    xj = jnp.asarray(x)
    wsj = [jnp.asarray(w) for w in ws]
    xq0 = jnp.clip(jnp.round(xj / a_scales[0]), -127, 127).astype(jnp.int8)
    wqj = [jnp.asarray(w) for w in wq]
    # scales[i] = (dequant mult for layer i acc, requant mult into layer i+1)
    scales = [(a_scales[i] * w_scales[i], 1.0 / a_scales[i + 1])
              for i in range(layers)]

    # correctness sanity: one pass of the int8 stack vs f32 (loose bar —
    # this probes lowering+perf; quality is studied on real checkpoints)
    yq = run_int8(xq0, wqj, scales)
    y_deq = np.asarray(yq, np.float32) * a_scales[-1]
    y32 = np.asarray(run_f32(xj, wsj))
    if reps == 1:
        rel = np.abs(y_deq - y32).mean() / (np.abs(y32).mean() + 1e-9)
        print(f"int8 mean rel err vs f32 (1 pass): {rel:.3f}")
    if CHECK_ONLY:
        print("check-only OK (int8 conv lowers and runs)")
        return 0

    fns = [("f32", lambda: run_f32(xj, wsj)),
           ("bf16", lambda: run_bf16(xj, wsj)),
           ("int8", lambda: run_int8(xq0, wqj, scales))]
    for name, f in fns:
        r = f()
        float(jnp.sum(r.astype(jnp.float32)))  # warm + compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(f().astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        n_convs = layers * reps
        per = min(times) * 1e3 / n_convs
        print(f"{name}: min wall {min(times)*1e3:.1f} ms "
              f"({per:.3f} ms/conv-layer)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
