#!/usr/bin/env python
"""Probe: can the stereo decoders consume the LSTM's time-major output
without paying the [T,B,H]->[B,T,H] relayout twice?

Variants over x_tm [T, B, 64] -> two 4-conv decoder stacks (k7, 128/64/32/1):
  transpose  — batch-major convs on x_tm.swapaxes(0,1) (status quo: XLA
               fuses the relayout into BOTH decoder branches)
  wnc        — convs with ("WNC","WIO","WNC") dimension numbers run
               directly on the time-major tensor; only the final [T,B,1]
               outputs (tiny) are transposed
  shared     — explicit transpose behind an optimization_barrier (tests
               whether XLA materializes it once)

    python scripts/decoder_layout_probe.py          # TPU timing
    python scripts/decoder_layout_probe.py --check-only   # CPU, small shapes
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

if "--check-only" in sys.argv[1:]:
    # env-var platform selection is too late in this image (sitecustomize
    # imports jax at interpreter start) — force CPU via config instead.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def conv(x, w, dn):
    return lax.conv_general_dilated(x, w, (1,), [(3, 3)],
                                    dimension_numbers=dn)


def decoder(x, ws, dn):
    for i, w in enumerate(ws):
        x = conv(x, w, dn)
        if i < len(ws) - 1:
            x = jnp.where(x >= 0, x, 0.2 * x)
    return x


def main(argv=None):
    check_only = "--check-only" in (argv or sys.argv[1:])
    rng = np.random.default_rng(0)
    t, b, h = (256, 4, 64) if check_only else (11024, 640, 64)
    chans = [(h, 128), (128, 64), (64, 32), (32, 1)]
    x_tm = jnp.asarray(rng.normal(size=(t, b, h)).astype(np.float32) * 0.1)
    ws = [[jnp.asarray(rng.normal(size=(7, ci, co)).astype(np.float32)
                       * (0.2 / np.sqrt(7 * ci))) for ci, co in chans]
          for _ in range(2)]

    @jax.jit
    def f_transpose(x_tm, ws):
        x = x_tm.swapaxes(0, 1)  # [B, T, H]
        outs = [decoder(x, w, ("NWC", "WIO", "NWC")) for w in ws]
        return jnp.concatenate(outs, axis=-1)

    @jax.jit
    def f_wnc(x_tm, ws):
        outs = [decoder(x_tm, w, ("WNC", "WIO", "WNC")) for w in ws]
        return jnp.concatenate(outs, axis=-1).swapaxes(0, 1)

    @jax.jit
    def f_shared(x_tm, ws):
        x = lax.optimization_barrier(x_tm.swapaxes(0, 1))
        outs = [decoder(x, w, ("NWC", "WIO", "NWC")) for w in ws]
        return jnp.concatenate(outs, axis=-1)

    fns = [("transpose", f_transpose), ("wnc", f_wnc), ("shared", f_shared)]
    ref = None
    for name, f in fns:
        y = np.asarray(f(x_tm, ws))
        if ref is None:
            ref = y
        else:
            dev = float(np.abs(y - ref).max())
            print(f"{name}: max dev vs transpose {dev:.2e}")
            assert dev < 1e-5
    if check_only:
        return 0

    for name, f in fns:
        float(jnp.sum(f(x_tm, ws)))  # warm
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(jnp.sum(f(x_tm, ws)))
            times.append(time.perf_counter() - t0)
        print(f"{name}: min wall {min(times)*1e3:.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
