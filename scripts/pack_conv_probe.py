#!/usr/bin/env python
"""Probe: does packing C=32 channels-last convs into 128-lane space-to-depth
form beat the plain NWC layout on TPU?

Motivation: an HBM-OOM dump showed f32[16,88200,32] conv activations held
with 'Extra memory due to padding: 4.0x expansion' — XLA tiles the minor
dimension to 128 lanes, so C=32 wastes 3/4 of every tile. Serving is
HBM-bound (docs/PERFORMANCE.md), so a formulation that moves 4x fewer
bytes could beat the MXU-idle status quo even at 4x the FLOPs.

The packed form folds time 4x into channels: x[B,T,32] -> p[B,T/4,128],
and a k-tap conv becomes a ceil(k/4)+1-tap conv with 128x128 block-Toeplitz
kernels (dense-stored). Equivalence is asserted, then both are timed.

    python scripts/pack_conv_probe.py            # TPU timing
    JAX_PLATFORMS=cpu python ... --check-only    # correctness only
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def pack_kernel(w, r: int, pad: int):
    """w: [k, cin, cout] tap-major -> packed [kp, r*cin, r*cout].

    With packed padding padp = ceil(pad/r), packed alignment xp[t,b] =
    x[r*t + b - s] for any uniform s, output phase a at packed tap m reads
    input phase b through original tap j = m*r + b - a + (pad - r*padp)
    (equate the x-indices of the two formulations; s cancels, exactness is
    asserted below).
    """
    k, cin, cout = w.shape
    padp = -(-pad // r)
    kp = (k - 1) // r + 2  # covers j in [0, k) for all (a, b) phases
    wp = np.zeros((kp, r * cin, r * cout), w.dtype)
    for m in range(kp):
        for a in range(r):
            for b in range(r):
                j = m * r + b - a + pad - r * padp
                if 0 <= j < k:
                    wp[m, b * cin:(b + 1) * cin, a * cout:(a + 1) * cout] = \
                        w[j]
    return jnp.asarray(wp)


def conv_nwc(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--check-only", action="store_true")
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--k", type=int, default=7)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--r", type=int, default=4)
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    c, k, r = args.channels, args.k, args.r
    t = int(args.seconds * 22050) // r * r
    x = rng.normal(size=(1, t, c)).astype(np.float32) * 0.1
    ws = [rng.normal(size=(k, c, c)).astype(np.float32) / np.sqrt(k * c)
          for _ in range(args.layers)]

    pad = k // 2
    # plain: L same-pad convs with relu
    def plain(x, ws):
        for w in ws:
            x = jax.nn.relu(conv_nwc(x, w, pad))
        return x

    # packed: fold r time steps into channels once, run packed convs, unfold
    wps = [pack_kernel(np.asarray(w), r, pad) for w in ws]
    kp = wps[0].shape[0]
    # packed same-conv alignment: original output t0 = r*tp + a needs taps
    # j in [-pad, pad]; packed tap m spans j = m*r + a - b. With packed
    # padding padp on each side the covered j range is [-padp*r - (r-1),
    # padp*r + ...]; choose padp = ceil(pad / r) and slice-correct by
    # shifting the input so block alignment holds exactly:
    padp = -(-pad // r)
    shift = padp * r - pad  # extra left samples the packed view includes

    def packed(x, wps):
        b, tt, cc = x.shape
        xp = jnp.pad(x, ((0, 0), (shift, (r - shift % r) % r), (0, 0)))
        tp = xp.shape[1] // r
        xp = xp[:, :tp * r, :].reshape(b, tp, r * cc)
        for wp in wps:
            xp = jax.nn.relu(jax.lax.conv_general_dilated(
                xp, wp, (1,), [(padp, padp)],
                dimension_numbers=("NWC", "WIO", "NWC")))
        out = xp.reshape(b, tp * r, cc)
        return out[:, shift:shift + tt, :]

    jp = jax.jit(lambda x: plain(x, ws))
    jq = jax.jit(lambda x: packed(x, wps))

    xj = jnp.asarray(x)
    a = np.asarray(jp(xj))
    bq = np.asarray(jq(xj))
    # boundary semantics differ benignly: plain re-zero-pads every layer at
    # the signal edges while the packed chain carries valid conv values in
    # its block margin, so compare the interior (single layer is exact
    # everywhere — asserted in the repo's probe history)
    margin = args.layers * pad + r
    dev = float(np.abs(a - bq)[:, margin:-margin, :].max())
    print(f"equivalence interior max dev (relu-conv x{args.layers}): "
          f"{dev:.2e}")
    if args.check_only:
        return 0 if dev < 1e-3 else 1

    def timeit(f):
        float(np.asarray(f(xj)).sum())
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(f(xj)).sum())
            times.append(time.perf_counter() - t0)
        return min(times)

    tp_, tq = timeit(jp), timeit(jq)
    print(f"plain NWC C={c}: {tp_*1e3:.1f} ms   packed r={r} "
          f"C={r*c}: {tq*1e3:.1f} ms   speedup {tp_/tq:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
