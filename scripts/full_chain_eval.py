#!/usr/bin/env python
"""End-to-end restoration quality on the reference's actual use case.

Ground truth: clean 44.1 kHz stereo. Input: its mono mixdown, linearly
downsampled to 22.05 kHz (the torch-exact align_corners=False kernel the
SR training pairing uses) and degraded with the full 78rpm artifact stack
— i.e. a simulated shellac transfer. The pipeline then runs the same
denoise → ×2 super-res → stereo chain the reference's restore_audio does
(/root/reference/src/inference.py:17-108) with trained checkpoints.

Reported per preset: waveform SNR and LSD of the restored MID channel vs
the target mid (the stereo stage is an upmix — L/R phase vs an arbitrary
master is not a meaningful waveform target), the same for the unrestored
baseline (degraded input linearly upsampled), and output-vs-target stereo
correlation/width statistics.

    python scripts/full_chain_eval.py --eval-dir data/eval_stereo44 \
        --denoiser models/checkpoints/denoiser_fid10/denoiser/best_model.msgpack \
        --super-res models/checkpoints/sr_r2/super_resolution/best_model.msgpack \
        --stereo models/checkpoints/stereo44/stereo_separator/best_model.msgpack

Prints one JSON line; the table lands in docs/RESULTS.md.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ml_audio_restoration_tpu.audio import (  # noqa: E402
    find_audio_files, load_audio, normalize_audio)
from ml_audio_restoration_tpu.config import PipelineConfig  # noqa: E402
from ml_audio_restoration_tpu.data.artifacts import (  # noqa: E402
    simulate_vinyl_artifacts)
from ml_audio_restoration_tpu.losses import (  # noqa: E402
    lsd, snr, stereo_metrics)
from ml_audio_restoration_tpu.ops import interp_linear  # noqa: E402
from ml_audio_restoration_tpu.pipeline import RestorationPipeline  # noqa: E402
from ml_audio_restoration_tpu.utils.cache import (  # noqa: E402
    enable_persistent_compile_cache)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--eval-dir", required=True)
    p.add_argument("--denoiser", required=True)
    p.add_argument("--super-res", required=True)
    p.add_argument("--stereo", required=True)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-packed-convs", action="store_true",
                   help="legacy (pre-packed) computation order")
    p.add_argument("--fast-serve", action="store_true",
                   help="evaluate the config/fast_serve.yaml preset "
                        "(bf16 + 0.25 s stereo windows)")
    p.add_argument("--mid-exact", action="store_true")
    p.add_argument("--stereo-source-rate", action="store_true",
                   help="stereo side predicted at 22.05 kHz pre-SR (the "
                        "reference's stereo TRAINING rate), mid exact by "
                        "construction — PipelineConfig.stereo_source_rate")
    p.add_argument("--stereo-ckpt-rate", type=int, default=None,
                   help="informational: the stereo checkpoint's training "
                        "rate (use a 22.05 kHz-trained checkpoint with "
                        "--stereo-source-rate)")
    p.add_argument("--int8", action="store_true",
                   help="int8 serving quantization (PipelineConfig"
                        ".quantize_int8; auto-calibrates on the first "
                        "eval recording) — the quality-delta study "
                        "behind docs/RESULTS.md's int8 row")
    args = p.parse_args(argv)

    enable_persistent_compile_cache()
    sr_hi, sr_lo = 44100, 22050
    t_hi = int(args.seconds * sr_hi)
    cfg = PipelineConfig(packed_convs=not args.no_packed_convs,
                         stereo_mid_exact=args.mid_exact,
                         stereo_source_rate=args.stereo_source_rate)
    if args.fast_serve:
        cfg.compute_dtype = "bfloat16"
        cfg.stereo_chunk_seconds = 0.25
    if args.int8:
        cfg.quantize_int8 = True
    pipe = RestorationPipeline.from_checkpoints(
        denoiser_path=args.denoiser, super_res_path=args.super_res,
        stereo_path=args.stereo, config=cfg)

    rows = []
    for i, f in enumerate(sorted(find_audio_files(args.eval_dir))):
        stereo, _ = load_audio(f, sr_hi, mono=False)
        target = np.asarray(normalize_audio(stereo))[:2, :t_hi]
        if target.shape[0] < 2 or target.shape[1] < t_hi:
            continue
        mid_t = target.mean(axis=0)

        # simulated shellac transfer: mono mixdown -> 22.05k -> 78rpm stack
        low = np.asarray(interp_linear(
            jnp.asarray(mid_t)[None, :, None], t_hi // 2))[0, :, 0]
        degraded = np.asarray(simulate_vinyl_artifacts(
            jax.random.PRNGKey(args.seed + i), jnp.asarray(low), sr_lo))
        degraded = np.asarray(normalize_audio(degraded[None]))

        out, out_rate = pipe.restore(degraded, sr_lo)
        assert out_rate == sr_hi
        out = np.asarray(out)[:, :t_hi]
        mid_o = out.mean(axis=0)[:len(mid_t)]

        # unrestored baseline: the degraded input, linearly upsampled
        base = np.asarray(interp_linear(
            jnp.asarray(degraded[0])[None, :, None], t_hi))[0, :, 0]

        gm = stereo_metrics(jnp.asarray(out.T[None]))
        wm = stereo_metrics(jnp.asarray(target.T[None]))
        rows.append({
            "snr_mid": float(snr(jnp.asarray(mid_o), jnp.asarray(mid_t))),
            "snr_baseline": float(snr(jnp.asarray(base), jnp.asarray(mid_t))),
            "lsd_mid": float(lsd(jnp.asarray(mid_o), jnp.asarray(mid_t))),
            "lsd_baseline": float(lsd(jnp.asarray(base), jnp.asarray(mid_t))),
            "corr_out": float(gm["correlation"]),
            "corr_target": float(wm["correlation"]),
            "width_out": float(gm["width"]),
            "width_target": float(wm["width"]),
        })

    agg = {k: round(float(np.mean([r[k] for r in rows])), 2)
           for k in rows[0]} | {"num_files": len(rows)}
    print(json.dumps(agg), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
