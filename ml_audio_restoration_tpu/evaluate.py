"""Objective quality evaluation of trained checkpoints.

The reference has no quantitative evaluation (SURVEY.md §6); this module
measures what users actually care about on held-out audio:

- denoiser: SNR / SI-SDR of restored-vs-clean against degraded-vs-clean
  (fixed PRNG degradation so the comparison is reproducible)
- super-resolution: LSD of reconstructed 44.1 kHz audio vs the true
  high-rate signal, against linear-interpolation upsampling
- stereo: correlation/width of the upmix vs the stereo target

    python -m ml_audio_restoration_tpu.evaluate --eval-dir data/eval \
        --denoiser ckpt/best_model.msgpack [...]
"""
from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from .audio import find_audio_files, load_audio, normalize_audio
from .config import ArtifactConfig, PipelineConfig
from .data.artifacts import simulate_vinyl_artifacts
from .losses import snr, si_sdr, lsd, stereo_metrics, multiscale_spectral_loss
from .ops import interp_linear
from .pipeline import RestorationPipeline


def _mean_rows(rows, ndigits: int = 2) -> dict:
    """Mean each metric over per-file rows (empty-safe: {"num_files": 0}
    instead of an IndexError when the eval dir had no usable files)."""
    if not rows:
        return {"num_files": 0}
    out = {k: round(float(np.mean([r[k] for r in rows])), ndigits)
           for k in rows[0]}
    out["num_files"] = len(rows)
    return out


def evaluate_denoiser(pipe: RestorationPipeline, files, sample_rate=22050,
                      seconds=8.0, seed=0,
                      artifact_cfg: ArtifactConfig | None = None):
    """-> dict with mean SNR/SI-SDR before and after restoration."""
    rows = []
    for i, f in enumerate(files):
        clean, _ = load_audio(f, sample_rate, mono=True)
        clean = np.asarray(normalize_audio(clean))[:, :int(seconds * sample_rate)]
        degraded = np.asarray(simulate_vinyl_artifacts(
            jax.random.PRNGKey(seed + i), jnp.asarray(clean), sample_rate,
            artifact_cfg))
        restored, _ = pipe.restore(degraded, sample_rate)
        restored = np.asarray(restored)[:, :clean.shape[1]]
        c, d, r = (jnp.asarray(clean[0]), jnp.asarray(degraded[0]),
                   jnp.asarray(restored[0]))
        rows.append({
            "snr_degraded": float(snr(d, c)),
            "snr_restored": float(snr(r, c)),
            "sisdr_degraded": float(si_sdr(d, c)),
            "sisdr_restored": float(si_sdr(r, c)),
            "lsd_degraded": float(lsd(d, c)),
            "lsd_restored": float(lsd(r, c)),
            "spec_degraded": float(multiscale_spectral_loss(
                d[None, :, None], c[None, :, None])),
            "spec_restored": float(multiscale_spectral_loss(
                r[None, :, None], c[None, :, None])),
        })
    mean = _mean_rows(rows)
    if rows:
        # deltas from UNrounded means (rounding first adds up to 0.01 dB)
        mean["snr_improvement_db"] = round(
            float(np.mean([r["snr_restored"] - r["snr_degraded"]
                           for r in rows])), 2)
        mean["lsd_improvement_db"] = round(
            float(np.mean([r["lsd_degraded"] - r["lsd_restored"]
                           for r in rows])), 2)
    return mean


def evaluate_super_resolution(pipe: RestorationPipeline, files,
                              high_rate=44100, seconds=8.0):
    """-> dict with LSD of the model vs linear-interp baseline."""
    rows = []
    for f in files:
        high, _ = load_audio(f, high_rate, mono=True)  # [1, T]
        high = np.asarray(normalize_audio(high))[:, :int(seconds * high_rate)]
        t_low = high.shape[1] // 2
        # the reference's training downsample: linear, align_corners=False
        low = np.asarray(interp_linear(
            jnp.asarray(high[:, :, None]), t_low))[:, :, 0]  # [1, t_low]
        restored, _ = pipe.restore(low, high_rate // 2)
        restored = np.asarray(restored)[:, :high.shape[1]]
        baseline = np.asarray(interp_linear(
            jnp.asarray(low[:, :, None]), high.shape[1]))[:, :, 0]
        rows.append({
            "lsd_model": float(lsd(jnp.asarray(restored[0]),
                                   jnp.asarray(high[0]))),
            "lsd_linear": float(lsd(jnp.asarray(baseline[0]),
                                    jnp.asarray(high[0]))),
        })
    return _mean_rows(rows)


def evaluate_stereo(pipe: RestorationPipeline, files, sample_rate=22050,
                    seconds=8.0):
    """-> correlation/width of upmixed output vs the stereo target."""
    rows = []
    for f in files:
        stereo, _ = load_audio(f, sample_rate, mono=False)
        stereo = np.asarray(normalize_audio(stereo))[:2,
                                                     :int(seconds * sample_rate)]
        if stereo.shape[0] == 1:
            continue
        # skip mono-duplicated "stereo" (L==R): width/correlation targets
        # from such files are degenerate and would skew the averages
        if np.allclose(stereo[0], stereo[1], atol=1e-6):
            continue
        mono = stereo.mean(axis=0, keepdims=True)
        upmix, _ = pipe.restore(mono, sample_rate)
        upmix = np.asarray(upmix)[:, :stereo.shape[1]]
        got = stereo_metrics(jnp.asarray(upmix.T[None]))
        want = stereo_metrics(jnp.asarray(stereo.T[None]))
        rows.append({
            "correlation_upmix": float(got["correlation"]),
            "correlation_target": float(want["correlation"]),
            "width_upmix": float(got["width"]),
            "width_target": float(want["width"]),
        })
    return _mean_rows(rows, ndigits=3)


def add_arguments(p):
    """Shared flag set for the standalone entry and `cli evaluate`."""
    p.add_argument("--eval-dir", required=True)
    p.add_argument("--denoiser", default=None)
    p.add_argument("--super-res", default=None)
    p.add_argument("--stereo", default=None)
    p.add_argument("--stereo-eval-dir", default=None)
    p.add_argument("--seconds", type=float, default=8.0)
    return p


def main(argv=None):
    p = argparse.ArgumentParser(description="evaluate trained checkpoints")
    args = add_arguments(p).parse_args(argv)
    return run(args)


def run(args):
    files = find_audio_files(args.eval_dir)
    results = {}
    if args.denoiser:
        pipe = RestorationPipeline.from_checkpoints(
            denoiser_path=args.denoiser, config=PipelineConfig())
        results["denoiser"] = evaluate_denoiser(pipe, files,
                                                seconds=args.seconds)
    if args.super_res:
        pipe = RestorationPipeline.from_checkpoints(
            super_res_path=args.super_res, config=PipelineConfig())
        results["super_resolution"] = evaluate_super_resolution(
            pipe, files, seconds=args.seconds)
    if args.stereo:
        sfiles = find_audio_files(args.stereo_eval_dir or args.eval_dir)
        pipe = RestorationPipeline.from_checkpoints(
            stereo_path=args.stereo, config=PipelineConfig())
        results["stereo"] = evaluate_stereo(pipe, sfiles,
                                            seconds=args.seconds)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
