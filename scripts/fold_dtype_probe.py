#!/usr/bin/env python
"""Does the f32 BN-fold intermediate force f32 convs on the bf16 path?

The fast_serve_src trace (scripts/profile_src_fusions.py) shows stereo
decoder/encoder conv fusions consuming f32[7,128,64]-shaped WEIGHTS while
activations are bf16, and running at 4.3x the HBM roofline.
`fold_conv_bn` computes `w.astype(f32) * g_f32` then casts the product
back to bf16 — XLA is free to elide the down-cast (convert(convert(x))
simplification) and lower the conv with the f32 weight operand, which on
the MXU costs multiple passes instead of one bf16 pass.

Variant under test: round g to the weight dtype FIRST, so the folded
weight is a pure bf16 product and no f32 weight intermediate exists in
the graph. (bf16 x bf16 products are exact in the MXU's f32 accumulate,
so only the one extra rounding of g distinguishes the numerics.)

    python scripts/fold_dtype_probe.py [seconds] [config ...]
"""
from __future__ import annotations

import dataclasses
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fold_weight_dtype(conv_p, bn_p, bn_s, eps: float = 1e-5):
    import jax.numpy as jnp
    from jax import lax

    w_dtype = conv_p["w"].dtype
    f32 = jnp.float32
    g32 = bn_p["scale"].astype(f32) * lax.rsqrt(bn_s["var"].astype(f32) + eps)
    g = g32.astype(w_dtype)
    w = conv_p["w"] * g  # stays at w_dtype end to end
    b = ((conv_p["b"].astype(f32) - bn_s["mean"].astype(f32)) * g32
         + bn_p["bias"].astype(f32)).astype(w_dtype)
    return w, b


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    seconds = float(argv.pop(0)) if argv and argv[0][0].isdigit() else 120.0
    names = argv or ["fast_serve_src"]

    import jax

    from bench import _make_audio, _sync
    from profile_serve import CONFIGS
    from ml_audio_restoration_tpu.config import PipelineConfig
    from ml_audio_restoration_tpu.models import (
        common, denoiser, stereo_separator, super_resolution)
    from ml_audio_restoration_tpu.pipeline import RestorationPipeline
    from ml_audio_restoration_tpu.utils.cache import (
        enable_persistent_compile_cache)
    from ml_audio_restoration_tpu.utils.profiling import (
        trace, xplane_device_times)

    model_mods = (common, denoiser, stereo_separator, super_resolution)
    orig = common.fold_conv_bn

    enable_persistent_compile_cache()
    sr = 22050
    audio = _make_audio(seconds, sr)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    stages = {"denoiser": denoiser.init(k1),
              "super_resolution": super_resolution.init(k2),
              "stereo": stereo_separator.init(k3)}

    for name in names:
        cfg = dataclasses.replace(
            PipelineConfig(chunk_seconds=2.0, overlap_seconds=0.05),
            **CONFIGS[name])
        ref_out = None
        for variant, fold in (("f32_fold", orig),
                              ("wdtype_fold", _fold_weight_dtype)):
            for m in model_mods:
                m.fold_conv_bn = fold
            try:
                pipe = RestorationPipeline(**stages, config=cfg)
                out, _ = pipe.restore(audio, sr)
                _sync(out)
                if variant == "f32_fold":
                    ref_out = np.asarray(out)
                logdir = tempfile.mkdtemp(prefix=f"fold_{name}_{variant}_")
                with trace(logdir):
                    out, _ = pipe.restore(audio, sr)
                    _sync(out)
                times = xplane_device_times(logdir)
                row = {"config": name, "variant": variant,
                       "device_ms": round(sum(times["module_step_ms"])
                                          or times["total_device_ms"], 2),
                       "buckets": {k: v for k, v in times.items()
                                   if isinstance(v, float)}}
                if variant != "f32_fold" and ref_out is not None:
                    row["max_dev_vs_f32_fold"] = float(
                        np.max(np.abs(np.asarray(out) - ref_out)))
                print(json.dumps(row), flush=True)
            finally:
                for m in model_mods:
                    m.fold_conv_bn = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
