#!/usr/bin/env python
"""Ablate the packed-conv subpieces on device time (companion to
profile_serve.py): which packed stages are net wins once XLA's relayout
copies at pack/unpack boundaries are charged?

configs:
  packed_dnsr   — denoiser+SR packed, stereo entirely plain
  packed_nodec  — + stereo encoder packed, decoders plain
  packed_full   — everything packed, grouped dual decoder (the default)
  dec_ungrouped — everything packed, decoders as two separate stacks
  fast_serve_grouped — fast_serve preset with the plain-layout GROUPED
                  stereo fallback at sub windows forced back on (the
                  round-3 measurement that ungated it: grouped 118.1 vs
                  ungrouped 109.3 ms device per 120 s — compare against
                  profile_serve.py's fast_serve, now the ungrouped path)
  int8_grouped / int8_ungrouped — full-window packed int8 serving with
                  the grouped vs two-stack dual decoders, both forced
                  explicitly (the A/B behind the int8 grouped gate:
                  measured 179.3 vs 167.8 ms/120 s on 2026-08-18 — int8
                  grouping LOSES 7%, so apply_packed's grouped=None auto
                  routes int8 through the two-stack decode)
  (run profile_serve.py for plain / full packed / fast_serve)

Measured 2026-08-18 (TPU v5e, 120 s): packed_full 160.7 ms vs dec_ungrouped
184.7 ms — grouping WINS 13% inside the packed layout and is the shipped
default there; every plain-layout grouped regime measured a loss
(docs/PERFORMANCE.md "Grouped dual decoders").
"""
from __future__ import annotations

import dataclasses
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    names = (argv or sys.argv[1:]) or ["packed_dnsr", "packed_nodec"]
    seconds = 120.0

    import jax

    from bench import _make_audio, _sync
    from ml_audio_restoration_tpu.config import PipelineConfig
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    from ml_audio_restoration_tpu.pipeline import RestorationPipeline
    from ml_audio_restoration_tpu.utils.cache import (
        enable_persistent_compile_cache)
    from ml_audio_restoration_tpu.utils.profiling import (
        trace, xplane_device_times)

    enable_persistent_compile_cache()
    sr = 22050
    audio = _make_audio(seconds, sr)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    stages = {"denoiser": denoiser.init(k1),
              "super_resolution": super_resolution.init(k2),
              "stereo": stereo_separator.init(k3)}

    plain_decode = stereo_separator._decoder_apply_packed

    def decoder_plain(p, s, h, t):
        return stereo_separator._decoder_apply(p, s, h, False, None)[0]

    def stereo_all_plain(params, state, x):
        return stereo_separator.apply(params, state, x)[0]

    for name in names:
        # experiment-local monkeypatches (restored after each config)
        if name == "packed_dnsr":
            stereo_separator.apply_packed, saved = (
                stereo_all_plain, stereo_separator.apply_packed)
        elif name == "packed_nodec":
            stereo_separator._decoder_apply_packed, saved = (
                decoder_plain, plain_decode)
        elif name in ("dec_ungrouped", "int8_ungrouped", "int8_grouped"):
            real_packed = stereo_separator.apply_packed
            forced = name == "int8_grouped"
            stereo_separator.apply_packed, saved = (
                lambda p, s, x, q=None: real_packed(p, s, x, q=q,
                                                    grouped=forced),
                real_packed)
        elif name == "fast_serve_grouped":
            # force the plain-layout grouped decoder through the production
            # plain-fallback call site (apply_stereo's stereo_mod.apply)
            real_apply = stereo_separator.apply
            stereo_separator.apply, saved = (
                lambda p, s, x, train=False:
                    (stereo_separator.apply_grouped(p, s, x), s),
                real_apply)
        try:
            extra = ({"compute_dtype": "bfloat16",
                      "stereo_chunk_seconds": 0.25}
                     if name == "fast_serve_grouped" else {})
            if name in ("int8_grouped", "int8_ungrouped"):
                extra = {"quantize_int8": True}
            cfg = PipelineConfig(chunk_seconds=2.0, overlap_seconds=0.05,
                                 packed_convs=True, **extra)
            pipe = RestorationPipeline(**stages, config=cfg)
            out, _ = pipe.restore(audio, sr)
            _sync(out)
            logdir = tempfile.mkdtemp(prefix=f"serve_{name}_")
            with trace(logdir):
                out, _ = pipe.restore(audio, sr)
                _sync(out)
            times = xplane_device_times(logdir)
            spans = times["module_step_ms"]
            dev_ms = max(spans) if spans else times["total_device_ms"]
            print(json.dumps({
                "config": name,
                "device_ms_per_call": round(dev_ms, 1),
                "device_xrt": round(seconds / (dev_ms / 1e3), 1),
                "breakdown": {k: v for k, v in times.items()
                              if k != "module_step_ms"},
            }), flush=True)
        finally:
            if name in ("packed_dnsr", "dec_ungrouped", "int8_ungrouped",
                        "int8_grouped"):
                stereo_separator.apply_packed = saved
            elif name == "packed_nodec":
                stereo_separator._decoder_apply_packed = saved
            elif name == "fast_serve_grouped":
                stereo_separator.apply = saved
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
