#!/usr/bin/env python
"""Device-time A/B of the STREAMING step's contested levers.

Measured 2026-08-18 (TPU v5e, batch 16 x 1-s blocks): grouped 40.0 ms vs
ungrouped 37.24 ms device per feed — the plain-layout grouped decoder LOSES
~7% in the streaming regime too, which is why streaming.py ships the legacy
two-stack decode (docs/PERFORMANCE.md "Grouped dual decoders"). Configs:

  stream_ungrouped   — StreamingRestorer(packed=True), the production path:
                       legacy two-stack decode
  stream_grouped     — same, with the decode monkeypatched to
                       stereo_separator.decode_grouped (denoiser/SR stay
                       packed, so decoder grouping is the ONLY difference)
  stream_lstm_scan   — explicit lax.scan LSTM recurrence (the default)
  stream_lstm_pallas — the Pallas kernel WITH carry I/O (ops/pallas/lstm.py)
                       in the streaming regime it previously could not run:
                       per-block scan re-entry overhead was the hypothesis
                       the kernel could beat (VERDICT r03 item 8)

Usage: python scripts/profile_streaming_ablate.py [batch] [block_seconds]
Prints one JSON line per config with per-feed device ms (xplane module
span) and streams-at-realtime, the bench.py streaming metric.
"""
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # leading numeric args: batch, block_seconds; the rest select configs
    nums = []
    while argv and argv[0].replace(".", "", 1).isdigit():
        nums.append(argv.pop(0))
    batch = int(nums[0]) if nums else 16
    block_s = float(nums[1]) if len(nums) > 1 else 1.0
    names = argv

    import numpy as np
    import jax

    from bench import _sync
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    from ml_audio_restoration_tpu.pipeline.streaming import StreamingRestorer
    from ml_audio_restoration_tpu.utils.cache import (
        enable_persistent_compile_cache)
    from ml_audio_restoration_tpu.utils.profiling import (
        trace, xplane_device_times)

    enable_persistent_compile_cache()
    sr = 22050
    n = (int(block_s * sr) // 8) * 8  # bench.py's pooling-grid rounding
    block_s = n / sr
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    stages = {"denoiser": denoiser.init(k1),
              "super_resolution": super_resolution.init(k2),
              "stereo": stereo_separator.init(k3)}
    rng = np.random.default_rng(0)
    blocks = [(rng.normal(size=(batch, n)) * 0.1).astype(np.float32)
              for _ in range(4)]

    grouped_decode = stereo_separator.decode_grouped

    all_configs = ("stream_ungrouped", "stream_grouped",
                   "stream_lstm_scan", "stream_lstm_pallas",
                   "stream_bf16", "stream_bf16_src",
                   "stream_bf16_src_int8")
    for name in (names or all_configs):
        saved = None
        impl = None
        kwargs = {}
        if name == "stream_bf16":
            kwargs = {"compute_dtype": "bfloat16"}
        elif name == "stream_bf16_src":
            kwargs = {"compute_dtype": "bfloat16", "source_rate": True}
        elif name == "stream_bf16_src_int8":
            kwargs = {"compute_dtype": "bfloat16", "source_rate": True,
                      "quantize_int8": True}
        if name == "stream_grouped":
            # force the grouped decoder through the production call site
            stereo_separator.decode, saved = (
                lambda p, s, h: (grouped_decode(p, s, h), s),
                stereo_separator.decode)
        elif name.startswith("stream_lstm_"):
            # StreamingRestorer auto-selects the kernel on TPU since the
            # round-4 adoption, overriding the module default — force the
            # arm through the constructor, not set_default_impl
            impl = name.rsplit("_", 1)[1]
        try:
            s = StreamingRestorer(**stages, batch=batch, lstm_impl=impl,
                                  **kwargs)
            for b in blocks[:3]:          # compile + warm steady state
                _sync(s.feed(b))
            logdir = tempfile.mkdtemp(prefix=f"{name}_")
            with trace(logdir):
                _sync(s.feed(blocks[3]))
            times = xplane_device_times(logdir)
            spans = times["module_step_ms"]
            dev_ms = max(spans) if spans else times["total_device_ms"]
            print(json.dumps({
                "config": name,
                "batch": batch,
                "block_seconds": round(block_s, 4),
                "device_ms_per_feed": round(dev_ms, 2),
                "streams_at_realtime": int(batch * block_s
                                           / (dev_ms / 1e3)),
                "breakdown": {k: v for k, v in times.items()
                              if k != "module_step_ms"},
            }), flush=True)
        finally:
            if saved is not None:
                stereo_separator.decode = saved
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
