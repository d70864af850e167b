#!/usr/bin/env python
"""Itemize the STREAMING feed per fusion (VERDICT r04 item 5).

Round 4 took the bf16+source-rate streaming feed to 15.25 ms/feed (1049
realtime streams) via the Pallas LSTM; this script applies the
`profile_src_fusions.py` rigor to that feed: trace ONE steady-state
batched feed, rank every device op behind it (with the fused-operand HLO
display names), and byte-account each against v5e's ~819 GB/s HBM so the
post-Pallas dominators are either recoverable or certified at roofline
(docs/PERFORMANCE.md "Streaming feed per-fusion roofline").

    python scripts/profile_stream_fusions.py [batch] [block_seconds]
        [config] [top_n]

Defaults: batch 16, 1.0 s blocks, stream_bf16_src, top 30. `config` takes
the profile_streaming_ablate.py names (stream_bf16_src, stream_bf16,
stream_ungrouped, stream_bf16_src_int8).
"""
from __future__ import annotations

import json
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8}
_SHAPE_RE = re.compile(r"\b(f32|bf16|f16|f64|s32|u32|s16|u16|s8|u8|pred)"
                       r"\[([0-9,]*)\]")

# v5e HBM bandwidth (How to Scale Your Model / cloud.google.com specs)
HBM_GBPS = 819.0


def hlo_bytes(display: str) -> int:
    """Sum the bytes of every shape literal in an HLO instruction string —
    operands + outputs. Over-counts when an operand appears twice and
    ignores VMEM-resident reuse, so it is an UPPER bound on HBM traffic;
    an op whose measured ms is well above bytes/BW is compute- or
    latency-bound, one at or below it is bandwidth-bound (at roofline)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(display):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    nums = []
    while argv and argv[0].replace(".", "", 1).isdigit():
        nums.append(argv.pop(0))
    batch = int(nums[0]) if nums else 16
    block_s = float(nums[1]) if len(nums) > 1 else 1.0
    config = argv.pop(0) if argv else "stream_bf16_src"
    top_n = int(argv.pop(0)) if argv else 30

    import numpy as np
    import jax

    from bench import _sync
    from profile_src_fusions import top_ops_with_display
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    from ml_audio_restoration_tpu.pipeline.streaming import StreamingRestorer
    from ml_audio_restoration_tpu.utils.cache import (
        enable_persistent_compile_cache)
    from ml_audio_restoration_tpu.utils.profiling import (
        trace, xplane_device_times)

    enable_persistent_compile_cache()
    sr = 22050
    n = (int(block_s * sr) // 8) * 8
    block_s = n / sr
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    stages = {"denoiser": denoiser.init(k1),
              "super_resolution": super_resolution.init(k2),
              "stereo": stereo_separator.init(k3)}
    kwargs = {
        "stream_ungrouped": {},
        "stream_bf16": {"compute_dtype": "bfloat16"},
        "stream_bf16_src": {"compute_dtype": "bfloat16",
                            "source_rate": True},
        "stream_bf16_src_int8": {"compute_dtype": "bfloat16",
                                 "source_rate": True, "quantize_int8": True},
    }[config]

    rng = np.random.default_rng(0)
    blocks = [(rng.normal(size=(batch, n)) * 0.1).astype(np.float32)
              for _ in range(4)]
    s = StreamingRestorer(**stages, batch=batch, **kwargs)
    for b in blocks[:3]:
        _sync(s.feed(b))
    logdir = tempfile.mkdtemp(prefix=f"streamfus_{config}_")
    with trace(logdir):
        _sync(s.feed(blocks[3]))

    times = xplane_device_times(logdir)
    spans = times["module_step_ms"]
    dev_ms = max(spans) if spans else times["total_device_ms"]
    print(json.dumps({
        "config": config, "batch": batch, "block_seconds": round(block_s, 4),
        "device_ms_per_feed": round(dev_ms, 2),
        "streams_at_realtime": int(batch * block_s / (dev_ms / 1e3)),
        "breakdown": {k: v for k, v in times.items()
                      if k != "module_step_ms"},
    }), flush=True)
    for row in top_ops_with_display(logdir, top_n):
        # the full HLO instruction (with shape literals) is the op name;
        # display is usually just the short fusion label
        b = max(hlo_bytes(row["op"]), hlo_bytes(row["display"]))
        row["bytes_mb"] = round(b / 1e6, 2)
        row["roofline_ms"] = round(b / (HBM_GBPS * 1e9) * 1e3, 3)
        row["x_roofline"] = (round(row["ms"] / row["roofline_ms"], 1)
                             if row["roofline_ms"] > 0 else None)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
