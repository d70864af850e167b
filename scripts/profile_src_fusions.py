#!/usr/bin/env python
"""Itemize fast_serve_src's elementwise bucket per fusion (VERDICT r03 #2).

The fastest shipped float preset (`config/fast_serve_src.yaml`, ~70 ms
device per 120 s) is dominated by "fusion(elementwise)" (~55 ms). This
script traces ONE restore at that config and ranks the individual XLA ops
behind the bucket — op name, HLO display name (the fused op list XLA embeds
in the event metadata when available), total ms, and call count — so each
fusion can be byte-accounted against v5e's ~820 GB/s HBM in
docs/PERFORMANCE.md ("fast_serve_src per-fusion roofline").

    python scripts/profile_src_fusions.py [seconds] [config] [top_n]

Defaults: 120 s, fast_serve_src, top 30.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def top_ops_with_display(logdir: str, n: int = 30):
    """Like utils.profiling.xplane_top_ops but also returns the event
    metadata's display_name — for fusions XLA often records the full HLO
    instruction there, which names the fused operands."""
    from ml_audio_restoration_tpu.utils.profiling import _load_xplane_pb2

    xplane_pb2 = _load_xplane_pb2()
    files = sorted(Path(logdir).rglob("*.xplane.pb"))
    if not files:
        raise RuntimeError(f"no xplane dump under {logdir}")
    spaces = xplane_pb2.XSpace()
    spaces.ParseFromString(files[-1].read_bytes())

    per_plane = []
    for plane in spaces.planes:
        if not plane.name.startswith("/device:"):
            continue
        totals: dict = defaultdict(float)
        counts: dict = defaultdict(int)
        display: dict = {}
        meta = dict(plane.event_metadata.items())
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else ""
                totals[name] += ev.duration_ps / 1e9
                counts[name] += 1
                if m is not None and m.display_name:
                    display[name] = m.display_name
        per_plane.append((sum(totals.values()), totals, counts, display))
    if not per_plane:
        return []
    _, totals, counts, display = max(per_plane, key=lambda p: p[0])
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:n]
    return [{"op": name, "ms": round(ms, 3), "count": counts[name],
             "display": display.get(name, "")}
            for name, ms in ranked]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    seconds = float(argv.pop(0)) if argv and argv[0][0].isdigit() else 120.0
    config = argv.pop(0) if argv else "fast_serve_src"
    top_n = int(argv.pop(0)) if argv else 30

    import jax  # noqa: F401

    from bench import _make_audio, _sync
    from profile_serve import CONFIGS
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
    cfg = dataclasses.replace(
        PipelineConfig(chunk_seconds=2.0, overlap_seconds=0.05),
        **CONFIGS[config])
    pipe = RestorationPipeline(**stages, config=cfg)
    out, _ = pipe.restore(audio, sr)
    _sync(out)
    logdir = tempfile.mkdtemp(prefix=f"srcfus_{config}_")
    with trace(logdir):
        out, _ = pipe.restore(audio, sr)
        _sync(out)
    times = xplane_device_times(logdir)
    print(json.dumps({
        "config": config, "audio_seconds": seconds,
        "buckets": {k: v for k, v in times.items()
                    if k != "module_step_ms"},
    }), flush=True)
    for row in top_ops_with_display(logdir, top_n):
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
