#!/usr/bin/env python
"""Per-op roofline itemization of the denoiser / super-resolution train
steps (VERDICT r04 item 6).

Round 4's fused-VJP kernel only touched the stereo family; the denoiser/SR
steps (62/75 ms per batch-16 step, round-3 numbers) were never itemized —
including the on-device degradation FIR/FFT stages SURVEY §2.3 calls "the
throughput bottleneck by design". This traces a few steady-state steps of
the REAL Trainer (`trainer._train_step`: degrade + forward + loss +
backward + Adam in one jit) and ranks the device ops with fused-operand
display names and bytes-vs-819-GB/s accounting, the same rigor as
profile_src_fusions.py (docs/PERFORMANCE.md "Train-step rooflines").

    python scripts/profile_train_fusions.py [family] [batch] [top_n]
        [dtype]

Defaults: denoiser, batch 16, top 25, float32. family also takes
super_resolution / stereo_separator; dtype takes bfloat16 (the AMP
analogue TrainConfig.compute_dtype) for the halved-traffic A/B.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    family = argv.pop(0) if argv else "denoiser"
    batch = int(argv.pop(0)) if argv else 16
    top_n = int(argv.pop(0)) if argv else 25
    dtype = argv.pop(0) if argv else "float32"

    import tempfile

    import jax

    from bench import _make_trainer, _sync
    from profile_src_fusions import top_ops_with_display
    from profile_stream_fusions import HBM_GBPS, hlo_bytes
    from ml_audio_restoration_tpu.utils.cache import (
        enable_persistent_compile_cache)
    from ml_audio_restoration_tpu.utils.profiling import (
        trace, xplane_device_times)

    enable_persistent_compile_cache()
    chunk_s, steps = 2.0, 3
    trainer = _make_trainer(family, batch, chunk_s, steps + 2,
                            compute_dtype=dtype)
    batches = list(trainer.train_loader)
    key = jax.random.PRNGKey(1)
    for b in batches[:2]:  # compile + warm
        trainer.state, m = trainer._train_step(trainer.state, b, key)
    _sync(m["loss"])

    logdir = tempfile.mkdtemp(prefix=f"trainfus_{family}_")
    with trace(logdir):
        for i, b in enumerate(batches[2:2 + steps]):
            trainer.state, m = trainer._train_step(
                trainer.state, b, jax.random.fold_in(key, i))
        _sync(m["loss"])

    times = xplane_device_times(logdir)
    spans = [s for s in times["module_step_ms"] if s > 1.0]
    step_ms = (sum(spans) / len(spans) if spans
               else times["total_device_ms"] / steps)
    print(json.dumps({
        "model": family, "batch": batch, "chunk_seconds": chunk_s,
        "compute_dtype": dtype,
        "device_ms_per_step": round(step_ms, 2),
        "device_audio_sec_per_sec": round(
            batch * chunk_s / (step_ms / 1e3), 1),
        "breakdown": {k: v for k, v in times.items()
                      if k != "module_step_ms"},
    }), flush=True)
    for row in top_ops_with_display(logdir, top_n):
        # the full HLO instruction (with shape literals) is the op name;
        # display is usually just the short fusion label
        b = max(hlo_bytes(row["op"]), hlo_bytes(row["display"]))
        row["bytes_mb"] = round(b / 1e6, 2)
        # per-invocation roofline (the ms column is the total over `count`)
        row["roofline_ms"] = round(
            row["count"] * b / (HBM_GBPS * 1e9) * 1e3, 3)
        row["x_roofline"] = (round(row["ms"] / row["roofline_ms"], 1)
                             if row["roofline_ms"] > 0 else None)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
