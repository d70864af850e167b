#!/usr/bin/env python
"""Device-time breakdown of the jitted train step, per model family.

Runs a few steady-state training steps for each family under a
jax.profiler trace and aggregates device-side op durations from the xplane
dump (grouped into recurrence / convolution / fusion / data-movement
buckets). This is the measurement behind the training section of
docs/PERFORMANCE.md — wall-clock micro-timing is meaningless on the shared
dev relay (25 ms dispatch jitter), device time is not.

    python scripts/profile_train.py [denoiser|super_resolution|stereo_separator ...]

Prints one JSON object per family.
"""
from __future__ import annotations

import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load_xplane_pb2():
    """xplane_pb2 ships inside the tensorflow wheel here; load the generated
    module straight from its file so we don't pay (or depend on) the full
    `import tensorflow`."""
    try:
        from xprof.protobuf import xplane_pb2  # some images ship it here
        return xplane_pb2
    except ImportError:
        pass
    import importlib.util
    import site
    for root in site.getsitepackages():
        cand = Path(root) / "tensorflow/tsl/profiler/protobuf/xplane_pb2.py"
        if cand.exists():
            spec = importlib.util.spec_from_file_location("xplane_pb2", cand)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod
    raise ImportError("no xplane_pb2 found (xprof or tensorflow wheel)")


def _xplane_device_times(logdir: str) -> dict:
    """Aggregate device op durations (ms) by bucket, from the xplane dump.

    Only the serial "XLA Ops" line counts toward the total — the
    "Async XLA Ops" line holds HBM<->VMEM prefetch copies that OVERLAP
    compute (summing them double-counts; an early version of this script
    did exactly that and reported 5.8x-too-slow train steps). The true
    per-step time is the "XLA Modules" execution span; async copy time is
    reported separately as overlap only.
    """
    xplane_pb2 = _load_xplane_pb2()

    files = sorted(Path(logdir).rglob("*.xplane.pb"))
    if not files:
        raise RuntimeError(f"no xplane dump under {logdir}")
    spaces = xplane_pb2.XSpace()
    spaces.ParseFromString(files[-1].read_bytes())

    def bucket(name: str) -> str:
        n = name.lower()
        if "while" in n:
            return "recurrence(while)"
        if "conv" in n:
            return "convolution"
        if "fusion" in n:
            return "fusion(elementwise)"
        if any(k in n for k in ("copy", "gather", "scatter", "slice",
                                "transpose", "reshape", "concatenate")):
            return "data-movement"
        if any(k in n for k in ("dot", "matmul")):
            return "matmul"
        return "other"

    totals: dict = defaultdict(float)
    total = 0.0
    async_overlap = 0.0
    module_spans: list = []
    for plane in spaces.planes:
        if not plane.name.startswith("/device:"):
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name == "XLA Ops":
                for ev in line.events:
                    name = meta.get(ev.metadata_id, "")
                    totals[bucket(name)] += ev.duration_ps / 1e9
                    total += ev.duration_ps / 1e9
            elif line.name == "Async XLA Ops":
                async_overlap += sum(
                    ev.duration_ps for ev in line.events) / 1e9
            elif line.name == "XLA Modules":
                module_spans.extend(
                    ev.duration_ps / 1e9 for ev in line.events)
    # per-step span = the traced train-step programs, i.e. the large
    # module executions (tiny fold_in/convert programs are <0.1 ms)
    steps = [ms for ms in module_spans if ms > 1.0]
    return {"total_device_ms": round(total, 2),
            "module_step_ms": [round(m, 2) for m in steps],
            "async_copy_overlap_ms": round(async_overlap, 2),
            **{k: round(v, 2) for k, v in sorted(
                totals.items(), key=lambda kv: -kv[1])}}


def profile_family(model_name: str, batch: int = 16, chunk_s: float = 2.0,
                   warmup: int = 2, steps: int = 4) -> dict:
    import jax

    from bench import _TRAIN_BENCH  # single source of pairing/shape truth
    from ml_audio_restoration_tpu.config import TrainConfig, ArtifactConfig
    from ml_audio_restoration_tpu.data.loader import DataLoader
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    from ml_audio_restoration_tpu.train.trainer import Trainer
    from ml_audio_restoration_tpu.utils.profiling import trace

    module = {"denoiser": denoiser, "super_resolution": super_resolution,
              "stereo_separator": stereo_separator}[model_name]
    pairing, key_name, ch, sr = _TRAIN_BENCH[model_name]
    chunk = int(chunk_s * sr)

    class Toy:
        def __len__(self):
            return batch * (warmup + steps)

        def __getitem__(self, i):
            t = np.arange(chunk) / sr
            x = (0.3 * np.sin(2 * np.pi * (200 + 7 * i) * t)).astype(
                np.float32)
            return {key_name: np.stack([x * (1.0 if c == 0 else 0.6)
                                        for c in range(ch)])}

    Toy.pairing = pairing
    params, state = module.init(jax.random.PRNGKey(0))
    trainer = Trainer(
        model_name, params, state,
        DataLoader(Toy(), batch, num_workers=1, shuffle=False),
        config=TrainConfig(model=model_name),
        artifact_config=ArtifactConfig(), sample_rate=sr)

    batches = list(trainer.train_loader)
    key = jax.random.PRNGKey(1)
    for b in batches[:warmup]:
        trainer.state, m = trainer._train_step(trainer.state, b, key)
    float(m["loss"])  # sync compile

    logdir = tempfile.mkdtemp(prefix=f"prof_{model_name}_")
    with trace(logdir):
        for i, b in enumerate(batches[warmup:warmup + steps]):
            trainer.state, m = trainer._train_step(
                trainer.state, b, jax.random.fold_in(key, i))
        float(m["loss"])  # sync inside the trace

    times = _xplane_device_times(logdir)
    spans = times["module_step_ms"] or [times["total_device_ms"] / steps]
    step_ms = sum(spans) / len(spans)
    out = {
        "model": model_name,
        "batch": batch,
        "steps_traced": steps,
        "device_ms_per_step": round(step_ms, 2),
        "device_audio_sec_per_sec": round(batch * chunk_s / (step_ms / 1e3), 1),
        "breakdown_ms": times,
    }
    return out


def main(argv=None):
    families = (argv or sys.argv[1:]) or [
        "denoiser", "super_resolution", "stereo_separator"]
    for fam in families:
        print(json.dumps(profile_family(fam)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
