"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock epoch prints
(/root/reference/src/training/trainer.py:476,501-506). This module provides
the TPU-native story:

- trace(): context manager around jax.profiler (xplane dumps viewable in
  TensorBoard / xprof)
- annotate(): named TraceAnnotation regions inside a step
- StepTimer: rolling wall-time stats with honest device sync (this
  environment's block_until_ready can return early — sync via checksum)
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str = "profiles"):
    """Capture a jax.profiler trace (xplane) for everything in the block."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def sync(x):
    """Force execution of a jax array and return it (checksum readback —
    see bench.py for why block_until_ready is insufficient here)."""
    import jax.numpy as jnp

    float(jnp.sum(x))
    return x


# --------------------------------------------------- xplane trace analysis
_xplane_pb2 = None


def _load_xplane_pb2():
    """xplane_pb2 ships inside the tensorflow wheel here; load the generated
    module straight from its file so we don't pay (or depend on) the full
    `import tensorflow`. Memoized: re-exec'ing a generated protobuf module
    re-registers its descriptors, which stricter protobuf builds reject
    (and bench calls this ~20x per run)."""
    global _xplane_pb2
    if _xplane_pb2 is not None:
        return _xplane_pb2
    try:
        from xprof.protobuf import xplane_pb2  # some images ship it here
        _xplane_pb2 = xplane_pb2
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
            _xplane_pb2 = mod
            return mod
    raise ImportError("no xplane_pb2 found (xprof or tensorflow wheel)")


def xplane_device_times(logdir: str, combine: str = "busiest") -> dict:
    """Aggregate device op durations (ms) by bucket from an xplane dump.

    Only the serial "XLA Ops" line counts toward the total — the
    "Async XLA Ops" line holds HBM<->VMEM prefetch copies that OVERLAP
    compute (summing them double-counts; doing so once reported
    5.8x-too-slow train steps, docs/PERFORMANCE.md). The true per-program
    time is the "XLA Modules" execution span (module_step_ms, >1 ms spans);
    async copy time is reported separately as overlap only. This is the
    congestion-proof measurement basis: device spans are unaffected by the
    dev relay's dispatch weather, so bench.py falls back to them when
    wall-clock windows are congested.

    `combine` picks the multi-plane policy: "busiest" (default) reports
    the single busiest device plane — right for mesh-sharded SPMD traces,
    where every device runs the same program CONCURRENTLY and summing
    planes would overcount by ~N_devices. "sum" adds the planes — right
    for traces whose devices run SERIALLY (the staged pipeline: one stage
    per device, one after another), where the busiest single stage would
    undercount total device time by ~N_stages.
    """
    from collections import defaultdict

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

    # Aggregate PER DEVICE PLANE, then report the busiest plane: concurrent
    # per-device spans from a mesh-sharded/staged trace would otherwise be
    # summed as if serial, overcounting device time by ~N_devices. On a
    # single-device trace (bench.py's case) this is identical to summing.
    per_plane: list = []
    for plane in spaces.planes:
        if not plane.name.startswith("/device:"):
            continue
        totals: dict = defaultdict(float)
        total = 0.0
        async_overlap = 0.0
        module_spans: list = []
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
        if total or module_spans:
            per_plane.append((total, totals, async_overlap, module_spans))
    if not per_plane:
        per_plane = [(0.0, defaultdict(float), 0.0, [])]
    if combine == "sum":
        total = sum(p[0] for p in per_plane)
        async_overlap = sum(p[2] for p in per_plane)
        totals = defaultdict(float)
        module_spans = []
        for _, t, _, ms in per_plane:
            for k, v in t.items():
                totals[k] += v
            module_spans.extend(ms)
    else:
        # tiebreak on module spans so a plane that reports modules but an
        # empty "XLA Ops" line still beats an all-zero plane
        total, totals, async_overlap, module_spans = max(
            per_plane, key=lambda p: (p[0], sum(p[3])))
    steps = [ms for ms in module_spans if ms > 1.0]
    return {"total_device_ms": round(total, 2),
            "module_step_ms": [round(m, 2) for m in steps],
            "async_copy_overlap_ms": round(async_overlap, 2),
            "device_planes": len(per_plane),
            **{k: round(v, 2) for k, v in sorted(
                totals.items(), key=lambda kv: -kv[1])}}


def xplane_top_ops(logdir: str, n: int = 20) -> list:
    """Top-N individual device ops by total time from an xplane dump.

    Returns [(op_name, total_ms, count), ...] sorted by total time,
    aggregated over the serial "XLA Ops" line of the BUSIEST device plane
    only — the same plane xplane_device_times reports, so op totals can
    be attributed against its total_device_ms (summing every plane of an
    SPMD trace would inflate each op by ~N_devices). Use after a trace()
    block to find the specific fusion/copy ops behind a bucket total —
    e.g. the relayout copies that made packed convs v1 net-slower
    (docs/PERFORMANCE.md).
    """
    from collections import defaultdict

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
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "")
                totals[name] += ev.duration_ps / 1e9
                counts[name] += 1
        per_plane.append((sum(totals.values()), totals, counts))
    if not per_plane:
        return []
    _, totals, counts = max(per_plane, key=lambda p: p[0])
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:n]
    return [(name, round(ms, 3), counts[name]) for name, ms in ranked]


class StepTimer:
    """Rolling step-time statistics (window of `keep` steps)."""

    def __init__(self, keep: int = 100):
        self.times = deque(maxlen=keep)
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._start)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def last(self) -> float:
        return self.times[-1] if self.times else 0.0

    def summary(self) -> dict:
        if not self.times:
            return {"mean_s": 0.0, "min_s": 0.0, "max_s": 0.0, "steps": 0}
        return {
            "mean_s": self.mean,
            "min_s": min(self.times),
            "max_s": max(self.times),
            "steps": len(self.times),
        }
