"""Benchmark: full restore pipeline xRT (audio-seconds per wall-second per chip).

Measures the BASELINE.json north-star config — denoise -> super-res -> stereo
over a 78rpm-style mono 22.05 kHz recording in 2-s chunks — on whatever
jax.devices()[0] is (the real TPU under the driver). Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"} where vs_baseline is xRT / 200
(the >=200x-realtime target; the PyTorch reference publishes no numbers,
BASELINE.md).

Congestion-proof design (VERDICT r02 item 5): the shared dev relay's wall
clock swings >50% between minutes and can be congested for hours, so every
number carries a "basis" — "wall" (honest sync via checksum readback) or
"device" (XLA-module execution span from a profiler trace, unaffected by
relay weather). The full set of extras (per-stage, bf16, stereo-subchunk,
train x3, streaming) is ALWAYS emitted: when the relay probe or the soft
time budget says wall timing is untrustworthy/unaffordable, extras fall
back to one traced run and report the device span instead of being skipped.
The headline full-pipeline number is reported on BOTH bases every run.
"""
from __future__ import annotations

import copy
import dataclasses
import json
import os
import signal
import statistics
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, ".")


# ------------------------------------------------------- kill-proof record
# VERDICT r03 item 1: the round-3 driver record was lost to an external
# timeout kill (rc=124, parsed: null) because the single JSON line printed
# only at the very end of main(). The record is now INDESTRUCTIBLE:
#   * `_RECORD` is a module-level best-known-so-far record, re-printed
#     (flushed) at every milestone — the driver parses the LAST parseable
#     line of the tail, so a kill at any point leaves the latest complete
#     snapshot;
#   * SIGTERM/SIGINT handlers dump the record and _exit (covers a polite
#     `timeout` kill while the main thread is running Python);
#   * a daemon WATCHDOG thread dumps + _exits at a self-imposed deadline —
#     the only protection that works while the main thread is wedged inside
#     a C-level jax/relay call, where Python signal handlers cannot run;
#   * worst-case defaults are cut so a cold run self-bounds well inside any
#     plausible external timeout (backend wait 240 s, hard budget 420 s,
#     watchdog = wait + hard + 120 s; all env-overridable for long local
#     measurement sessions). Even if an external kill lands first, the
#     progressive record lines already printed still parse.

_RECORD: dict = {
    "metric": "full_pipeline_xrt",
    "value": 0.0,
    "unit": "audio_sec/sec/chip",
    "vs_baseline": 0.0,
    "extra": {"partial": "killed before first measurement"},
}
_FINISHED = False
_PROMOTING = False        # a recovered-TPU child run owns the record now
_WATCHDOG_DEADLINE = 0.0  # absolute time.time() the watchdog fires at


def _print_record():
    """Print the current best-known record as one flushed JSON line.

    The record's nested dicts are mutated by the main thread while the
    watchdog/signal paths print from another context, so serialize a deep
    copy and retry on a mid-iteration mutation race; the last resort is a
    minimal record without `extra` (still parseable)."""
    for attempt in range(3):
        try:
            print(json.dumps(copy.deepcopy(_RECORD)), flush=True)
            return
        except RuntimeError:
            continue
    print(json.dumps({k: _RECORD[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}),
          flush=True)


def _publish(xrt: float | None = None):
    """Update the headline value (if given) and re-print the record."""
    if xrt is not None and xrt > 0:
        _RECORD["value"] = round(xrt, 2)
        _RECORD["vs_baseline"] = round(xrt / 200.0, 3)
    _RECORD["extra"].pop("partial", None)
    if not _FINISHED:
        _RECORD["extra"]["provisional"] = True
    _print_record()


def _emergency_dump(signum, frame):  # pragma: no cover - signal path
    _RECORD.setdefault("extra", {})["partial"] = f"killed by signal {signum}"
    _print_record()
    os._exit(0)


def _arm_watchdog(deadline_s: float):
    """Self-terminate with a record before any external kill can strike.
    Runs on its own thread so it fires even when the main thread is stuck
    inside a non-returning C call (hung relay RPC)."""
    global _WATCHDOG_DEADLINE
    _WATCHDOG_DEADLINE = time.time() + deadline_s

    def run():
        time.sleep(deadline_s)
        if not _FINISHED:
            if _PROMOTING:
                # a recovered-accelerator child run is streaming ITS record
                # lines through our stdout; dumping the stale parent record
                # now would make the CPU fallback the last parseable line.
                # The child is self-bounded by its own watchdog — just go.
                os._exit(0)
            _RECORD.setdefault("extra", {})["partial"] = (
                f"watchdog dump at {int(deadline_s)}s")
            _print_record()
            os._exit(0)

    threading.Thread(target=run, daemon=True, name="bench-watchdog").start()


# Arm the kill handlers and print the initial partial record the moment
# the SCRIPT starts executing (script mode only — ablation scripts import
# helpers `from bench import ...` and must not inherit signal handlers or
# stray output). This closes the startup window: the only remaining
# unprotected span is the interpreter+sitecustomize jax import BEFORE any
# bench code can run (~seconds; an external timeout fires minutes in).
if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _emergency_dump)
    signal.signal(signal.SIGINT, _emergency_dump)
    _print_record()


class _BackendProber:
    """Background accelerator probe (VERDICT r04 item 1: never abandon the
    accelerator for the whole run after one wait window).

    A daemon thread probes the backend in a SUBPROCESS (a hung init cannot
    be interrupted in-process) and keeps probing for as long as the bench
    runs — a relay that answers 10 s after the initial wait window expires
    still flips `live`, and main() promotes the record back to the TPU.
    Per-attempt timeout is a constant 300 s (clears documented congestion:
    >90 s trivial-matmul round trips + ~20 s subprocess jax import) and is
    deliberately NOT clamped to any wait budget — the r04 defect was a
    240 s total wait silently capping the 300 s congestion-safe attempt,
    misclassifying a congested-but-live relay as an outage."""

    PROBE_SRC = ("import jax, jax.numpy as jnp; x = jnp.ones((500, 500)); "
                 "print(float((x @ x).sum()))")

    def __init__(self):
        self.live = threading.Event()
        self._stop = threading.Event()

    def start(self):
        threading.Thread(target=self._run, daemon=True,
                         name="bench-backend-prober").start()
        return self

    def stop(self):
        self._stop.set()

    def _run(self):
        import subprocess

        # test knobs (tests/test_bench_record.py outage-simulation): a fake
        # probe command whose exit code scripts the outage->recovery arc,
        # and a short retry interval so the simulation runs in seconds
        fake = os.environ.get("MLAR_BENCH_PROBE_CMD")
        argv = (["/bin/sh", "-c", fake] if fake
                else [sys.executable, "-c", self.PROBE_SRC])
        interval = float(os.environ.get("MLAR_BENCH_PROBE_INTERVAL_S", "20"))
        while not self._stop.is_set() and not self.live.is_set():
            try:
                r = subprocess.run(argv, timeout=300.0, capture_output=True)
                if r.returncode == 0:
                    self.live.set()
                    return
            except (subprocess.TimeoutExpired, OSError):
                pass
            self._stop.wait(interval)


def _ensure_backend(max_wait_s: float, prober: _BackendProber):
    """Survive a TPU/relay outage at bench time (the axon backend can raise
    UNAVAILABLE or hang in init for hours — CLAUDE.md). Waits up to
    `max_wait_s` for the background prober's first success; on timeout,
    forces the CPU backend so the bench still emits its JSON line, clearly
    labeled — while the prober KEEPS probing so main() can promote back to
    the accelerator the moment it answers. Returns None when the backend is
    live, else a description of the fallback."""
    if prober.live.wait(timeout=max_wait_s):
        return None
    import jax

    jax.config.update("jax_platforms", "cpu")
    return (f"cpu (accelerator backend unavailable for "
            f"{int(max_wait_s)}s; wall numbers are CPU-host "
            f"throughput, NOT the TPU measurement)")


def _await_recovery_and_promote(prober: _BackendProber,
                                seconds_arg: float) -> bool:
    """CPU-fallback tail (VERDICT r04 item 1b): keep waiting on the
    background prober for the rest of the watchdog window; when the
    accelerator answers, re-run the FULL bench in a fresh subprocess (the
    in-process jax backend is already pinned to CPU and cannot be unpinned)
    with stdout INHERITED — the child's progressive record lines land
    directly on our stdout after the labeled CPU-fallback lines, and the
    driver parses the LAST parseable line, so a successful child run IS the
    round's record. Returns True when a child ran and owns the record."""
    global _PROMOTING
    import subprocess

    # the child needs enough window to probe (fast — backend verified live)
    # plus compile+measure at least a headline; below this floor a child
    # would only add noise before its own watchdog fires
    min_useful_s = 150.0
    margin_s = 30.0  # parent bookkeeping + child SIGTERM-dump headroom
    deadline = _WATCHDOG_DEADLINE - margin_s
    while time.time() < deadline - min_useful_s:
        if prober.live.wait(timeout=10.0):
            break
    if not prober.live.is_set():
        _RECORD["extra"]["recovery"] = (
            "accelerator never answered within the watchdog window")
        return False
    remaining = deadline - time.time()
    if remaining < 60.0:
        # recovered, but too late for a child run to add signal before the
        # watchdog — promoting now would risk an orphan child outliving us
        _RECORD["extra"]["recovery"] = (
            "accelerator recovered too late in the watchdog window")
        return False
    child_watchdog = max(min_useful_s - 30.0, remaining - 10.0)
    # derive the child's hard budget from its window, but never INFLATE an
    # explicitly-set cap (a test or a bounded local session sets the env)
    child_hard = max(60.0, child_watchdog - 200.0)
    if "MLAR_BENCH_HARD_BUDGET_S" in os.environ:
        child_hard = min(child_hard,
                         float(os.environ["MLAR_BENCH_HARD_BUDGET_S"]))
    env = dict(os.environ)
    env.update(
        MLAR_BENCH_NO_PROMOTE="1",   # no recursive promotion
        MLAR_BENCH_PROMOTED="1",     # child labels its record as promoted
        MLAR_BENCH_BACKEND_WAIT_S="120",
        MLAR_BENCH_WATCHDOG_S=str(round(child_watchdog, 1)),
        MLAR_BENCH_HARD_BUDGET_S=str(round(child_hard, 1)),
    )
    _RECORD["extra"]["recovery"] = (
        f"accelerator recovered; promoted TPU re-run with "
        f"{int(child_watchdog)}s budget")
    _PROMOTING = True
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(seconds_arg)],
        env=env)  # stdout/stderr inherited: child record lines ARE ours
    try:
        p.wait(timeout=remaining)
    except subprocess.TimeoutExpired:
        p.terminate()  # child's SIGTERM handler dumps its best-known record
        try:
            p.wait(timeout=20.0)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
    if p.returncode != 0:
        # child crashed before kill-proofing could land a useful line —
        # make the parent's labeled CPU record the last parseable line again
        _PROMOTING = False
        _RECORD["extra"]["recovery"] += f" (child rc={p.returncode})"
        return False
    return True


def _make_audio(seconds: float, sr: int = 22050):
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    sig = (0.35 * np.sin(2 * np.pi * 440 * t)
           + 0.15 * np.sin(2 * np.pi * 1320 * t)
           + 0.02 * rng.normal(size=t.shape)).astype(np.float32)
    return sig[None]


def _sync(out):
    """Force execution with a scalar checksum readback — delegates to the
    package's canonical helper so the backend workaround ("this backend's
    block_until_ready returns before execution finishes; a full-output D2H
    would measure the 42 MB/s dev tunnel") lives in exactly one place."""
    from ml_audio_restoration_tpu.utils.profiling import sync
    sync(out)


def _device_spans(run, fallback_steps: int = 1) -> list:
    """XLA-module device spans (ms) for one traced invocation of run().
    Raises RuntimeError when the trace has no device plane (CPU backend) —
    callers fall back to wall timing. fallback_steps: when the trace has no
    usable per-module spans and only the aggregate total remains, the total
    covers every program run() executed — divide by how many, so a caller
    averaging 'per-step' spans isn't handed an N-step aggregate."""
    from ml_audio_restoration_tpu.utils.profiling import (
        trace, xplane_device_times)

    logdir = tempfile.mkdtemp(prefix="bench_dev_")
    with trace(logdir):
        run()
    times = xplane_device_times(logdir)
    spans = (times["module_step_ms"]
             or [times["total_device_ms"] / max(fallback_steps, 1)])
    if max(spans) <= 0.0:
        raise RuntimeError("no device-plane spans in trace (CPU backend?)")
    return spans


def _time_pipeline(pipe, audio, sr, *, warmup: int = 1, iters: int = 3):
    """Returns the list of per-iteration wall times (caller picks min/median)."""
    for _ in range(warmup):
        out, _ = pipe.restore(audio, sr)
        _sync(out)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        out, _ = pipe.restore(audio, sr)
        _sync(out)
        times.append(time.perf_counter() - start)
    return times


_TRAIN_BENCH = {
    # model -> (pairing, batch key, channels, samples/sec at model rate)
    "denoiser": ("degrade", "clean", 1, 22050),
    "super_resolution": ("downsample", "high", 1, 44100),
    "stereo_separator": ("mono_target_stereo", "stereo", 2, 22050),
}


def _make_trainer(model_name: str, batch: int, chunk_s: float, steps: int,
                  compute_dtype: str = "float32"):
    import jax

    from ml_audio_restoration_tpu.config import TrainConfig, ArtifactConfig
    from ml_audio_restoration_tpu.data.loader import DataLoader
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    from ml_audio_restoration_tpu.train.trainer import Trainer

    module = {"denoiser": denoiser, "super_resolution": super_resolution,
              "stereo_separator": stereo_separator}[model_name]
    pairing, key_name, ch, sr = _TRAIN_BENCH[model_name]
    chunk = int(chunk_s * sr)

    class Toy:
        def __len__(self):
            return batch * (steps + 2)

        def __getitem__(self, i):
            t = np.arange(chunk) / sr
            x = (0.3 * np.sin(2 * np.pi * (200 + 7 * i) * t)).astype(
                np.float32)
            return {key_name: np.stack([x * (1.0 if c == 0 else 0.6)
                                        for c in range(ch)])}

    Toy.pairing = pairing
    params, state = module.init(jax.random.PRNGKey(0))
    return Trainer(
        model_name, params, state,
        DataLoader(Toy(), batch, num_workers=1, shuffle=False),
        config=TrainConfig(model=model_name, compute_dtype=compute_dtype),
        artifact_config=ArtifactConfig(), sample_rate=sr)


def _train_throughput(model_name: str, basis: str, batch: int = 2,
                      chunk_s: float = 2.0, steps: int = 8):
    """Steady-state training throughput (audio-seconds/second) for one model
    family: jitted derive(+degrade)+forward+loss+backward+Adam per step.
    basis 'wall' times the synced loop; 'device' reports the mean XLA-module
    step span from one traced run (congestion-proof). Returns
    (value, basis_actually_used) — the device request falls back to wall
    when the trace has no device plane."""
    import jax

    trainer = _make_trainer(model_name, batch, chunk_s, steps)
    batches = list(trainer.train_loader)
    key = jax.random.PRNGKey(1)
    for b in batches[:2]:  # warmup/compile
        trainer.state, m = trainer._train_step(trainer.state, b, key)
    _sync(m["loss"])

    def run(bs):
        for i, b in enumerate(bs):
            trainer.state, m = trainer._train_step(
                trainer.state, b, jax.random.fold_in(key, i))
        _sync(m["loss"])

    if basis == "device":
        try:
            spans = _device_spans(lambda: run(batches[2:4]),
                                  fallback_steps=2)
            big = [s for s in spans if s > 1.0] or spans
            step_s = (sum(big) / len(big)) / 1e3
            return round(batch * chunk_s / step_s, 1), "device"
        except RuntimeError:
            pass  # no device plane -> wall
    start = time.perf_counter()
    run(batches[2:2 + steps])
    step_s = (time.perf_counter() - start) / steps
    return round(batch * chunk_s / step_s, 1), "wall"


def _streaming_throughput(stages, batch: int = 16, block_s: float = 1.0,
                          blocks: int = 6, basis: str = "wall",
                          label: str = "streaming", **kwargs) -> dict:
    """Batched live-stream serving: B concurrent streams fed 1-s blocks
    through one compiled step. Reports per-block time and how many realtime
    streams that supports. `label` prefixes the stat keys and `kwargs` go
    to StreamingRestorer — the bf16+source-rate throughput preset rides
    the same harness (label="streaming_bf16_src")."""
    from ml_audio_restoration_tpu.pipeline.streaming import StreamingRestorer

    sr = 22050
    # keep blocks on the U-Net's 8-sample pooling grid so the steady state
    # reuses ONE compiled step (emission sizes stay fixed)
    n = (int(block_s * sr) // 8) * 8
    block_s = n / sr
    rng = np.random.default_rng(0)
    s = StreamingRestorer(denoiser=stages["denoiser"],
                          super_resolution=stages["super_resolution"],
                          stereo=stages["stereo"], batch=batch, **kwargs)
    feed = lambda: s.feed(rng.normal(size=(batch, n)).astype(np.float32) * 0.1)
    _sync(feed())  # compile (includes the short first-drain variant)
    _sync(feed())
    per_block = None
    if basis == "device":
        try:
            per_block = sum(s for s in _device_spans(
                lambda: _sync(feed())) if s > 1.0) / 1e3
        except RuntimeError:
            pass
    if per_block is None or per_block <= 0:
        basis = "wall"
        start = time.perf_counter()
        for _ in range(blocks):
            out = feed()
        _sync(out)
        per_block = (time.perf_counter() - start) / blocks
    return {
        f"{label}_batch": batch,
        f"{label}_block_time_s": round(per_block, 4),
        f"{label}_streams_at_realtime": int(batch * block_s / per_block),
    }, basis


def main():
    signal.signal(signal.SIGTERM, _emergency_dump)
    signal.signal(signal.SIGINT, _emergency_dump)

    # worst-case-bounded defaults (VERDICT r03 item 1): a cold run must fit
    # inside any plausible external timeout. Extras degrade to one traced
    # device-span run each past the soft budget and are skipped (recorded)
    # past the hard budget, so the cut budgets cost completeness only on a
    # congested relay — where wall numbers were weather anyway.
    backend_wait_s = float(os.environ.get("MLAR_BENCH_BACKEND_WAIT_S", "240"))
    # 420 (was 360): a congested-relay run burns ~230 s on the in-process
    # congestion probe alone (r5 measured) and then hard-skipped every
    # train/streaming extra; with progressive records + SIGTERM dump the
    # cost of running slightly longer than an external timeout is zero
    # (the last printed snapshot still parses), so the budget leans larger
    hard_budget_default = float(
        os.environ.get("MLAR_BENCH_HARD_BUDGET_S", "420"))
    _arm_watchdog(float(os.environ.get(
        "MLAR_BENCH_WATCHDOG_S",
        str(backend_wait_s + hard_budget_default + 120.0))))

    prober = _BackendProber().start()
    backend_fallback = _ensure_backend(backend_wait_s, prober)
    if backend_fallback is None:
        prober.stop()

    import jax

    if os.environ.get("MLAR_BENCH_FORCE_CPU") == "1":
        # test-only knob (outage-simulation tests): compute on the CPU host
        # regardless of probe outcome so the recovery-path test is fast and
        # deterministic; the record is labeled so it can't be misread
        jax.config.update("jax_platforms", "cpu")

    from ml_audio_restoration_tpu.utils.cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()

    from ml_audio_restoration_tpu.config import PipelineConfig
    from ml_audio_restoration_tpu.models import (
        denoiser, super_resolution, stereo_separator)
    from ml_audio_restoration_tpu.pipeline import RestorationPipeline

    seconds_arg = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    seconds = seconds_arg
    if backend_fallback:
        # CPU-host throughput is not the measurement anyway (labeled); cut
        # the fallback to the bone (VERDICT r04 item 1d: r04's CPU fallback
        # ate the whole hard budget and skipped all 19 extras) — the budget
        # belongs to the recovery wait + promoted TPU re-run instead
        seconds = min(seconds, 10.0)
    # soft budget: once exceeded, remaining extras switch from multi-
    # iteration wall timing to one traced device-span run each (they are
    # never skipped); the hard budget stops everything but the summary
    budget_s = float(os.environ.get("MLAR_BENCH_BUDGET_S", "180"))
    hard_budget_s = hard_budget_default
    t_start = time.perf_counter()

    def elapsed():
        return time.perf_counter() - t_start

    sr = 22050
    audio = _make_audio(seconds, sr)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    stages = {
        "denoiser": denoiser.init(k1),
        "super_resolution": super_resolution.init(k2),
        "stereo": stereo_separator.init(k3),
    }
    cfg = PipelineConfig(chunk_seconds=2.0, overlap_seconds=0.05)

    extra = {"device": str(jax.devices()[0]), "audio_seconds": seconds}
    if backend_fallback:
        extra["backend_fallback"] = backend_fallback
    if os.environ.get("MLAR_BENCH_PROMOTED") == "1":
        # this run IS the recovered-accelerator re-run a CPU-fallback parent
        # launched; label it so the round record shows the path it took
        extra["promoted_after_recovery"] = True
    if os.environ.get("MLAR_BENCH_FORCE_CPU") == "1":
        extra["forced_cpu"] = True
    # from here on the live `extra` dict IS the record's extra: any kill /
    # watchdog dump carries everything measured so far
    _RECORD["extra"] = extra
    bases: dict = {}
    extra["bases"] = bases

    # relay congestion probe: a trivial matmul round trip is ~1 s on an idle
    # relay and >30 s during congestion; when congested, wall numbers are
    # relay weather, so extras go straight to the device basis
    t0 = time.perf_counter()
    probe = jax.numpy.ones((1000, 1000))
    _sync(probe @ probe)
    probe_s = time.perf_counter() - t0
    extra["relay_probe_s"] = round(probe_s, 2)
    congested = probe_s > 5.0

    def basis_now():
        return "device" if (congested or elapsed() > budget_s) else "wall"

    def measure_pipeline(pipe, *, iters=2, wall_times=None):
        """-> (xrt, basis). Device basis = one traced run's module span."""
        if basis_now() == "device":
            if wall_times is None:
                # compile + warm; a caller passing wall_times already ran
                # the pipeline (on a congested relay each skipped warm
                # restore saves minutes of budget)
                out, _ = pipe.restore(audio, sr)
                _sync(out)
            try:
                # SUM of module spans, not max: a long recording dispatches
                # multiple slab programs per restore() call
                spans = _device_spans(
                    lambda: _sync(pipe.restore(audio, sr)[0]))
                dev_ms = sum(s for s in spans if s > 1.0) or max(spans)
                return seconds / (dev_ms / 1e3), "device"
            except RuntimeError:
                pass  # no device plane -> wall
        w = min(wall_times
                or _time_pipeline(pipe, audio, sr, warmup=1, iters=iters))
        return seconds / w, "wall"

    # ---------------------------------------------------------- headline
    # on a congested relay every extra wall restore is minutes of pure
    # relay weather, so the window shrinks to ONE timed iteration and the
    # device-span trace carries the headline instead
    full = RestorationPipeline(**stages, config=cfg)
    times1 = _time_pipeline(full, audio, sr,
                            warmup=1 if (congested or backend_fallback)
                            else 2,
                            iters=1 if (congested or backend_fallback)
                            else 4)
    wall = min(times1)
    extra["full_pipeline_wall_s"] = round(wall, 4)
    # first full-pipeline measurement lands -> provisional record on stdout
    # immediately (the driver parses the tail's last JSON line)
    _publish(seconds / wall)

    if backend_fallback:
        # labeled CPU headline is down; every extra would be CPU-host noise.
        # Hand the rest of the watchdog window to the recovery wait: if the
        # accelerator answers, a fresh subprocess re-runs the REAL bench and
        # its record lines (printed after ours) become the round's record.
        extra["skipped"] = ["cpu fallback: extras skipped pending "
                           "accelerator recovery"]
        _publish()
        promoted = (os.environ.get("MLAR_BENCH_NO_PROMOTE") != "1"
                    and _await_recovery_and_promote(prober, seconds_arg))
        prober.stop()
        global _FINISHED
        _FINISHED = True
        if not promoted:
            extra.pop("provisional", None)
            _publish()
        return
    # device-basis headline: stable round-over-round even on a bad relay day
    # (sum of module spans — the slab path runs several programs per call)
    try:
        spans = _device_spans(lambda: _sync(full.restore(audio, sr)[0]))
        dev_ms = sum(s for s in spans if s > 1.0) or max(spans)
        extra["device_full_pipeline_ms"] = round(dev_ms, 1)
        extra["device_full_pipeline_xrt"] = round(seconds / (dev_ms / 1e3), 1)
        if congested:
            _publish(max(seconds / wall, extra["device_full_pipeline_xrt"]))
        # the probe is a point sample and the relay can serve a calm probe
        # while starving every dispatch (measured: calm 0.96 s probe, wall
        # headline 0.3x the device basis, every wall extra ~4x under its
        # device truth). A wall headline below half the device basis IS
        # the congestion signal — flip the whole run to the device basis
        # so the extras don't record relay weather as regressions.
        if (not congested
                and seconds / wall < 0.5 * extra["device_full_pipeline_xrt"]):
            congested = True
            extra["relay_drift_detected"] = (
                "wall headline < 0.5x device basis; extras on device basis")
    except RuntimeError:
        pass  # CPU backend (no device plane)

    # ------------------------------------------------------------- extras
    # every budget-skipped extra is RECORDED (accumulated, not a single
    # overwritten key): a missing number with no skip marker would read as
    # a regression in round-over-round comparisons
    skipped: list = []

    extra["skipped"] = skipped  # live-linked: kill-time dumps carry it

    def budget_ok(label: str) -> bool:
        if elapsed() > hard_budget_s:
            if not any(s.endswith(label) for s in skipped):
                skipped.append(f"hard budget at {label}")
            return False
        return True

    def record_error(label, e):
        # one extra failing (a compile error on an exotic shape, a relay
        # hiccup) must cost ONLY that extra, never the rest of the record —
        # the round-3 lesson generalized: rc=124 lost a whole round's
        # record; an uncaught per-extra exception would lose the tail
        skipped.append(f"error at {label}: {type(e).__name__}: "
                       f"{str(e)[:160]}")
        _publish()

    for name, kwargs in [
        ("denoise_only", dict(denoiser=stages["denoiser"])),
        ("super_res_only", dict(super_resolution=stages["super_resolution"])),
        ("stereo_only", dict(stereo=stages["stereo"])),
    ]:
        if not budget_ok(name):
            continue  # not break: every skipped label must be RECORDED
        try:
            pipe = RestorationPipeline(**kwargs, config=cfg)
            xrt, basis = measure_pipeline(pipe)
            extra[f"{name}_xrt"] = round(xrt, 1)
            bases[f"{name}_xrt"] = basis
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error(name, e)
    _publish()

    # bf16 serving mode: measured max deviation vs f32 is ~1.5e-4 end-to-end,
    # well inside the <=1e-3 parity bar, so it is a valid headline config
    bf16_dev, w16 = 1.0, float("inf")
    if budget_ok("bf16_full_pipeline_xrt"):
      try:
        bf16_cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
        bf16 = RestorationPipeline(**stages, config=bf16_cfg)
        # skip the wall window when the headline will be device-basis
        # anyway (congested relay): its full restores would be pure relay
        # weather, each potentially minutes of hard budget
        times16 = (None if congested
                   else _time_pipeline(bf16, audio, sr, warmup=1, iters=4))
        w16 = min(times16) if times16 else float("inf")
        xrt16, basis = measure_pipeline(bf16, wall_times=times16)
        extra["bf16_full_pipeline_xrt"] = round(xrt16, 1)
        bases["bf16_full_pipeline_xrt"] = basis
        out32, _ = full.restore(audio, sr)
        out16, _ = bf16.restore(audio, sr)
        bf16_dev = float(np.abs(np.asarray(out32) - np.asarray(out16)).max())
        extra["bf16_max_dev_vs_f32"] = bf16_dev
        # always record the bf16 DEVICE span too (one traced restore): the
        # final headline's weather-promotion needs a device-basis candidate
        # for the usual winning config even when the probe looked calm
        try:
            spans16 = _device_spans(lambda: _sync(bf16.restore(audio, sr)[0]))
            dev16_ms = sum(s for s in spans16 if s > 1.0) or max(spans16)
            extra["bf16_device_full_pipeline_ms"] = round(dev16_ms, 1)
            extra["bf16_device_full_pipeline_xrt"] = round(
                seconds / (dev16_ms / 1e3), 1)
        except RuntimeError:
            pass  # CPU backend
      except Exception as e:  # noqa: BLE001 - one extra must not kill the record
        record_error("bf16_full_pipeline_xrt", e)
    # provisional upgrade: a parity-satisfying bf16 wall win is the usual
    # final headline — reflect it in the kill-time record immediately
    _publish(seconds / w16 if (bf16_dev <= 1e-3 and w16 < wall) else None)

    # throughput mode: 0.25 s internal stereo windows (8x fewer sequential
    # LSTM steps; quality-free on a trained model per the PERFORMANCE.md
    # sweep — identical eval metrics, <=0.011 deviation vs full windows)
    if budget_ok("stereo_subchunk_xrt"):
        try:
            fast_cfg = dataclasses.replace(cfg, stereo_chunk_seconds=0.25)
            fast = RestorationPipeline(**stages, config=fast_cfg)
            xrt, basis = measure_pipeline(fast)
            extra["stereo_subchunk_xrt"] = round(xrt, 1)
            bases["stereo_subchunk_xrt"] = basis
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error("stereo_subchunk_xrt", e)

    # the config/fast_serve.yaml preset (bf16 + 0.25 s stereo windows +
    # packed convs) and its int8 variant (config/fast_serve_int8.yaml —
    # quantized conv stacks, packed scope; auto-calibrates on the warmup
    # call). Quality-neutral on trained checkpoints per docs/RESULTS.md.
    fs_cfg = dataclasses.replace(cfg, compute_dtype="bfloat16",
                                 stereo_chunk_seconds=0.25)
    if budget_ok("fast_serve_xrt"):
        try:
            fs = RestorationPipeline(**stages, config=fs_cfg)
            xrt, basis = measure_pipeline(fs)
            extra["fast_serve_xrt"] = round(xrt, 1)
            bases["fast_serve_xrt"] = basis
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error("fast_serve_xrt", e)
    if budget_ok("fast_serve_int8_xrt"):
        try:
            q_cfg = dataclasses.replace(fs_cfg, quantize_int8=True)
            qp = RestorationPipeline(**stages, config=q_cfg)
            xrt, basis = measure_pipeline(qp)
            extra["fast_serve_int8_xrt"] = round(xrt, 1)
            bases["fast_serve_int8_xrt"] = basis
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error("fast_serve_int8_xrt", e)

    # source-rate stereo (config/fast_serve_src.yaml): the side is
    # predicted at the pre-SR rate — half the LSTM steps, measured 1708x
    # device-side (docs/PERFORMANCE.md "Source-rate stereo")
    src_cfg = dataclasses.replace(fs_cfg, stereo_source_rate=True)
    if budget_ok("fast_serve_src_xrt"):
        try:
            sp = RestorationPipeline(**stages, config=src_cfg)
            xrt, basis = measure_pipeline(sp)
            extra["fast_serve_src_xrt"] = round(xrt, 1)
            bases["fast_serve_src_xrt"] = basis
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error("fast_serve_src_xrt", e)
    # ...and composed with int8 conv stacks — the fastest measured serving
    # configuration (2106x device in the round-4 ablate runs); previously
    # only the ablate scripts measured it, so the official record lacked
    # the best number the repo ships
    if budget_ok("fast_serve_src_int8_xrt"):
        try:
            qsrc_cfg = dataclasses.replace(src_cfg, quantize_int8=True)
            qsp = RestorationPipeline(**stages, config=qsrc_cfg)
            xrt, basis = measure_pipeline(qsp)
            extra["fast_serve_src_int8_xrt"] = round(xrt, 1)
            bases["fast_serve_src_int8_xrt"] = basis
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error("fast_serve_src_int8_xrt", e)
    _publish()

    # coalesced short-request serving (restore_many — the HTTP daemon's
    # dynamic batching): K short recordings through ONE combined chunk-batch
    # program vs K individual bucket-padded programs. Device basis (sum of
    # module spans) — the win is bucket padding + per-request program count,
    # both device-side effects.
    if budget_ok("coalesce_speedup"):
        k_req, req_s = 6, 10.0
        shorts = [_make_audio(req_s, sr) for _ in range(k_req)]

        def run_individual():
            for a in shorts:
                _sync(full.restore(a, sr)[0])

        def run_coalesced():
            for o, _ in full.restore_many(shorts, sr):
                _sync(o)

        try:
            run_individual()  # compile + warm
            run_coalesced()
            ind_ms = sum(_device_spans(run_individual))
            co_ms = sum(_device_spans(run_coalesced))
            if ind_ms > 0 and co_ms > 0:
                extra["coalesce_individual_ms"] = round(ind_ms, 1)
                extra["coalesce_coalesced_ms"] = round(co_ms, 1)
                extra["coalesce_speedup"] = round(ind_ms / co_ms, 2)
                extra["coalesce_requests"] = k_req
                bases["coalesce_speedup"] = "device"
        except RuntimeError:
            skipped.append("no device plane at coalesce_speedup")

    # serving latency (VERDICT r03 item 6): short-burst p50/p99 over the
    # REAL HTTP daemon — decode -> queue -> device -> D2H -> encode, the
    # number a deployment SLO would track (the 30-min soak's counterpart,
    # docs/PERFORMANCE.md "Serving soak"). Latency is wall by nature; under
    # congestion it falls back to the device span of one request-sized
    # program (a labeled floor) so the record never goes missing. The 10-s
    # request reuses the coalesce extra's compiled program when that ran.
    if budget_ok("serve_latency_p50_ms"):
        req_audio = _make_audio(10.0, sr)
        if basis_now() == "wall":
            from ml_audio_restoration_tpu.audio.wav import encode_wav
            from ml_audio_restoration_tpu.pipeline.server import (
                RestorationServer, restore_over_http)

            clip = encode_wav(req_audio[0][:, None], sr)
            srv = RestorationServer(full).start()
            try:  # noqa: SIM105
              try:
                # first request compiles the request-sized program (cached
                # if the coalesce extra already ran it)
                restore_over_http(srv.host, srv.port, clip, timeout=870)
                lats = []
                for _ in range(12):
                    t0 = time.monotonic()
                    restore_over_http(srv.host, srv.port, clip, timeout=120)
                    lats.append((time.monotonic() - t0) * 1e3)
                lats.sort()
                extra["serve_latency_p50_ms"] = round(
                    statistics.median(lats), 1)
                extra["serve_latency_p99_ms"] = round(lats[-1], 1)
                extra["serve_latency_requests"] = len(lats)
                bases["serve_latency_p50_ms"] = "wall"
              except Exception as e:  # noqa: BLE001 - one extra must not kill the record
                record_error("serve_latency_p50_ms", e)
            finally:
                srv.shutdown()
        else:
            try:
                _sync(full.restore(req_audio, sr)[0])
                spans = _device_spans(
                    lambda: _sync(full.restore(req_audio, sr)[0]))
                dev_ms = sum(s for s in spans if s > 1.0) or max(spans)
                extra["serve_latency_p50_ms"] = round(dev_ms, 1)
                extra["serve_latency_p99_ms"] = round(dev_ms, 1)
                bases["serve_latency_p50_ms"] = "device"
            except RuntimeError:
                skipped.append("no device plane at serve_latency_p50_ms")


    # concurrent-stream serving: B live streams batched through one compiled
    # streaming step (pipeline/streaming.py)
    if budget_ok("streaming_streams_at_realtime"):
        try:
            stream_stats, basis = _streaming_throughput(stages,
                                                        basis=basis_now())
            extra.update(stream_stats)
            bases["streaming_streams_at_realtime"] = basis
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error("streaming_streams_at_realtime", e)
    # the streaming throughput preset (bf16 compute + source-rate stereo —
    # measured 1049 vs 541 realtime streams device-side, docs/PERFORMANCE.md
    # "bf16 streaming"); f32 above stays the BASELINE-comparable contract
    if budget_ok("streaming_bf16_src_streams_at_realtime"):
        try:
            stream_stats, basis = _streaming_throughput(
                stages, basis=basis_now(), label="streaming_bf16_src",
                compute_dtype="bfloat16", source_rate=True)
            extra.update(stream_stats)
            bases["streaming_bf16_src_streams_at_realtime"] = basis
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error("streaming_bf16_src_streams_at_realtime", e)

    # training throughput, all three families (BASELINE config 5 is the
    # denoiser one: batch 2, 2-s chunks, combined time-MSE + spectral loss;
    # on-device degradation included for the denoiser)
    for fam, tag in [("denoiser", "train_denoiser_audio_sec_per_sec"),
                     ("super_resolution", "train_sr_audio_sec_per_sec"),
                     ("stereo_separator", "train_stereo_audio_sec_per_sec")]:
        if not budget_ok(tag):
            continue  # not break: every skipped label must be RECORDED
        try:
            extra[tag], bases[tag] = _train_throughput(fam, basis_now())
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error(tag, e)

    # batch-16 train throughput, ALL THREE families (VERDICT r03 item 9 —
    # round 3 had the denoiser only): the honest fast-config number. The
    # desynced train loop (device-side loss accumulation, VERDICT r02
    # item 2) should land wall throughput near the device-side table
    # (docs/PERFORMANCE.md: denoiser 540 audio-s/s at batch 16).
    for fam, tag in [
        ("denoiser", "train_denoiser_b16_audio_sec_per_sec"),
        ("super_resolution", "train_sr_b16_audio_sec_per_sec"),
        ("stereo_separator", "train_stereo_b16_audio_sec_per_sec"),
    ]:
        if not budget_ok(tag):
            continue  # not break: every skipped label must be RECORDED
        try:
            extra[tag], bases[tag] = _train_throughput(
                fam, basis_now(), batch=16, steps=12)
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error(tag, e)
    _publish()

    # multi-file directory serving: decode(i+1) and write(i-1) are pipelined
    # around the device running file i (pipeline/restore.py
    # ::restore_directory); same-length files reuse the headline's compiled
    # program. Wall-only by nature (the host/device overlap IS the metric).
    if budget_ok("directory_serve_xrt"):
        from pathlib import Path

        from ml_audio_restoration_tpu.audio import save_audio

        ddir = Path(tempfile.mkdtemp(prefix="bench_dir_"))
        (ddir / "in").mkdir()
        n_files = 3
        for i in range(n_files):
            save_audio(ddir / "in" / f"f{i}.wav", _make_audio(seconds, sr),
                       sr)
        try:
            t0 = time.perf_counter()
            full.restore_directory(ddir / "in", ddir / "out")
            w = time.perf_counter() - t0
            extra["directory_serve_xrt"] = round(n_files * seconds / w, 1)
            extra["directory_files"] = n_files
            bases["directory_serve_xrt"] = "wall"
        except Exception as e:  # noqa: BLE001 - one extra must not kill the record
            record_error("directory_serve_xrt", e)

    # re-measure at the end: the shared dev relay drifts by >50% between
    # minutes, so the headline is the best parity-satisfying configuration
    # across windows (bf16 qualifies while its deviation stays <=1e-3);
    # the median across both windows is also reported so round-over-round
    # deltas can be attributed to code, not relay weather
    times2 = (times1 if congested else
              _time_pipeline(full, audio, sr, warmup=1, iters=4))
    wall2 = min(times2)
    extra["full_pipeline_wall_s_second_window"] = round(wall2, 4)
    extra["f32_full_pipeline_xrt"] = round(seconds / min(wall, wall2), 2)
    extra["f32_full_pipeline_xrt_median"] = round(
        seconds / statistics.median(times1 + times2), 2)
    candidates = [min(wall, wall2)]
    if bf16_dev <= 1e-3:
        candidates.append(w16)
    wall = min(candidates)
    extra["headline_config"] = ("bfloat16"
                                if wall == w16 and len(candidates) > 1
                                else "float32")
    xrt = seconds / wall
    extra["headline_basis"] = "wall"
    # On a congested relay (dispatch round trips dominated by the shared dev
    # tunnel, not the chip) the wall headline measures relay weather, not
    # the hardware: report the device-span headline instead —
    # CLAUDE.md/PERFORMANCE.md: "on a directly-attached host the device
    # number is the real one" — with both numbers and the basis recorded.
    # Promotion triggers on the probe (> 5 s) OR on the OUTCOME: the probe
    # is a point sample and the relay drifts mid-run — a measured run had
    # probe 1.18 s yet every wall restore inflated ~3x (110x wall vs 591x
    # device). A wall headline below half the device-basis headline is
    # relay latency by construction (calm-relay dispatch+sync overhead is
    # ~25-100 ms per restore, far under the 2x bar at these program sizes).
    dev_candidates = [(extra.get("device_full_pipeline_xrt", 0.0),
                       "float32")]
    if bf16_dev <= 1e-3:
        # carry the config label WITH the value: comparing rounded values
        # after the fact mislabels f32/bf16 ties
        dev_candidates.append(
            (extra.get("bf16_device_full_pipeline_xrt",
                       extra.get("bf16_full_pipeline_xrt", 0.0)
                       if bases.get("bf16_full_pipeline_xrt") == "device"
                       else 0.0), "bfloat16"))
    dev_xrt, dev_config = max(dev_candidates, key=lambda p: p[0])
    if (congested or xrt < 0.5 * dev_xrt) and dev_xrt > xrt:
        xrt = dev_xrt
        extra["headline_basis"] = "device"
        extra["headline_config"] = dev_config
    if not skipped:
        extra.pop("skipped", None)
    extra["bases"] = bases

    _FINISHED = True
    extra.pop("provisional", None)
    _publish(xrt)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - the record must survive
        if not isinstance(e, SystemExit):
            _RECORD.setdefault("extra", {})["partial"] = f"exception: {e!r}"
            _print_record()
        raise
