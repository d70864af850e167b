"""Soak/load test for the serving daemon.

Starts `cli serve` (full chain by default) and drives sustained mixed
load — concurrent HTTP restores, raw-TCP streams, and WebSocket streams —
for --seconds, sampling the server's RSS throughout. Prints one JSON
summary: request counts, error counts, latency percentiles, server-side
stats, and the RSS trajectory (flat RSS = no leak across thousands of
requests; the serving classes hold no per-request state by design).

    python scripts/soak_serve.py --seconds 1800 --http-clients 4 \
        --stream-clients 2 --ws-clients 1 [--denoiser-only]

The checkpoints default to fresh reference-torch inits written to /tmp
(parity-converted through compat/torch_loader.py like any user .pth), so
the soak exercises the real checkpoint path too.
"""
from __future__ import annotations

import argparse
import json
import re
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SR = 22050


def make_checkpoints(tmp: Path, full: bool):
    sys.path.insert(0, "/root/reference")
    import torch
    from src.models.denoiser import AudioDenoiser

    torch.manual_seed(0)
    paths = {}
    m = AudioDenoiser()
    torch.save({"model_state_dict": m.state_dict()}, tmp / "d.pth")
    paths["denoiser"] = tmp / "d.pth"
    if full:
        from src.models.stereo_separator import StereoSeparator
        from src.models.super_resolution import AudioSuperResolution

        sr = AudioSuperResolution(upscale_factor=2)
        torch.save({"model_state_dict": sr.state_dict()}, tmp / "sr.pth")
        st = StereoSeparator()
        torch.save({"model_state_dict": st.state_dict()}, tmp / "st.pth")
        paths["super_res"] = tmp / "sr.pth"
        paths["stereo"] = tmp / "st.pth"
    return paths


def rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument("--http-clients", type=int, default=4)
    ap.add_argument("--stream-clients", type=int, default=2)
    ap.add_argument("--ws-clients", type=int, default=1)
    ap.add_argument("--clip-seconds", type=float, default=10.0)
    ap.add_argument("--denoiser-only", action="store_true")
    ap.add_argument("--startup-timeout", type=float, default=900.0)
    args = ap.parse_args()

    from ml_audio_restoration_tpu.audio import encode_wav
    from ml_audio_restoration_tpu.pipeline.server import (restore_over_http,
                                                          stream_over_tcp)
    from ml_audio_restoration_tpu.pipeline.ws import stream_over_ws

    tmp = Path("/tmp/soak_ckpt")
    tmp.mkdir(exist_ok=True)
    ck = make_checkpoints(tmp, full=not args.denoiser_only)

    cmd = [sys.executable, "-u", "-m", "ml_audio_restoration_tpu.cli",
           "serve", "--port", "0", "--stream-port", "0",
           "--stream-slots", str(max(2, args.stream_clients
                                     + args.ws_clients)),
           "--denoiser", str(ck["denoiser"]),
           "--max-queue", "32", "--block-seconds", "0.5"]
    if args.denoiser_only:
        cmd += ["--no-super-res", "--no-stereo"]
    else:
        cmd += ["--super-res", str(ck["super_res"]),
                "--stereo", str(ck["stereo"])]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=REPO)

    http_port = stream_port = None
    deadline = time.monotonic() + args.startup_timeout
    while time.monotonic() < deadline and (http_port is None
                                           or stream_port is None):
        line = proc.stdout.readline()
        if not line:
            break
        m = re.search(r"http://[\d.]+:(\d+)", line)
        if m:
            http_port = int(m.group(1))
        m = re.search(r"tcp://[\d.]+:(\d+)", line)
        if m:
            stream_port = int(m.group(1))
    assert http_port and stream_port, "server never announced ports"
    # drain the server's stdout so it can't block on a full pipe
    threading.Thread(target=lambda: [None for _ in proc.stdout],
                     daemon=True).start()
    print(f"# serving http:{http_port} tcp:{stream_port}", flush=True)

    stop = threading.Event()
    lock = threading.Lock()
    lat: list[float] = []
    counts = {"http_ok": 0, "http_err": 0, "tcp_ok": 0, "tcp_err": 0,
              "ws_ok": 0, "ws_err": 0}
    rng = np.random.default_rng(0)
    n = int(args.clip_seconds * SR)
    t = np.arange(n) / SR

    def make_clip(i: int) -> bytes:
        f0 = 120 + (i * 37) % 700
        sig = (0.3 * np.sin(2 * np.pi * f0 * t)
               + 0.02 * rng.standard_normal(n)).astype(np.float32)
        return encode_wav(sig[:, None], SR)

    # warm the compile caches once so soak latencies are steady-state
    t0 = time.monotonic()
    restore_over_http("127.0.0.1", http_port, make_clip(0), timeout=870)
    print(f"# first restore (compile): {time.monotonic() - t0:.1f}s",
          flush=True)

    def http_worker(wid: int):
        i = wid
        while not stop.is_set():
            body = make_clip(i)
            i += 100
            t0 = time.monotonic()
            try:
                restore_over_http("127.0.0.1", http_port, body, timeout=120)
                dt = time.monotonic() - t0
                with lock:
                    counts["http_ok"] += 1
                    lat.append(dt)
            except Exception:
                with lock:
                    counts["http_err"] += 1

    def tcp_worker(wid: int):
        sig = (0.3 * np.sin(2 * np.pi * (200 + 50 * wid) * t[:5 * SR])
               ).astype(np.float32)
        while not stop.is_set():
            try:
                out = stream_over_tcp("127.0.0.1", stream_port, sig,
                                      block=4096, timeout=120)
                ok = out.shape[-1] >= len(sig)
                with lock:
                    counts["tcp_ok" if ok else "tcp_err"] += 1
            except Exception:
                with lock:
                    counts["tcp_err"] += 1

    def ws_worker(wid: int):
        sig = (0.3 * np.sin(2 * np.pi * (300 + 50 * wid) * t[:5 * SR])
               ).astype(np.float32)
        while not stop.is_set():
            try:
                out = stream_over_ws("127.0.0.1", http_port, sig,
                                     block=4096, timeout=120)
                ok = out.shape[-1] >= len(sig)
                with lock:
                    counts["ws_ok" if ok else "ws_err"] += 1
            except Exception:
                with lock:
                    counts["ws_err"] += 1

    threads = ([threading.Thread(target=http_worker, args=(i,), daemon=True)
                for i in range(args.http_clients)]
               + [threading.Thread(target=tcp_worker, args=(i,),
                                   daemon=True)
                  for i in range(args.stream_clients)]
               + [threading.Thread(target=ws_worker, args=(i,), daemon=True)
                  for i in range(args.ws_clients)])
    for th in threads:
        th.start()

    rss = []
    t_end = time.monotonic() + args.seconds
    while time.monotonic() < t_end:
        time.sleep(min(30.0, max(1.0, args.seconds / 40)))
        rss.append(round(rss_mb(proc.pid), 1))
        with lock:
            done = counts["http_ok"]
        print(f"# t={args.seconds - (t_end - time.monotonic()):7.0f}s "
              f"http_ok={done} rss={rss[-1]}MB", flush=True)
    stop.set()
    for th in threads:
        th.join(timeout=150)

    import urllib.request

    stats = json.load(urllib.request.urlopen(
        f"http://127.0.0.1:{http_port}/v1/stats", timeout=30))
    proc.send_signal(signal.SIGINT)
    try:
        proc.wait(timeout=60)
    except subprocess.TimeoutExpired:
        proc.kill()

    lat_s = sorted(lat)

    def pct(p):
        return round(lat_s[min(len(lat_s) - 1,
                               int(p / 100 * len(lat_s)))], 3) if lat_s \
            else None

    summary = {
        "seconds": args.seconds,
        "clients": {"http": args.http_clients, "tcp": args.stream_clients,
                    "ws": args.ws_clients},
        "clip_seconds": args.clip_seconds,
        "counts": counts,
        "latency_s": {"p50": pct(50), "p90": pct(90), "p99": pct(99),
                      "max": (round(lat_s[-1], 3) if lat_s else None)},
        "audio_seconds_served": round(stats.get("audio_seconds_in", 0), 1),
        "coalesced": stats.get("coalesced", 0),
        "rejected": stats.get("rejected", 0),
        "rss_mb": rss,
        "rss_drift_mb": (round(rss[-1] - rss[len(rss) // 4], 1)
                         if len(rss) >= 4 else None),
        "server_stats": stats,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
