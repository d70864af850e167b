"""Serving daemon tests: the HTTP restore endpoint and the TCP PCM stream
server must reproduce the offline pipeline / streaming outputs exactly
(pipeline/server.py). All sockets bind 127.0.0.1 on ephemeral ports."""
import json
import socket
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
import jax

from ml_audio_restoration_tpu.audio import (decode_wav, encode_wav,
                                            normalize_audio)
from ml_audio_restoration_tpu.config import PipelineConfig
from ml_audio_restoration_tpu.models import denoiser
from ml_audio_restoration_tpu.pipeline import (RestorationPipeline,
                                               RestorationServer,
                                               StreamingRestorer,
                                               StreamServer)
from ml_audio_restoration_tpu.pipeline.server import (restore_over_http,
                                                      stream_over_tcp)

SR = 22050

# fast-lane contract (VERDICT r04 item 4): the daemon tests dominate the
# suite's wall time (37 tests, thread/socket waits, a subprocess CLI smoke)
# — they run in the full lane only; `pytest -m "not slow"` is the <15 min
# iteration lane. Server coverage in the fast lane comes from
# test_streaming.py (the compute path the daemons wrap).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dn_stage():
    params, state = denoiser.init(jax.random.PRNGKey(0))
    return params, state


@pytest.fixture(scope="module")
def sine():
    t = np.arange(int(1.5 * SR)) / SR
    return (0.4 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * np.sin(2 * np.pi * 1450 * t)).astype(np.float32)


def _pipe(dn_stage, **cfg):
    config = PipelineConfig(chunk_seconds=0.25, overlap_seconds=0.02, **cfg)
    return RestorationPipeline(denoiser=dn_stage, config=config)


# ------------------------------------------------------------------- codec

def test_wav_bytes_roundtrip(sine):
    buf = encode_wav(np.stack([sine, 0.5 * sine], axis=1), SR,
                     subtype="FLOAT")
    data, rate = decode_wav(buf)
    assert rate == SR
    np.testing.assert_array_equal(data[:, 0], sine)
    np.testing.assert_array_equal(data[:, 1], (0.5 * sine).astype(np.float32))


# -------------------------------------------------------------------- HTTP

def test_http_restore_matches_pipeline(dn_stage, sine):
    """POST /v1/restore == restore() + output normalization, bit-exact
    (FLOAT response subtype so the comparison isn't PCM-quantized)."""
    pipe = _pipe(dn_stage)
    with RestorationServer(pipe) as srv:
        body = encode_wav(sine[:, None], SR, subtype="FLOAT")
        got, rate = restore_over_http(srv.host, srv.port, body,
                                      subtype="FLOAT")
    ref_pipe = _pipe(dn_stage)
    want, want_rate = ref_pipe.restore(
        np.asarray(normalize_audio(sine[None])), SR)
    want = normalize_audio(np.asarray(want))
    assert rate == want_rate == SR
    np.testing.assert_array_equal(got, np.asarray(want, np.float32))


def test_http_healthz_stats_and_errors(dn_stage, sine):
    pipe = _pipe(dn_stage)
    with RestorationServer(pipe) as srv:
        base = f"http://{srv.host}:{srv.port}"
        health = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert health["status"] == "ok"
        assert health["stages"] == ["denoiser"]
        assert health["sample_rate"] == SR

        # bad body -> 400 with a JSON error
        req = urllib.request.Request(f"{base}/v1/restore",
                                     data=b"not a wav", method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400
        assert "cannot decode" in json.load(err.value)["error"]

        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f"{base}/nope")
        assert err.value.code == 404

        # one good request, then stats reflect it
        body = encode_wav(sine[:, None], SR)
        restore_over_http(srv.host, srv.port, body)
        stats = json.load(urllib.request.urlopen(f"{base}/v1/stats"))
        assert stats["requests"] == 1
        assert stats["errors"] == 1  # the 400 above
        assert stats["audio_seconds_in"] == pytest.approx(1.5, abs=0.01)


def test_http_concurrent_requests_each_correct(dn_stage):
    """Three overlapping clients with different signals each get exactly
    their own restoration (the worker serializes the device, handlers
    overlap decode/encode)."""
    pipe = _pipe(dn_stage)
    t = np.arange(SR) / SR
    signals = [(0.3 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
               for f0 in (180, 440, 900)]
    results = {}

    with RestorationServer(pipe) as srv:
        def post(i):
            body = encode_wav(signals[i][:, None], SR, subtype="FLOAT")
            results[i] = restore_over_http(srv.host, srv.port, body,
                                           subtype="FLOAT")

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)

    assert set(results) == {0, 1, 2}
    ref = _pipe(dn_stage)
    for i, sig in enumerate(signals):
        want, _ = ref.restore(np.asarray(normalize_audio(sig[None])), SR)
        want = np.asarray(normalize_audio(np.asarray(want)), np.float32)
        got, rate = results[i]
        assert rate == SR
        np.testing.assert_array_equal(got, want)


def test_http_accepts_flac_body(dn_stage, sine, tmp_path):
    """POST /v1/restore sniffs the container by magic bytes: a FLAC body
    (lossless) produces the same response as the equivalent 16-bit WAV,
    and garbage is a 400."""
    from ml_audio_restoration_tpu.audio.flac import write_flac

    pcm16 = (np.clip(np.rint(sine * 32767.0), -32768, 32767)
             .astype(np.int16))
    flac_path = tmp_path / "in.flac"
    write_flac(flac_path, pcm16[:, None], SR, bits=16)
    flac_body = flac_path.read_bytes()
    wav_body = encode_wav((pcm16.astype(np.float32) / 32768.0)[:, None],
                          SR, subtype="FLOAT")

    with RestorationServer(_pipe(dn_stage)) as srv:
        got_flac, rate = restore_over_http(srv.host, srv.port, flac_body,
                                           subtype="FLOAT")
        got_wav, _ = restore_over_http(srv.host, srv.port, wav_body,
                                       subtype="FLOAT")
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/v1/restore",
            data=b"\x00not-audio\x00" * 10, method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
    assert rate == SR
    np.testing.assert_array_equal(got_flac, got_wav)


def test_http_normalize_off(dn_stage, sine):
    """?normalize=0 skips INPUT normalization (output normalization is
    unconditional, matching restore_file's contract)."""
    pipe = _pipe(dn_stage)
    with RestorationServer(pipe) as srv:
        body = encode_wav(sine[:, None], SR, subtype="FLOAT")
        got, _ = restore_over_http(srv.host, srv.port, body,
                                   normalize=False, subtype="FLOAT")
    want, _ = _pipe(dn_stage).restore(sine[None], SR)
    want = np.asarray(normalize_audio(np.asarray(want)), np.float32)
    np.testing.assert_array_equal(got, want)


def test_http_hot_reload_swaps_weights(dn_stage, sine, tmp_path):
    """POST /v1/reload swaps a stage's checkpoint between restore batches:
    the next response matches a pipeline built on the NEW weights, no
    recompile (same-shaped params are jit arguments), and bad requests
    (unknown stage / missing file / disabled stage) are 4xx/5xx."""
    from ml_audio_restoration_tpu.models import denoiser as dn_mod
    from ml_audio_restoration_tpu.train.checkpoints import save_checkpoint

    new_stage = dn_mod.init(jax.random.PRNGKey(42))
    ckpt = tmp_path / "dn_new.msgpack"
    save_checkpoint(ckpt, {"params": new_stage[0],
                           "model_state": new_stage[1]})

    pipe = _pipe(dn_stage)
    body = encode_wav(sine[:, None], SR, subtype="FLOAT")
    with RestorationServer(pipe) as srv:
        base = f"http://{srv.host}:{srv.port}"
        before, _ = restore_over_http(srv.host, srv.port, body,
                                      subtype="FLOAT")
        req = urllib.request.Request(
            f"{base}/v1/reload",
            data=json.dumps({"denoiser": str(ckpt)}).encode(),
            method="POST")
        resp = json.load(urllib.request.urlopen(req))
        assert resp == {"reloaded": ["denoiser"]}
        after, _ = restore_over_http(srv.host, srv.port, body,
                                     subtype="FLOAT")

        # error paths: unknown stage name, nonexistent file, disabled stage
        for payload, want_code in (
                ({"nonsense": "x"}, 400),
                ({}, 400),
                ({"denoiser": str(tmp_path / "missing.msgpack")}, 500),
                ({"stereo": str(ckpt)}, 400)):  # stereo disabled
            req = urllib.request.Request(
                f"{base}/v1/reload", data=json.dumps(payload).encode(),
                method="POST")
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == want_code

        stats = json.load(urllib.request.urlopen(f"{base}/v1/stats"))
        assert stats["reloads"] == 1

    want_new = RestorationPipeline(
        denoiser=new_stage,
        config=PipelineConfig(chunk_seconds=0.25, overlap_seconds=0.02))
    w, _ = want_new.restore(np.asarray(normalize_audio(sine[None])), SR)
    want = np.asarray(normalize_audio(np.asarray(w)), np.float32)
    np.testing.assert_array_equal(after, want)
    assert not np.array_equal(before, after)


def test_http_metrics_prometheus(dn_stage, sine):
    """GET /metrics exposes the stats counters in Prometheus text format."""
    with RestorationServer(_pipe(dn_stage)) as srv:
        body = encode_wav(sine[:, None], SR, subtype="FLOAT")
        restore_over_http(srv.host, srv.port, body)
        resp = urllib.request.urlopen(
            f"http://{srv.host}:{srv.port}/metrics")
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    lines = text.strip().splitlines()
    assert "# TYPE mlar_requests_total counter" not in text  # raw names
    assert "# TYPE mlar_requests counter" in lines
    metrics = {ln.split()[0]: float(ln.split()[1])
               for ln in lines if not ln.startswith("#")}
    assert metrics["mlar_requests"] == 1.0
    assert metrics["mlar_queue_depth"] == 0.0
    assert metrics["mlar_uptime_seconds"] > 0


def test_http_stats_include_stream_block(dn_stage, sine):
    """With extra_stats wired (as cli serve does), /v1/stats gains a
    nested stream block and /metrics flattens it to mlar_stream_*."""
    restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    with StreamServer(restorer) as ssrv, \
            RestorationServer(_pipe(dn_stage)) as hsrv:
        hsrv.extra_stats = ssrv.stats
        stream_over_tcp(ssrv.host, ssrv.port, sine[:4096], block=2048)
        base = f"http://{hsrv.host}:{hsrv.port}"
        stats = json.load(urllib.request.urlopen(f"{base}/v1/stats"))
        assert stats["stream"]["connections"] == 1
        assert "active_streams" in stats["stream"]
        met = urllib.request.urlopen(f"{base}/metrics").read().decode()
        assert "mlar_stream_connections 1" in met
        assert "# TYPE mlar_stream_active_streams gauge" in met


def test_http_worker_coalesces_queued_requests(dn_stage):
    """Dynamic batching: queued jobs drain into ONE restore_many batch and
    every member still bit-matches its individual restore. Driven by hand
    (the server is never started) so the drain is deterministic."""
    from ml_audio_restoration_tpu.pipeline.server import _Job

    pipe = _pipe(dn_stage)
    srv = RestorationServer(pipe, max_coalesce=4)
    try:
        t = np.arange(SR) / SR
        jobs = [_Job((0.3 * np.sin(2 * np.pi * f0 * t))
                     .astype(np.float32)[None], SR)
                for f0 in (200, 500, 950)]
        for j in jobs[1:]:
            srv._queue.put(j)
        batch, reload_job, saw_stop = srv._drain(jobs[0])
        assert batch == jobs and reload_job is None and not saw_stop
        srv._run_jobs(batch)
        assert srv._stats["coalesced"] == 3
        ref = _pipe(dn_stage)
        for j in jobs:
            assert j.error is None and j.event.is_set()
            want, rate = ref.restore(j.audio, SR)
            assert j.rate == rate
            np.testing.assert_array_equal(np.asarray(j.out),
                                          np.asarray(want))
    finally:
        srv._httpd.server_close()


def test_http_drain_respects_max_coalesce_and_stop(dn_stage):
    """The drain caps at max_coalesce and a shutdown sentinel ends it."""
    from ml_audio_restoration_tpu.pipeline.server import _Job

    srv = RestorationServer(_pipe(dn_stage), max_coalesce=2, max_queue=8)
    try:
        jobs = [_Job(np.zeros((1, 100), np.float32), SR) for _ in range(3)]
        for j in jobs[1:]:
            srv._queue.put(j)
        batch, reload_job, saw_stop = srv._drain(jobs[0])
        assert batch == jobs[:2] and reload_job is None and not saw_stop
        srv._queue.put(None)  # shutdown sentinel behind job 3
        first = srv._queue.get()  # the worker's blocking get
        assert first is jobs[2]
        batch2, reload2, saw_stop2 = srv._drain(first)
        assert batch2 == [jobs[2]] and reload2 is None and saw_stop2
    finally:
        srv._httpd.server_close()


def test_http_drain_holds_reload_aside_and_applies_after_batch(dn_stage,
                                                               tmp_path):
    """A reload drained mid-batch is held aside (never re-queued — a
    blocking put-back into a full queue would deadlock the worker) and
    applied right after the batch, even with the queue at capacity."""
    from ml_audio_restoration_tpu.models import denoiser as dn_mod
    from ml_audio_restoration_tpu.pipeline.server import _Job, _ReloadJob
    from ml_audio_restoration_tpu.train.checkpoints import save_checkpoint

    new_stage = dn_mod.init(jax.random.PRNGKey(7))
    ck = tmp_path / "dn_held.msgpack"
    save_checkpoint(ck, {"params": new_stage[0],
                         "model_state": new_stage[1]})
    srv = RestorationServer(_pipe(dn_stage), max_coalesce=4, max_queue=3)
    try:
        jobs = [_Job(np.zeros((1, 100), np.float32), SR) for _ in range(2)]
        reload_job = _ReloadJob({"denoiser": str(ck)})
        # fill the queue completely: restore, reload, restore
        srv._queue.put(jobs[1])
        srv._queue.put(reload_job)
        srv._queue.put(_Job(np.zeros((1, 100), np.float32), SR))
        batch, held, saw_stop = srv._drain(jobs[0])
        assert batch == jobs and held is reload_job and not saw_stop
        # the reload was NOT re-queued: the trailing restore is still the
        # only queued item (a put-back ahead of it would reorder/deadlock)
        assert srv._queue.qsize() == 1
        srv._run_jobs(batch)
        srv._apply_reload(held)
        assert held.error is None and held.loaded == ["denoiser"]
        assert held.event.is_set()
        assert srv._stats["reloads"] == 1
    finally:
        srv._httpd.server_close()


def test_http_shutdown_drains_accepted_work(dn_stage, sine):
    """shutdown() completes every accepted restore before returning (no
    504s on supervisor-driven stops), immediately fails a job that raced
    its enqueue in behind the shutdown sentinel, and 503s new requests
    once stopping."""
    from ml_audio_restoration_tpu.pipeline.server import _Job

    pipe = _pipe(dn_stage)
    release = threading.Event()
    orig = pipe.restore

    def slow_restore(a, s):
        release.wait(10)
        return orig(a, s)

    pipe.restore = slow_restore
    # max_coalesce=1: jobs go through the (patched, blocking) single path
    # one at a time, so the queue state below is deterministic
    srv = RestorationServer(pipe, max_coalesce=1).start()
    body = encode_wav(sine[:, None], SR, subtype="FLOAT")
    results = {}

    def post(i):
        try:
            results[i] = restore_over_http(srv.host, srv.port, body,
                                           subtype="FLOAT", timeout=30)
        except RuntimeError as e:
            results[i] = str(e)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    # wait until ALL THREE are accepted: one blocking the worker, two queued
    deadline = time.monotonic() + 10
    while srv._queue.qsize() < 2 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert srv._queue.qsize() == 2

    # 503 gate: a request arriving once stopping is set is refused, not
    # queued behind the sentinel
    srv._stopping = True
    with pytest.raises(RuntimeError, match="503"):
        restore_over_http(srv.host, srv.port, body, timeout=30)
    srv._stopping = False

    stopper = threading.Thread(target=srv.shutdown)
    stopper.start()
    # wait for the sentinel to actually land (httpd.shutdown() blocks up
    # to its poll interval first): queue is then [job1, job2, None]
    deadline = time.monotonic() + 10
    while srv._queue.qsize() < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert srv._queue.qsize() == 3
    late = _Job(np.zeros((1, 100), np.float32), SR)
    srv._queue.put(late)  # raced in behind the sentinel
    release.set()
    stopper.join(30)
    for t in threads:
        t.join(30)
    assert not stopper.is_alive() and not srv._worker.is_alive()
    # every ACCEPTED request completed with a real response
    assert all(isinstance(results[i], tuple) for i in range(3)), results
    assert late.event.wait(5)
    assert isinstance(late.error, RuntimeError)


# --------------------------------------------------------------- streaming

def test_stream_server_matches_direct_restorer(dn_stage, sine):
    """One TCP stream == a direct single-stream StreamingRestorer fed the
    same samples (the server's zero-fill drain == flush padding)."""
    block = 2048
    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    with StreamServer(srv_restorer, block=block) as srv:
        got = stream_over_tcp(srv.host, srv.port, sine, block=block)

    direct = StreamingRestorer(denoiser=dn_stage)
    outs = [direct.feed(sine[i:i + block])
            for i in range(0, len(sine), block)]
    outs.append(direct.flush())
    want = np.concatenate([o for o in outs if o.shape[-1]], axis=-1)
    assert got.shape == (1, len(sine))
    np.testing.assert_array_equal(got, want[:, :len(sine)])


def test_stream_server_timed_tick_fills_underruns(dn_stage):
    """Live-feed mode (tick_seconds set): a client slower than the block
    clock gets its shortfall rendered as silence — underruns are counted,
    the inserted silence occupies real timeline positions (output grows
    past the input), and the server keeps serving cleanly afterwards."""
    block = 2048
    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    t = np.arange(4 * block) / SR
    sig = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)

    with StreamServer(srv_restorer, block=block,
                      tick_seconds=0.05) as srv:
        sock = socket.create_connection((srv.host, srv.port), timeout=60)
        payload = sig.astype("<f4").tobytes()
        half = len(payload) // 2
        chunks = []

        def read_all():
            while True:
                try:
                    buf = sock.recv(1 << 16)
                except OSError:
                    return
                if not buf:
                    return
                chunks.append(buf)

        rd = threading.Thread(target=read_all, daemon=True)
        rd.start()
        sock.sendall(payload[:half])
        # stall past several tick deadlines: the clock must render the
        # missing samples as silence rather than blocking the batch
        deadline = time.monotonic() + 30
        while srv.stats()["underruns"] < 1 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert srv.stats()["underruns"] >= 1
        sock.sendall(payload[half:])
        sock.shutdown(socket.SHUT_WR)
        rd.join(timeout=120)
        sock.close()

        out = np.frombuffer(b"".join(chunks), "<f4")
        # silence fill occupies timeline: output >= the input's samples,
        # and the drain contract still closes the stream at exactly `owed`
        assert len(out) >= len(sig)
        assert np.isfinite(out).all()

        # the slot is reusable: a follow-up stream is served to completion
        # (under a 50 ms live clock its own feed may also underrun on a
        # slow host, so assert the drain contract, not bit-equality — the
        # deterministic bit-match lives in the tick_seconds=None tests)
        got = stream_over_tcp(srv.host, srv.port, sig, block=block)
    assert got.shape[0] == 1 and got.shape[1] >= len(sig)
    assert np.isfinite(got).all()


def test_stream_server_two_concurrent_streams(dn_stage):
    """Two lockstep connections each bit-match an independent restorer."""
    block = 2048
    t = np.arange(int(0.9 * SR)) / SR
    sigs = [(0.3 * np.sin(2 * np.pi * 250 * t)).astype(np.float32),
            (0.3 * np.sin(2 * np.pi * 620 * t)).astype(np.float32)]

    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    results = {}
    with StreamServer(srv_restorer, block=block) as srv:
        def run(i):
            results[i] = stream_over_tcp(srv.host, srv.port, sigs[i],
                                         block=block)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)

    assert set(results) == {0, 1}
    for i, sig in enumerate(sigs):
        direct = StreamingRestorer(denoiser=dn_stage)
        outs = [direct.feed(sig[k:k + block])
                for k in range(0, len(sig), block)]
        outs.append(direct.flush())
        want = np.concatenate([o for o in outs if o.shape[-1]], axis=-1)
        np.testing.assert_array_equal(results[i], want[:, :len(sig)])


def test_stream_server_late_join_skips_pre_join_timeline(dn_stage):
    """A stream that connects AFTER the clock has advanced must not receive
    the batch's pre-join emission (the lockstep timeline it wasn't part
    of): its output still bit-matches an independent restorer."""
    block = 2048
    t = np.arange(int(0.7 * SR)) / SR
    early = (0.3 * np.sin(2 * np.pi * 210 * t)).astype(np.float32)
    late = (0.3 * np.sin(2 * np.pi * 770 * t)).astype(np.float32)

    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    with StreamServer(srv_restorer, block=block) as srv:
        results = {}

        def run_early():
            results["early"] = stream_over_tcp(srv.host, srv.port, early,
                                               block=block)

        th = threading.Thread(target=run_early)
        th.start()
        # wait until the clock has demonstrably advanced (emission lags
        # feeds, so ticks > 1 means the global timeline is past zero)
        deadline = time.monotonic() + 120
        while srv.stats()["ticks"] < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv.stats()["ticks"] >= 2
        results["late"] = stream_over_tcp(srv.host, srv.port, late,
                                          block=block)
        th.join(timeout=300)

    for name, sig in (("early", early), ("late", late)):
        direct = StreamingRestorer(denoiser=dn_stage)
        outs = [direct.feed(sig[k:k + block])
                for k in range(0, len(sig), block)]
        outs.append(direct.flush())
        want = np.concatenate([o for o in outs if o.shape[-1]], axis=-1)
        np.testing.assert_array_equal(results[name], want[:, :len(sig)],
                                      err_msg=name)


def test_stream_server_slot_reuse(dn_stage):
    """A second connection after the first finishes reuses its slot with a
    clean state (reset_stream before the first feed): identical input ->
    identical output."""
    block = 2048
    t = np.arange(int(0.6 * SR)) / SR
    sig = (0.3 * np.sin(2 * np.pi * 333 * t)).astype(np.float32)

    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=1)
    with StreamServer(srv_restorer, block=block) as srv:
        first = stream_over_tcp(srv.host, srv.port, sig, block=block)
        # wait for the slot to free before reconnecting
        deadline = time.monotonic() + 60
        while srv.stats()["active_streams"] and time.monotonic() < deadline:
            time.sleep(0.02)
        second = stream_over_tcp(srv.host, srv.port, sig, block=block)
        stats = srv.stats()

    np.testing.assert_array_equal(first, second)
    assert stats["connections"] == 2


def test_stream_server_refuses_when_full(dn_stage):
    """batch=1 server: a second simultaneous connection is closed without
    output (refused), the first is unaffected."""
    block = 1024
    t = np.arange(int(0.4 * SR)) / SR
    sig = (0.3 * np.sin(2 * np.pi * 400 * t)).astype(np.float32)

    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=1)
    with StreamServer(srv_restorer, block=block) as srv:
        # occupy the only slot with a half-open connection
        holder = socket.create_connection((srv.host, srv.port), timeout=60)
        holder.sendall(np.zeros(block, np.float32).tobytes())
        deadline = time.monotonic() + 60
        while (srv.stats()["active_streams"] == 0
               and time.monotonic() < deadline):
            time.sleep(0.02)

        second = socket.create_connection((srv.host, srv.port), timeout=60)
        second.settimeout(60)
        # refused connections are closed immediately: recv -> b""
        assert second.recv(4) == b""
        second.close()

        holder.shutdown(socket.SHUT_WR)
        out = bytearray()
        while True:
            buf = holder.recv(1 << 16)
            if not buf:
                break
            out.extend(buf)
        holder.close()
        stats = srv.stats()

    assert stats["refused"] == 1
    assert len(out) == block * 4  # full first block restored and returned


def test_stream_server_slow_consumer_isolated_and_dropped(dn_stage):
    """Offline mode: a client that never reads its output pauses the clock
    (backpressure) but is reaped after drain_stall_seconds of zero read
    progress, so it cannot stall the other lockstep streams forever. The
    concurrent well-behaved stream still bit-matches an independent
    restorer, and the freed slot is reusable."""
    block = 2048
    payload_bytes = block * 4  # one tick's output for a mono f32 stream
    t = np.arange(int(1.5 * SR)) / SR
    slow_sig = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    fast_sig = (0.3 * np.sin(2 * np.pi * 480 * t)).astype(np.float32)

    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    # tiny kernel + outbox budgets so congestion appears within ~2 s of
    # audio, and a short stall window so the reap is fast
    with StreamServer(srv_restorer, block=block,
                      max_outbox_bytes=2 * payload_bytes,
                      sndbuf=4096, drain_stall_seconds=0.75) as srv:
        # slow client: shrink its receive window BEFORE connecting, send
        # everything, half-close, and never read a byte
        slow = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        slow.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        slow.settimeout(60)
        slow.connect((srv.host, srv.port))
        slow.sendall(slow_sig.astype("<f4").tobytes())
        slow.shutdown(socket.SHUT_WR)

        got_fast = stream_over_tcp(srv.host, srv.port, fast_sig,
                                   block=block)

        deadline = time.monotonic() + 120
        while (srv.stats()["dropped_slow"] < 1
               and time.monotonic() < deadline):
            time.sleep(0.02)
        stats_mid = srv.stats()
        slow.close()

        # the freed slot serves a new connection to completion
        deadline = time.monotonic() + 60
        while (srv.stats()["active_streams"]
               and time.monotonic() < deadline):
            time.sleep(0.02)
        got_again = stream_over_tcp(srv.host, srv.port, fast_sig,
                                    block=block)
        stats_end = srv.stats()

    assert stats_mid["dropped_slow"] >= 1
    assert stats_end["connections"] == 3

    direct = StreamingRestorer(denoiser=dn_stage)
    outs = [direct.feed(fast_sig[k:k + block])
            for k in range(0, len(fast_sig), block)]
    outs.append(direct.flush())
    want = np.concatenate([o for o in outs if o.shape[-1]],
                          axis=-1)[:, :len(fast_sig)]
    np.testing.assert_array_equal(got_fast, want)
    np.testing.assert_array_equal(got_again, want)


def test_stream_server_live_mode_drops_on_overflow(dn_stage):
    """Live mode (tick_seconds set): the clock never waits on a consumer —
    a never-reading client is dropped as soon as its outbox would exceed
    max_outbox_bytes."""
    block = 2048
    payload_bytes = block * 4
    t = np.arange(int(2.0 * SR)) / SR
    sig = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)

    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    with StreamServer(srv_restorer, block=block, tick_seconds=0.05,
                      max_outbox_bytes=2 * payload_bytes,
                      sndbuf=4096) as srv:
        slow = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        slow.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        slow.settimeout(60)
        slow.connect((srv.host, srv.port))
        slow.sendall(sig.astype("<f4").tobytes())
        slow.shutdown(socket.SHUT_WR)

        deadline = time.monotonic() + 120
        while (srv.stats()["dropped_slow"] < 1
               and time.monotonic() < deadline):
            time.sleep(0.02)
        stats = srv.stats()
        slow.close()
    assert stats["dropped_slow"] >= 1
    assert stats["active_streams"] == 0  # the dropped slot was freed


def test_http_robustness_malformed_requests(dn_stage, sine):
    """The daemon survives protocol abuse: truncated bodies, lying
    Content-Length, oversized bodies, bogus methods/paths — each gets an
    orderly error (or a dropped connection), never a hang or a crash, and
    a well-formed request afterwards still succeeds."""
    pipe = _pipe(dn_stage)
    with RestorationServer(pipe, max_body_bytes=1 << 20,
                           request_timeout=60) as srv:
        base = f"http://{srv.host}:{srv.port}"

        # Content-Length larger than the actual body: the read blocks
        # until the client closes; server must not crash
        s = socket.create_connection((srv.host, srv.port), timeout=30)
        s.sendall(b"POST /v1/restore HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Length: 5000\r\n\r\nRIFFxxxx")
        s.close()  # truncate mid-body

        # body over max_body_bytes -> 413 without reading it all (urllib
        # may instead see the connection break while still writing)
        req = urllib.request.Request(f"{base}/v1/restore",
                                     data=b"\0" * ((1 << 20) + 1),
                                     method="POST")
        with pytest.raises(urllib.error.URLError) as err:
            urllib.request.urlopen(req)
        if isinstance(err.value, urllib.error.HTTPError):
            assert err.value.code == 413

        # negative / non-numeric Content-Length -> 400
        for cl in (b"-5", b"banana"):
            s = socket.create_connection((srv.host, srv.port), timeout=30)
            s.sendall(b"POST /v1/restore HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: " + cl + b"\r\n\r\n")
            resp = s.recv(4096)
            assert (b"400" in resp.split(b"\r\n", 1)[0]
                    or resp == b""), resp
            s.close()

        # bogus method
        s = socket.create_connection((srv.host, srv.port), timeout=30)
        s.sendall(b"BREW /v1/restore HTTP/1.1\r\nHost: x\r\n\r\n")
        resp = s.recv(4096)
        assert b"501" in resp.split(b"\r\n", 1)[0] or resp == b""
        s.close()

        # a WAV that lies about its data size (truncated payload)
        good = encode_wav(sine[:, None], SR, subtype="FLOAT")
        bad = good[: len(good) // 2]
        req = urllib.request.Request(f"{base}/v1/restore", data=bad,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400

        # after all of that, a clean request restores fine
        got, rate = restore_over_http(srv.host, srv.port, good,
                                      subtype="FLOAT")
        assert rate == SR and np.isfinite(got).all()


def test_http_error_paths_keepalive_safe(dn_stage, sine):
    """Error responses on requests whose body was not consumed must close
    the connection (advertised via Connection: close) — otherwise the
    unread body bytes get parsed as the next request on the keep-alive
    socket. And the error must actually REACH a client still mid-upload:
    the server drains a bounded slice of the body before closing so the
    kernel doesn't RST the response away."""
    pipe = _pipe(dn_stage)
    with RestorationServer(pipe, max_body_bytes=1 << 20,
                           request_timeout=60) as srv:
        def send_and_read_all(payload: bytes) -> bytes:
            s = socket.create_connection((srv.host, srv.port), timeout=30)
            s.sendall(payload)
            resp = b""
            while True:
                try:
                    chunk = s.recv(65536)
                except OSError:
                    break
                if not chunk:
                    break
                resp += chunk
            s.close()
            return resp

        # POST to an unknown path WITH a body: 404, Connection: close,
        # and the socket reaches EOF (the body can't desync a next req)
        body = b"x" * 1000
        resp = send_and_read_all(
            b"POST /v1/nope HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body)
        head = resp.split(b"\r\n\r\n", 1)[0]
        assert b"404" in head.split(b"\r\n", 1)[0]
        assert b"connection: close" in head.lower()

        # mid-upload oversized body: the client is still sending when the
        # 413 is written; the bounded drain lets the response through
        s = socket.create_connection((srv.host, srv.port), timeout=30)
        big = (1 << 20) + 4096
        s.sendall(b"POST /v1/restore HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: %d\r\n\r\n" % big)
        sent = 0
        try:
            while sent < big:  # keep pushing body while the 413 lands
                s.sendall(b"\0" * 65536)
                sent += 65536
        except OSError:
            pass  # server closed after its bounded drain — fine
        resp = b""
        while True:
            try:
                chunk = s.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            resp += chunk
        s.close()
        assert b"413" in resp.split(b"\r\n", 1)[0], resp[:200]

        # chunked transfer encoding: explicit 411 (http.server never
        # decodes chunked; reading framing bytes as audio would be junk)
        resp = send_and_read_all(
            b"POST /v1/restore HTTP/1.1\r\nHost: x\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n"
            b"4\r\nRIFF\r\n0\r\n\r\n")
        assert b"411" in resp.split(b"\r\n", 1)[0], resp[:200]

        # reload with negative Content-Length: immediate 400, never a
        # blocking rfile.read(-1) that pins the handler thread
        t0 = time.monotonic()
        resp = send_and_read_all(
            b"POST /v1/reload HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: -1\r\n\r\n")
        assert b"400" in resp.split(b"\r\n", 1)[0], resp[:200]
        assert time.monotonic() - t0 < 10

        # the server is still healthy
        good = encode_wav(sine[:, None], SR, subtype="FLOAT")
        got, rate = restore_over_http(srv.host, srv.port, good,
                                      subtype="FLOAT")
        assert rate == SR and np.isfinite(got).all()


def test_http_socket_timeout_reclaims_stalled_upload(dn_stage, sine):
    """A client that declares more Content-Length than it sends and then
    just holds the socket open must not pin a handler thread forever: the
    per-connection socket timeout fires, the server drops the connection,
    and service continues."""
    pipe = _pipe(dn_stage)
    with RestorationServer(pipe, request_timeout=60,
                           socket_timeout=1.0) as srv:
        s = socket.create_connection((srv.host, srv.port), timeout=30)
        s.sendall(b"POST /v1/restore HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: 100000\r\n\r\n" + b"\0" * 10)
        # stall: the handler blocks in rfile.read until its socket timeout
        s.settimeout(15)
        deadline = time.monotonic() + 15
        closed = False
        while time.monotonic() < deadline:
            try:
                if s.recv(4096) == b"":
                    closed = True
                    break
            except OSError:
                closed = True
                break
        s.close()
        assert closed, "server never reclaimed the stalled connection"

        good = encode_wav(sine[:, None], SR, subtype="FLOAT")
        got, rate = restore_over_http(srv.host, srv.port, good,
                                      subtype="FLOAT")
        assert rate == SR and np.isfinite(got).all()


def test_http_large_response_survives_slow_reader(dn_stage):
    """The per-connection socket timeout is the TOTAL budget of one
    sendall (Python >=3.5), so a single-write response would be silently
    truncated for a slow-but-progressing client once the restore output
    outgrows socket_timeout x link rate. _send_wav writes in slices: a
    client making progress gets a fresh window per slice and must receive
    the COMPLETE body."""
    pipe = _pipe(dn_stage)
    audio = (0.2 * np.sin(2 * np.pi * 330 * np.arange(12 * SR) / SR)
             ).astype(np.float32)
    wav_in = encode_wav(audio[:, None], SR, subtype="FLOAT")
    with RestorationServer(pipe, request_timeout=300,
                           socket_timeout=0.5) as srv:
        srv._SEND_SLICE = 1 << 16  # instance override: 64 KB slices
        s = socket.create_connection((srv.host, srv.port), timeout=60)
        # small receive buffer so the server's sendall actually blocks on
        # our read pace instead of the kernel swallowing the whole body
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 14)
        s.sendall(b"POST /v1/restore?subtype=FLOAT HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: %d\r\n\r\n" % len(wav_in) + wav_in)
        resp = b""
        s.settimeout(120)
        while b"\r\n\r\n" not in resp:  # headers (restore runs here)
            chunk = s.recv(1024)
            assert chunk, f"connection closed during headers: {resp[:200]}"
            resp += chunk
        head, body = resp.split(b"\r\n\r\n", 1)
        assert b"200" in head.split(b"\r\n", 1)[0], head[:200]
        length = int([ln for ln in head.split(b"\r\n")
                      if ln.lower().startswith(b"content-length")][0]
                     .split(b":")[1])
        assert length > 4 * (1 << 16)  # meaningfully larger than a slice
        while len(body) < length:  # deliberately slow, steady reader
            chunk = s.recv(1 << 15)
            if not chunk:
                break
            body += chunk
            time.sleep(0.1)
        s.close()
    assert len(body) == length, (f"truncated response: {len(body)} of "
                                 f"{length} bytes")
    got, rate = decode_wav(body)
    assert rate == SR and got.shape[0] == audio.shape[0]


def test_http_reject_drain_is_time_bounded(dn_stage):
    """_reject's body drain is bounded in TIME as well as bytes: a client
    trickling its body one byte per fresh read-timeout window must not
    hold the drain loop (and its handler thread) beyond the wall
    deadline."""
    pipe = _pipe(dn_stage)
    with RestorationServer(pipe, request_timeout=60) as srv:
        s = socket.create_connection((srv.host, srv.port), timeout=30)
        s.sendall(b"POST /v1/nope HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: 1000000\r\n\r\n")
        t0 = time.monotonic()
        s.settimeout(0.3)
        closed = False
        while time.monotonic() - t0 < 20:
            try:
                s.sendall(b"\0")  # trickle: keeps each read1 window fresh
            except OSError:
                closed = True
                break
            try:
                if s.recv(4096) == b"":
                    closed = True
                    break
            except TimeoutError:
                pass
            except OSError:
                closed = True
                break
            time.sleep(0.2)
        s.close()
        took = time.monotonic() - t0
        assert closed, "drain loop never gave up on the trickling client"
        assert took < 15, f"drain held the connection {took:.1f}s"

        # the server is still healthy
        stats = json.load(urllib.request.urlopen(
            f"http://{srv.host}:{srv.port}/v1/stats"))
        assert "requests" in stats


def test_http_unread_hint_chunked_is_unknown(dn_stage):
    """A chunked upload has no Content-Length; the 404/503 reject paths
    must treat its unread size as UNKNOWN (bounded drain) rather than 0
    (no drain) — a skipped drain lets the close RST the error response
    away from a mid-upload client."""
    pipe = _pipe(dn_stage)
    with RestorationServer(pipe) as srv:
        class H:  # minimal handler stand-in: only .headers is consulted
            headers = {"Transfer-Encoding": "chunked"}
        assert srv._unread_hint(H) is None
        H.headers = {"Content-Length": "123"}
        assert srv._unread_hint(H) == 123
        H.headers = {}
        assert srv._unread_hint(H) == 0

        # behavioral: a chunked POST to an unknown path mid-upload still
        # receives its 404 (the bounded drain unblocks the client's send)
        s = socket.create_connection((srv.host, srv.port), timeout=30)
        s.sendall(b"POST /v1/nope HTTP/1.1\r\nHost: x\r\n"
                  b"Transfer-Encoding: chunked\r\n\r\n")
        try:
            for _ in range(8):
                s.sendall(b"8000\r\n" + b"\0" * 0x8000 + b"\r\n")
        except OSError:
            pass  # server closed after its drain — fine
        resp = b""
        s.settimeout(15)
        while True:
            try:
                chunk = s.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            resp += chunk
        s.close()
        assert b"404" in resp.split(b"\r\n", 1)[0], resp[:200]


def test_ws_nonreading_peer_is_dropped(dn_stage, monkeypatch):
    """An alive WebSocket peer that stops READING (backgrounded tab) acks
    keepalive probes forever, so only the SO_SNDTIMEO send bound can
    reclaim its bridge: once the pump's send makes no progress for
    socket_timeout, the bridge tears down and the peer's connection
    dies instead of pinning two threads indefinitely.

    (The SO_SNDTIMEO + blocking-sendall mechanism itself is deterministic
    — verified to raise BlockingIOError ~1 s after ~80 KB backlog with
    16 KB buffers — so the test clamps the server-side send buffer to
    keep the required restored-output backlog tiny; without the clamp a
    loaded test machine can't produce enough output inside the deadline.)
    """
    from ml_audio_restoration_tpu.pipeline import ws as wsmod

    orig_bridge = wsmod.bridge_to_tcp

    def small_sndbuf_bridge(handler, *a, **kw):
        handler.connection.setsockopt(socket.SOL_SOCKET,
                                      socket.SO_SNDBUF, 1 << 14)
        return orig_bridge(handler, *a, **kw)

    monkeypatch.setattr(wsmod, "bridge_to_tcp", small_sndbuf_bridge)

    restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    with StreamServer(restorer, block=8192) as ssrv, \
            RestorationServer(_pipe(dn_stage),
                              socket_timeout=1.0) as hsrv:
        hsrv.stream_addr = (ssrv.host, ssrv.port)
        # warmup: compile the streaming step NOW so the non-reading phase
        # below measures buffer backpressure, not compile time (under a
        # loaded test machine the first compile can eat the whole budget)
        from ml_audio_restoration_tpu.pipeline.ws import stream_over_ws
        warm = np.zeros(8192, np.float32)
        stream_over_ws(hsrv.host, hsrv.port, warm, block=8192)

        s = socket.socket()
        # tiny receive buffer: the server's WS sends hit a closed window
        # (and then its SO_SNDTIMEO) after ~tens of KB, not megabytes
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 14)
        s.settimeout(30)
        s.connect((hsrv.host, hsrv.port))
        s.sendall(b"GET /v1/stream HTTP/1.1\r\nHost: x\r\n"
                  b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                  b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
                  b"Sec-WebSocket-Version: 13\r\n\r\n")
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = s.recv(1024)
            assert chunk, "no 101 response"
            resp += chunk
        assert b"101" in resp.split(b"\r\n", 1)[0]

        # feed PCM forever, never read: restored output backs up through
        # the bridge into our closed receive window
        pcm = np.zeros(8192, np.float32).tobytes()
        frame = wsmod.encode_frame(wsmod.BINARY, pcm, mask=True)
        t0 = time.monotonic()
        dropped = False
        try:
            while time.monotonic() - t0 < 90:
                s.sendall(frame)
        except OSError:
            dropped = True
        s.close()
        assert dropped, ("bridge never dropped the non-reading peer "
                         "within 90s")


def test_http_console_page(dn_stage):
    """GET / (and /console) serves the self-contained demo console with
    the right content type; it references only same-origin endpoints that
    exist (no external assets, no build step)."""
    with RestorationServer(_pipe(dn_stage)) as srv:
        for path in ("/", "/console"):
            resp = urllib.request.urlopen(
                f"http://{srv.host}:{srv.port}{path}")
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/html")
            page = resp.read().decode()
        for marker in ("/v1/restore", "/v1/stream", "/v1/stats",
                       "/healthz", "new ArrayBuffer(0)"):
            assert marker in page, marker
        assert "http://" not in page.split("<body>")[1]  # same-origin only


# -------------------------------------------------------------- websocket

def test_ws_frame_codec_roundtrip():
    """RFC 6455 frame codec: masked/unmasked, the 7/16/64-bit length
    encodings, and fragmented-message reassembly."""
    import io

    from ml_audio_restoration_tpu.pipeline import ws

    for n in (0, 1, 125, 126, 65535, 65536):
        payload = bytes(range(256)) * (n // 256) + bytes(range(n % 256))
        for mask in (False, True):
            buf = io.BytesIO(ws.encode_frame(ws.BINARY, payload, mask=mask))
            fin, op, got = ws.read_frame(buf)
            assert fin and op == ws.BINARY and got == payload, (n, mask)

    # fragmentation: BINARY(fin=0) + CONT(fin=0) + CONT(fin=1)
    import struct

    def frag(opcode, payload, fin):
        head = bytearray([(0x80 if fin else 0) | opcode, len(payload)])
        return bytes(head) + payload

    stream = (frag(ws.BINARY, b"ab", False) + frag(ws.CONT, b"cd", False)
              + frag(ws.CONT, b"ef", True)
              + ws.encode_frame(ws.CLOSE, struct.pack(">H", 1000)))
    buf = io.BytesIO(stream)
    op, msg = ws.read_message(buf)
    assert op == ws.BINARY and msg == b"abcdef"
    op, msg = ws.read_message(buf)
    assert op == ws.CLOSE


def test_ws_control_frame_mid_fragment_preserves_message():
    """RFC 6455 §5.4-5.5: a PING interleaved between the fragments of a
    data message is returned first and the fragments survive — the
    message reassembles on the next read."""
    import io
    import struct

    from ml_audio_restoration_tpu.pipeline import ws

    def frag(opcode, payload, fin):
        return bytes([(0x80 if fin else 0) | opcode,
                      len(payload)]) + payload

    stream = (frag(ws.BINARY, b"ab", False)
              + ws.encode_frame(ws.PING, b"ka")
              + frag(ws.CONT, b"cd", False)
              + ws.encode_frame(ws.PONG, b"ka")
              + frag(ws.CONT, b"ef", True)
              + ws.encode_frame(ws.CLOSE, struct.pack(">H", 1000)))
    reader = ws.MessageReader(io.BytesIO(stream))
    assert reader.read() == (ws.PING, b"ka")
    assert reader.read() == (ws.PONG, b"ka")
    assert reader.read() == (ws.BINARY, b"abcdef")
    assert reader.read()[0] == ws.CLOSE


def test_ws_frame_and_message_size_limits():
    """A hostile declared length is rejected BEFORE allocation, and a
    fragmented message that grows past the bound is rejected too."""
    import io

    from ml_audio_restoration_tpu.pipeline import ws

    # 64-bit length header claiming 1 TB: ValueError, no payload read
    huge = bytes([0x80 | ws.BINARY, 127]) + (1 << 40).to_bytes(8, "big")
    with pytest.raises(ValueError, match="exceeds limit"):
        ws.read_frame(io.BytesIO(huge), max_frame=1 << 20)

    # fragments individually under the cap but 3 x 600 > 1024 total
    import struct

    def frag(opcode, payload, fin):
        return (bytes([(0x80 if fin else 0) | opcode, 126])
                + struct.pack(">H", len(payload)) + payload)

    stream = (frag(ws.BINARY, b"x" * 600, False)
              + frag(ws.CONT, b"y" * 600, False)
              + frag(ws.CONT, b"z" * 600, True))
    reader = ws.MessageReader(io.BytesIO(stream), max_message=1024)
    with pytest.raises(ValueError, match="exceeds limit"):
        reader.read()


def test_ws_mask_vectorized_roundtrip():
    """The numpy-vectorized (un)masking path (>=1 KB payloads) matches
    the per-byte definition."""
    from ml_audio_restoration_tpu.pipeline import ws

    key = b"\x37\xfa\x21\x3d"
    for n in (1023, 1024, 4096, 65537):  # straddle the fast-path threshold
        payload = bytes((i * 31) & 0xFF for i in range(n))
        want = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        got = ws._apply_mask(payload, key)
        assert got == want
        assert ws._apply_mask(got, key) == payload


def test_ws_stream_matches_tcp(dn_stage, sine):
    """A WebSocket /v1/stream client gets bit-identical output to the raw
    TCP protocol (the WS endpoint is a pure bridge)."""
    from ml_audio_restoration_tpu.pipeline.ws import stream_over_ws

    block = 2048
    restorer = StreamingRestorer(denoiser=dn_stage, batch=2)
    with StreamServer(restorer, block=block) as ssrv, \
            RestorationServer(_pipe(dn_stage),
                              stream_addr=None) as hsrv:
        hsrv.stream_addr = (ssrv.host, ssrv.port)
        got_ws = stream_over_ws(hsrv.host, hsrv.port, sine, block=block)
        got_tcp = stream_over_tcp(ssrv.host, ssrv.port, sine, block=block)
        stats = json.load(urllib.request.urlopen(
            f"http://{hsrv.host}:{hsrv.port}/v1/stats"))
    np.testing.assert_array_equal(got_ws, got_tcp)
    assert stats["ws_streams"] == 1


def test_ws_handshake_errors(dn_stage):
    """Non-upgrade GET -> 400; WS upgrade without a stream backend -> 503;
    a ping mid-stream gets a pong."""
    import struct

    from ml_audio_restoration_tpu.pipeline import ws

    with RestorationServer(_pipe(dn_stage)) as hsrv:
        # plain GET on the WS path (no backend configured) -> 503
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(
                f"http://{hsrv.host}:{hsrv.port}/v1/stream")
        assert err.value.code == 503

        # backend configured but no Upgrade header -> 400
        hsrv.stream_addr = ("127.0.0.1", 1)  # never dialed for a 400
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(
                f"http://{hsrv.host}:{hsrv.port}/v1/stream")
        assert err.value.code == 400

    # ping/pong on a live bridge
    restorer = StreamingRestorer(denoiser=dn_stage, batch=1)
    with StreamServer(restorer, block=1024) as ssrv, \
            RestorationServer(_pipe(dn_stage)) as hsrv:
        hsrv.stream_addr = (ssrv.host, ssrv.port)
        import base64

        sock = socket.create_connection((hsrv.host, hsrv.port), timeout=60)
        key = base64.b64encode(b"fedcba9876543210").decode()
        sock.sendall((f"GET /v1/stream HTTP/1.1\r\n"
                      f"Host: {hsrv.host}:{hsrv.port}\r\n"
                      "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                      f"Sec-WebSocket-Key: {key}\r\n"
                      "Sec-WebSocket-Version: 13\r\n\r\n").encode())
        rfile = sock.makefile("rb")
        assert b"101" in rfile.readline()
        while rfile.readline().strip():
            pass
        sock.sendall(ws.encode_frame(ws.PING, b"hello", mask=True))
        op, payload = ws.read_message(rfile)
        assert op == ws.PONG and payload == b"hello"
        # end-of-input marker on an empty stream -> server closes cleanly
        sock.sendall(ws.encode_frame(ws.BINARY, b"", mask=True))
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            op, payload = ws.read_message(rfile)
            if op == ws.CLOSE:
                assert struct.unpack(">H", payload[:2])[0] == 1000
                break
        sock.close()


def test_cli_serve_smoke(dn_stage, tmp_path):
    """`cli serve` end-to-end in a subprocess: starts, answers /healthz,
    restores over HTTP, shuts down cleanly on SIGINT."""
    import re
    import signal
    import subprocess
    import sys
    from pathlib import Path

    from ml_audio_restoration_tpu.compat import save_pth

    ckpt = tmp_path / "dn.pth"
    save_pth(ckpt, "denoiser", *dn_stage)
    repo = Path(__file__).resolve().parent.parent

    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from ml_audio_restoration_tpu.cli import main\n"
        f"main(['serve', '--port', '0', '--denoiser', {str(ckpt)!r},\n"
        "      '--no-super-res', '--no-stereo'])\n")
    proc = subprocess.Popen([sys.executable, "-u", "-c", script],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=repo)
    try:
        port = None
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            m = re.search(r"http://[\d.]+:(\d+)", line or "")
            if m:
                port = int(m.group(1))
                break
            assert proc.poll() is None, "serve exited early"
        assert port is not None, "serve never announced its port"

        health = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60))
        assert health["status"] == "ok"

        t = np.arange(SR // 2) / SR
        sig = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        body = encode_wav(sig[:, None], SR)
        got, rate = restore_over_http("127.0.0.1", port, body)
        assert rate == SR and got.shape == (1, len(sig))
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
    assert proc.returncode == 0


def test_stream_server_s16le(dn_stage):
    """s16le transport: output matches the f32 path up to 16-bit
    quantization of input and output."""
    block = 2048
    t = np.arange(int(0.5 * SR)) / SR
    sig = (0.3 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
    # what the server will see after s16 encode->decode of the input
    sig_q = np.clip(np.rint(sig * 32767.0), -32768, 32767) / 32768.0
    sig_q = sig_q.astype(np.float32)

    srv_restorer = StreamingRestorer(denoiser=dn_stage, batch=1)
    with StreamServer(srv_restorer, block=block, fmt="s16le") as srv:
        got = stream_over_tcp(srv.host, srv.port, sig, fmt="s16le",
                              block=block)

    direct = StreamingRestorer(denoiser=dn_stage)
    outs = [direct.feed(sig_q[k:k + block])
            for k in range(0, len(sig_q), block)]
    outs.append(direct.flush())
    want = np.concatenate([o for o in outs if o.shape[-1]],
                          axis=-1)[:, :len(sig)]
    assert got.shape == want.shape
    # output went through one s16 round trip
    assert np.max(np.abs(got - want)) <= 1.0 / 32768.0 + 1e-7
