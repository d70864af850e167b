"""Command-line interface.

    python -m ml_audio_restoration_tpu.cli restore in.wav out.wav [...]
    python -m ml_audio_restoration_tpu.cli stream in1.wav in2.wav [...]
    python -m ml_audio_restoration_tpu.cli serve --port 8000 [...]
    python -m ml_audio_restoration_tpu.cli train denoiser --data-dir ... [...]
    python -m ml_audio_restoration_tpu.cli analyze recording.wav
    python -m ml_audio_restoration_tpu.cli evaluate --eval-dir data/eval [...]

(The xRT benchmark is the repo-root `python bench.py`, not a subcommand.)

Surface parity: `restore` mirrors the reference CLI
(/root/reference/src/inference.py:111-143 — positional input/output,
--denoiser/--super-res/--stereo checkpoint paths, --sample-rate,
--no-super-res, plus our chunking controls). `train` replaces the three
hard-coded train_*.py entry scripts with one config-driven command.
`analyze` is the impulse-analytics CLI (analyze_impulses.py:294-313).
"""
from __future__ import annotations

import argparse
import os
import sys


def _add_restore(sub):
    p = sub.add_parser("restore", help="restore a 78rpm recording")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--denoiser", default="models/checkpoints/best_model.pth")
    p.add_argument("--super-res",
                   default="models/checkpoints/super_resolution/best_model.pth")
    p.add_argument("--stereo",
                   default="models/checkpoints/stereo/best_model.pth")
    p.add_argument("--sample-rate", type=int, default=None)
    p.add_argument("--no-super-res", action="store_true")
    p.add_argument("--no-stereo", action="store_true")
    p.add_argument("--no-denoise", action="store_true")
    p.add_argument("--whole-file", action="store_true",
                   help="single unchunked forward (reference behavior)")
    p.add_argument("--coalesce", type=int, default=4,
                   help="directory mode: files per combined device batch "
                        "(restore_many dynamic batching; 1 = one program "
                        "per file)")
    p.add_argument("--config", default=None,
                   help="YAML overlay whose `pipeline:` section seeds the "
                        "serving config (e.g. config/fast_serve.yaml); "
                        "explicit flags below still override it")
    p.add_argument("--chunk-seconds", type=float, default=None)
    p.add_argument("--overlap-seconds", type=float, default=None)
    p.add_argument("--data-parallel", type=int, default=None,
                   help="shard the chunk batch over this many devices")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default=None,
                   help="compute dtype (bfloat16 ~ 1.5e-4 deviation)")
    p.add_argument("--stereo-chunk-seconds", type=float, default=None,
                   help="internal stereo LSTM window (0.25 measured "
                        "quality-free, +19%% stereo throughput)")
    p.add_argument("--no-packed-convs", action="store_true",
                   help="disable the packed (space-to-depth) conv layout "
                        "(exact legacy computation order)")
    p.add_argument("--stereo-mid-exact", action="store_true",
                   help="rebuild L/R around the true mid (out = mid +/- "
                        "predicted side): mono fidelity exact by "
                        "construction, +3.6 dB mid SNR measured")
    p.add_argument("--stereo-source-rate", action="store_true",
                   help="run the stereo stage on the denoised source-rate "
                        "signal (pre super-res, the rate the reference "
                        "trains it at) and upsample only its side — halves "
                        "the LSTM recurrence, mid stays the exact SR "
                        "output (implies mid-exact semantics)")
    p.add_argument("--int8", action="store_true",
                   help="int8 serving quantization (opt-in preset: halves "
                        "the conv stacks' HBM traffic; auto-calibrates on "
                        "the first recording — quality study in "
                        "docs/RESULTS.md)")
    p.add_argument("--int8-scales", default=None,
                   help="calibration JSON: loaded if it exists, else "
                        "written after auto-calibration (skips the f32 "
                        "calibration pass on later runs)")
    return p


def _cmd_restore(args):
    from .config import load_config
    from .pipeline import RestorationPipeline

    config = load_config(args.config).pipeline
    # only EXPLICIT flags override the YAML overlay (None/False defaults
    # leave the config's values alone)
    for flag, field in [("sample_rate", "sample_rate"),
                        ("chunk_seconds", "chunk_seconds"),
                        ("overlap_seconds", "overlap_seconds"),
                        ("dtype", "compute_dtype"),
                        ("stereo_chunk_seconds", "stereo_chunk_seconds")]:
        v = getattr(args, flag)
        if v is not None:
            setattr(config, field, v)
    if args.no_super_res:
        config.enable_super_resolution = False
    if args.whole_file:
        config.whole_file = True
    if args.stereo_mid_exact:
        config.stereo_mid_exact = True
    if args.stereo_source_rate:
        config.stereo_source_rate = True
    if args.no_packed_convs:
        config.packed_convs = False
    if args.int8:
        config.quantize_int8 = True
    mesh = None
    if args.data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh(data_parallel=args.data_parallel)
    pipe = RestorationPipeline.from_checkpoints(
        denoiser_path=None if args.no_denoise else args.denoiser,
        super_res_path=None if args.no_super_res else args.super_res,
        stereo_path=None if args.no_stereo else args.stereo,
        config=config,
    )
    pipe.mesh = mesh
    import os

    if args.int8_scales and os.path.exists(args.int8_scales):
        pipe.load_int8_scales(args.int8_scales)
    if os.path.isdir(args.input):
        results = pipe.restore_directory(args.input, args.output,
                                         coalesce=args.coalesce)
        for out, rate in results:
            print(f"restored -> {out} @ {rate} Hz")
        print(f"{len(results)} files restored")
    else:
        out, rate = pipe.restore_file(args.input, args.output)
        print(f"restored -> {out} @ {rate} Hz")
    _persist_int8_scales(args.int8_scales, pipe)
    return 0


def _add_stream(sub):
    p = sub.add_parser(
        "stream",
        help="block-fed (streaming) restore of one or more recordings")
    p.add_argument("inputs", nargs="+",
                   help="input recordings — each becomes one concurrent "
                        "lockstep stream of the batched restorer")
    p.add_argument("--output-dir", default="restored_stream")
    p.add_argument("--denoiser", default="models/checkpoints/best_model.pth")
    p.add_argument("--super-res",
                   default="models/checkpoints/super_resolution/best_model.pth")
    p.add_argument("--stereo",
                   default="models/checkpoints/stereo/best_model.pth")
    p.add_argument("--no-super-res", action="store_true")
    p.add_argument("--no-stereo", action="store_true")
    p.add_argument("--no-denoise", action="store_true")
    p.add_argument("--sample-rate", type=int, default=22050,
                   help="input rate the models expect (files are resampled)")
    p.add_argument("--block-seconds", type=float, default=0.5,
                   help="samples fed per step — the serving frontend's "
                        "block clock (output latency ~ block + lookahead)")
    p.add_argument("--context", type=int, default=1024,
                   help="history samples re-fed per block (must exceed the "
                        "conv receptive field, ~400)")
    p.add_argument("--lookahead", type=int, default=512,
                   help="future samples required before emitting (ditto)")
    p.add_argument("--stereo-mid-exact", action="store_true",
                   help="rebuild L/R around the true mid (see restore)")
    p.add_argument("--stereo-source-rate", action="store_true",
                   help="stereo stage at the pre-super-res rate; implies "
                        "mid-exact semantics (see restore)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="bf16 streaming compute (params+activations; f32 "
                        "LSTM state in-kernel, f32 output) — the feed is "
                        "HBM-bound, measured win in docs/PERFORMANCE.md")
    p.add_argument("--int8", action="store_true",
                   help="int8 streaming (packed denoiser/SR stages; "
                        "auto-calibrates on the first window)")
    p.add_argument("--int8-scales", default=None,
                   help="calibration JSON, interchangeable with `restore "
                        "--int8-scales`: loaded if it exists, written "
                        "after auto-calibration (and rewritten if its "
                        "stages no longer cover the enabled ones)")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="shard the stream batch over this many devices "
                        "(stream count must divide evenly)")
    p.add_argument("--pcm", choices=["f32le", "s16le"], default=None,
                   help="live pipe mode (single '-' input): read raw mono "
                        "PCM in this format from stdin, write restored "
                        "interleaved PCM to stdout (headerless, at "
                        "sample-rate x upscale); status goes to stderr")
    p.add_argument("--lstm-impl", choices=["pallas", "scan"], default=None,
                   help="LSTM recurrence implementation (default: the "
                        "Pallas kernel on TPU — measured +26%% per feed — "
                        "and the scan elsewhere)")
    return p


def _persist_int8_scales(path, restorer):
    """Write auto-/re-calibrated int8 scales to `path` so later processes
    skip the f32 calibration pass. An existing file is rewritten only when
    its stages no longer cover the current calibration (i.e. it was
    calibrated with a stage disabled and the serving object recalibrated)."""
    import os

    from .ops.quant import load_scales_file

    if not path or restorer._int8_scales is None:
        return
    if os.path.exists(path):
        try:
            have = set(load_scales_file(path))
        except (OSError, ValueError):
            have = set()
        if set(restorer._int8_scales) <= have:
            return
    restorer.save_int8_scales(path)


def _stream_pipe(args, restorer, block):
    """Live pipe serving: raw mono PCM on stdin -> restored interleaved PCM
    on stdout, emitted block-by-block at the restorer's bounded latency.
    Headerless by design — compose with ffmpeg/sox for container formats
    (note -ar: stdin has no header, so the producer must resample to the
    models' rate):
        ffmpeg -i live.flac -f f32le -ac 1 -ar 22050 - |
        cli stream - --pcm f32le |
        ffmpeg -f f32le -ac 2 -ar 44100 -i - restored.flac
    """
    import sys

    import numpy as np

    fmt = args.pcm or "f32le"
    dtype = np.dtype(np.float32 if fmt == "f32le" else np.int16)
    want = block * dtype.itemsize
    stdin, stdout = sys.stdin.buffer, sys.stdout.buffer

    def emit(out):
        o = np.asarray(out)
        if o.ndim == 3:
            o = o[0]
        if o.shape[-1] == 0:
            return
        inter = np.ascontiguousarray(o.T)  # [t, ch] interleaved
        if fmt == "s16le":
            inter = np.clip(np.rint(inter * 32767.0),
                            -32768, 32767).astype(np.int16)
        else:
            inter = inter.astype(np.float32)
        stdout.write(inter.tobytes())
        stdout.flush()

    print(f"streaming stdin ({fmt} @ {args.sample_rate} Hz) -> stdout "
          f"({fmt}, {2 if restorer.stereo is not None else 1} ch @ "
          f"{args.sample_rate * restorer.f} Hz), "
          f"block {block} samples", file=sys.stderr)
    pending = b""
    while True:
        # a pipe read may return short — accumulate one full block (or EOF)
        # so every feed is block-sized and hits one compiled step
        buf = stdin.read(want - len(pending))
        if buf:
            pending += buf
        if not pending or (buf and len(pending) < want):
            if not buf:
                break
            continue
        whole = len(pending) // dtype.itemsize * dtype.itemsize
        if whole:
            x = np.frombuffer(pending[:whole], dtype).astype(np.float32)
            if fmt == "s16le":
                x /= 32768.0
            emit(restorer.feed(x))
        pending = pending[whole:]
        if not buf:
            break
    emit(restorer.flush())
    return 0


def _cmd_stream(args):
    import os

    import numpy as np

    from .audio import load_audio, save_audio
    from .pipeline.streaming import StreamingRestorer

    pipe = args.inputs == ["-"]
    if "-" in args.inputs and not pipe:
        raise SystemExit("stream: '-' (pipe mode) must be the only input")
    if pipe and args.data_parallel:
        raise SystemExit("stream: pipe mode is single-stream; "
                         "--data-parallel needs file inputs")
    if args.pcm and not pipe:
        raise SystemExit("stream: --pcm is pipe mode's input format; "
                         "it requires the single '-' input")
    mesh = None
    if args.data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh(data_parallel=args.data_parallel)
    restorer = StreamingRestorer.from_checkpoints(
        denoiser_path=None if args.no_denoise else args.denoiser,
        super_res_path=None if args.no_super_res else args.super_res,
        stereo_path=None if args.no_stereo else args.stereo,
        context=args.context, lookahead=args.lookahead,
        batch=len(args.inputs),
        mid_exact=args.stereo_mid_exact,
        source_rate=args.stereo_source_rate,
        quantize_int8=args.int8,
        int8_scales=(args.int8_scales
                     if args.int8_scales and os.path.exists(args.int8_scales)
                     else None),
        mesh=mesh, lstm_impl=args.lstm_impl,
        compute_dtype=args.dtype)
    block = max(1, int(round(args.block_seconds * args.sample_rate)))
    if pipe:
        rc = _stream_pipe(args, restorer, block)
        _persist_int8_scales(args.int8_scales, restorer)
        return rc

    # one lockstep stream per input: shorter recordings ride along
    # zero-padded and are trimmed back to length on save
    streams = [load_audio(p, sample_rate=args.sample_rate)[0][0]
               for p in args.inputs]
    lengths = [s.shape[0] for s in streams]
    t = max(lengths)
    batch = np.zeros((len(streams), t), np.float32)
    for i, s in enumerate(streams):
        batch[i, :s.shape[0]] = s

    outs = [restorer.feed(batch[:, o:o + block])
            for o in range(0, t, block)]
    outs.append(restorer.flush())
    out = np.concatenate([o if o.ndim == 3 else o[None] for o in outs],
                         axis=2)

    os.makedirs(args.output_dir, exist_ok=True)
    out_rate = args.sample_rate * restorer.f
    used = set()
    for i, path in enumerate(args.inputs):
        base = os.path.splitext(os.path.basename(path))[0]
        # two inputs sharing a basename (takeA/rec.wav takeB/rec.wav) must
        # not silently overwrite each other
        name, k = base, 2
        while name in used:
            name, k = f"{base}_{k}", k + 1
        used.add(name)
        dest = os.path.join(args.output_dir, f"{name}_restored.wav")
        save_audio(dest, out[i, :, :lengths[i] * restorer.f], out_rate)
        print(f"streamed -> {dest} @ {out_rate} Hz")
    _persist_int8_scales(args.int8_scales, restorer)
    return 0


def _add_serve(sub):
    p = sub.add_parser(
        "serve",
        help="serving daemon: HTTP restore endpoint + TCP PCM streaming")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000,
                   help="HTTP port (POST /v1/restore, GET /healthz, "
                        "GET /v1/stats); 0 picks a free port")
    p.add_argument("--stream-port", type=int, default=None,
                   help="also serve live PCM streams on this TCP port "
                        "(one lockstep stream slot per connection; 0 "
                        "picks a free port)")
    p.add_argument("--stream-slots", type=int, default=16,
                   help="concurrent stream connections (the batched "
                        "restorer's lockstep batch size)")
    p.add_argument("--lstm-impl", choices=["pallas", "scan"], default=None,
                   help="streaming LSTM implementation (default: the "
                        "Pallas kernel on TPU — measured +26%% per feed — "
                        "and the scan elsewhere)")
    p.add_argument("--block-seconds", type=float, default=0.5,
                   help="stream block clock (output latency ~ block + "
                        "lookahead)")
    p.add_argument("--tick-seconds", type=float, default=None,
                   help="max wait for a full block before a starved live "
                        "stream gets silence (default: wait indefinitely "
                        "— offline/backpressure mode)")
    p.add_argument("--pcm", choices=["f32le", "s16le"], default="f32le",
                   help="stream sample format, both directions")
    p.add_argument("--max-outbox-mb", type=float, default=32.0,
                   help="per-stream output buffer bound; a client that "
                        "falls further behind is dropped so it can't "
                        "stall or bloat the server")
    p.add_argument("--sndbuf-kb", type=int, default=None,
                   help="cap SO_SNDBUF on stream sockets (default: OS "
                        "autotuning, which may kernel-buffer several MB "
                        "per slow client before --max-outbox-mb bites)")
    p.add_argument("--drain-stall-seconds", type=float, default=30.0,
                   help="offline mode only: drop a stream whose client "
                        "makes zero read progress for this long while "
                        "its outbox is above high water")
    p.add_argument("--denoiser", default="models/checkpoints/best_model.pth")
    p.add_argument("--super-res",
                   default="models/checkpoints/super_resolution/best_model.pth")
    p.add_argument("--stereo",
                   default="models/checkpoints/stereo/best_model.pth")
    p.add_argument("--no-super-res", action="store_true")
    p.add_argument("--no-stereo", action="store_true")
    p.add_argument("--no-denoise", action="store_true")
    p.add_argument("--config", default=None,
                   help="YAML overlay whose `pipeline:` section seeds the "
                        "serving config (e.g. config/fast_serve.yaml)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default=None)
    p.add_argument("--stereo-chunk-seconds", type=float, default=None)
    p.add_argument("--stereo-mid-exact", action="store_true")
    p.add_argument("--stereo-source-rate", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8-scales", default=None)
    p.add_argument("--max-queue", type=int, default=8,
                   help="pending HTTP restores before 503 backpressure")
    p.add_argument("--max-coalesce", type=int, default=4,
                   help="queued HTTP restores coalesced into one device "
                        "program (dynamic batching; 1 disables)")
    p.add_argument("--max-body-mb", type=float, default=512.0,
                   help="largest accepted HTTP request body")
    p.add_argument("--request-timeout", type=float, default=600.0,
                   help="504 for a queued restore not served within this")
    p.add_argument("--socket-timeout", type=float, default=120.0,
                   help="per-connection socket read/write window: bounds "
                        "stalled uploads, slow response readers, and "
                        "WebSocket sends to a peer that stopped reading")
    p.add_argument("--warmup", action="store_true",
                   help="precompile every serving program before "
                        "accepting traffic (minutes on a cold TPU host; "
                        "without it the first request of each length "
                        "bucket pays its compile)")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="shard the HTTP pipeline's chunk batch (and the "
                        "stream batch) over this many devices")
    return p


def _cmd_serve(args):
    import os
    import signal
    import threading

    from .config import load_config
    from .pipeline import RestorationPipeline, RestorationServer
    from .pipeline.server import StreamServer
    from .pipeline.streaming import StreamingRestorer

    config = load_config(args.config).pipeline
    if args.dtype is not None:
        config.compute_dtype = args.dtype
    if args.stereo_chunk_seconds is not None:
        config.stereo_chunk_seconds = args.stereo_chunk_seconds
    if args.no_super_res:
        config.enable_super_resolution = False
    if args.stereo_mid_exact:
        config.stereo_mid_exact = True
    if args.stereo_source_rate:
        config.stereo_source_rate = True
    if args.int8:
        config.quantize_int8 = True
    mesh = None
    if args.data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh(data_parallel=args.data_parallel)

    dn = None if args.no_denoise else args.denoiser
    sr_ck = None if args.no_super_res else args.super_res
    st = None if args.no_stereo else args.stereo
    pipe = RestorationPipeline.from_checkpoints(
        denoiser_path=dn, super_res_path=sr_ck, stereo_path=st,
        config=config)
    pipe.mesh = mesh
    if args.int8_scales and os.path.exists(args.int8_scales):
        pipe.load_int8_scales(args.int8_scales)

    if args.warmup:
        print("warming up: compiling serving programs "
              "(first compile on a cold host can take minutes)...",
              flush=True)
        info = pipe.warmup(coalesce=args.max_coalesce)
        print(f"  pipeline: {info['programs']} programs "
              f"(chunk buckets {info['buckets']}) in "
              f"{info['seconds']:.1f}s", flush=True)

    http_srv = RestorationServer(
        pipe, host=args.host, port=args.port,
        max_queue=args.max_queue, max_coalesce=args.max_coalesce,
        max_body_bytes=int(args.max_body_mb * (1 << 20)),
        request_timeout=args.request_timeout,
        socket_timeout=args.socket_timeout, quiet=False)
    http_srv.start()
    print(f"HTTP serving on http://{http_srv.host}:{http_srv.port} "
          f"(POST /v1/restore, GET /healthz, GET /v1/stats)")

    stream_srv = None
    if args.stream_port is not None:
        restorer = StreamingRestorer.from_checkpoints(
            denoiser_path=dn, super_res_path=sr_ck, stereo_path=st,
            batch=args.stream_slots,
            mid_exact=args.stereo_mid_exact,
            source_rate=args.stereo_source_rate,
            quantize_int8=args.int8,
            int8_scales=(args.int8_scales if args.int8_scales
                         and os.path.exists(args.int8_scales) else None),
            mesh=mesh, lstm_impl=args.lstm_impl,
            compute_dtype=args.dtype or "float32")
        block = max(1, int(round(args.block_seconds * config.sample_rate)))
        if args.warmup:
            sinfo = restorer.warmup(block)
            print(f"  streaming: {sinfo['programs']} programs in "
                  f"{sinfo['seconds']:.1f}s", flush=True)
        stream_srv = StreamServer(restorer, host=args.host,
                                  port=args.stream_port, block=block,
                                  fmt=args.pcm,
                                  tick_seconds=args.tick_seconds,
                                  max_outbox_bytes=int(
                                      args.max_outbox_mb * (1 << 20)),
                                  sndbuf=(args.sndbuf_kb * 1024
                                          if args.sndbuf_kb else None),
                                  drain_stall_seconds=
                                  args.drain_stall_seconds)
        stream_srv.start()
        # one scrape covers both frontends: /v1/stats gains a "stream"
        # block and /metrics flattens it to mlar_stream_*
        http_srv.extra_stats = stream_srv.stats
        # browsers reach the same lockstep engine over WS /v1/stream
        http_srv.stream_addr = (stream_srv.host, stream_srv.port)
        print(f"PCM streaming on tcp://{stream_srv.host}:{stream_srv.port} "
              f"({args.stream_slots} slots, {args.pcm} @ "
              f"{config.sample_rate} Hz in, block {block}) and "
              f"ws://{http_srv.host}:{http_srv.port}/v1/stream")

    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    try:
        stop.wait()
    finally:
        print("shutting down")
        if stream_srv is not None:
            stream_srv.shutdown()
        http_srv.shutdown()
        _persist_int8_scales(args.int8_scales, pipe)
        if stream_srv is not None:
            # stream-only traffic auto-calibrates the StreamingRestorer,
            # not the HTTP pipeline — persist whichever calibrated so the
            # next daemon start skips the f32 pass (the files are
            # interchangeable; _persist only rewrites on wider coverage)
            _persist_int8_scales(args.int8_scales, stream_srv.restorer)
    return 0


def _add_train(sub):
    p = sub.add_parser("train", help="train a model")
    p.add_argument("model", choices=["denoiser", "super_resolution",
                                     "stereo_separator"])
    p.add_argument("--config", default=None, help="YAML config overlay")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--chunk-duration", type=float, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--test-audio-dir", default=None)
    p.add_argument("--data-parallel", type=int, default=None,
                   help="size of the data-parallel mesh axis")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--mixed", action="store_true",
                   help="semi-supervised training on synthetic + real "
                        "degraded audio (requires --degraded-dir)")
    p.add_argument("--degraded-dir", default=None,
                   help="directory of real degraded recordings")
    p.add_argument("--adaptive", action="store_true",
                   help="fit artifact statistics to --degraded-dir recordings")
    # multi-host (pod) launch: run the same command on every host with its
    # rank; on Cloud TPU VMs the three values auto-detect and can be omitted
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port "
                        "(auto-detected on Cloud TPU VMs)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host world size")
    p.add_argument("--process-id", type=int, default=None,
                   help="this host's rank in the multi-host job")
    return p


def _cmd_train(args):
    from .config import load_config
    from .parallel import distributed as dist
    from .train.trainer import train_from_config

    # must run before any other jax call on a multi-host job; no-op when
    # single-host (parallel/distributed.py::initialize)
    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_processes,
                    process_id=args.process_id)

    overrides = {"train": {"model": args.model}, "data": {}}
    for field, section in [
        ("batch_size", "train"), ("num_epochs", "train"),
        ("learning_rate", "train"), ("checkpoint_dir", "train"),
        ("test_audio_dir", "train"), ("data_parallel", "train"),
        ("data_dir", "data"), ("chunk_duration", "data"),
    ]:
        v = getattr(args, field)
        if v is not None:
            overrides[section][field] = v
    if args.mixed or args.adaptive:
        overrides["data"]["degraded_dir"] = args.degraded_dir
    cfg = load_config(args.config, overrides)
    dataset_kind = ("adaptive" if args.adaptive
                    else "mixed" if args.mixed else "standard")
    train_from_config(cfg, steps_per_epoch=args.steps_per_epoch,
                      dataset_kind=dataset_kind)
    return 0


def _add_analyze(sub):
    p = sub.add_parser("analyze", help="impulse analytics for a recording")
    p.add_argument("input")
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--plot", action="store_true")
    return p


def _cmd_analyze(args):
    from .audio.analyze import analyze_78rpm_recording

    analyze_78rpm_recording(args.input, sample_rate=args.sample_rate,
                            plot=args.plot)
    return 0


def _add_evaluate(sub):
    p = sub.add_parser(
        "evaluate",
        help="objective quality metrics (SNR/SI-SDR/LSD) for checkpoints")
    from . import evaluate as _ev

    _ev.add_arguments(p)
    return p


def _cmd_evaluate(args):
    from . import evaluate as _ev

    return _ev.run(args)


def _add_export(sub):
    p = sub.add_parser(
        "export",
        help="export a checkpoint to a reference-format .pth "
             "(loadable by the upstream PyTorch project)")
    p.add_argument("checkpoint", help=".msgpack (self-describing) or .pth")
    p.add_argument("output", help="output .pth path")
    p.add_argument("--model",
                   choices=["denoiser", "super_resolution",
                            "stereo_separator"],
                   default=None,
                   help="model family (auto-detected from native "
                        ".msgpack checkpoints; required for .pth input)")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA-averaged weights (checkpoint must "
                        "have been trained with ema_decay > 0)")
    return p


def _cmd_export(args):
    from .compat import save_pth

    src = str(args.checkpoint)
    if src.endswith(".pth"):
        if args.model is None:
            print("error: --model is required for .pth input "
                  "(.pth state_dicts are not self-describing)",
                  file=sys.stderr)
            return 2
        if args.ema:
            print("error: --ema needs a native .msgpack checkpoint "
                  "(reference .pth files carry no EMA weights)",
                  file=sys.stderr)
            return 2
        from .compat import load_model

        name = args.model
        params, state = load_model(src, name)
        epoch = 0
    else:
        from .train.checkpoints import load_checkpoint

        ckpt = load_checkpoint(src)
        name = ckpt.get("model_name", args.model)
        if isinstance(name, bytes):
            name = name.decode()
        name = str(name) if name else args.model
        if args.model and name != args.model:
            print(f"error: checkpoint is for model {name!r}, not "
                  f"{args.model!r}", file=sys.stderr)
            return 2
        if args.ema:
            if "ema_params" not in ckpt:
                print("error: checkpoint carries no ema_params "
                      "(trained with ema_decay == 0)", file=sys.stderr)
                return 2
            params = ckpt["ema_params"]
        else:
            params = ckpt["params"]
        state = ckpt["model_state"]
        epoch = int(ckpt.get("epoch", 0))
    save_pth(args.output, name, params, state, epoch=epoch)
    print(f"exported {name} -> {args.output}"
          + (" (EMA weights)" if args.ema else ""))
    return 0


def _add_acquire(sub):
    p = sub.add_parser("acquire",
                       help="download eligible stereo training data")
    p.add_argument("source", choices=["internetarchive", "freesound",
                                      "musopen"])
    p.add_argument("--output-dir", default="data/raw")
    p.add_argument("--max-files", type=int, default=50)
    p.add_argument("--freesound-api-key", default=None)
    return p


def _cmd_acquire(args):
    from .acquire import SCRAPERS, ScraperConfig

    cfg = ScraperConfig(output_dir=args.output_dir,
                        max_files_per_source=args.max_files)
    kwargs = {}
    if args.source == "freesound" and args.freesound_api_key:
        kwargs["api_key"] = args.freesound_api_key
    scraper = SCRAPERS[args.source](cfg, **kwargs)
    stats = scraper.run()
    print(f"{args.source}: searched={stats.searched} "
          f"eligible={stats.eligible} downloaded={stats.downloaded} "
          f"skipped={stats.skipped} failed={stats.failed}")
    return 0


def main(argv=None):
    # MLAR_PLATFORM=cpu forces the CPU backend even where a sitecustomize
    # pre-imports jax with a TPU platform (env JAX_PLATFORMS is read at
    # import, i.e. too late there; the config update below still works as
    # long as no computation has run) — for debugging and CI soak runs
    plat = os.environ.get("MLAR_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    parser = argparse.ArgumentParser(
        prog="ml_audio_restoration_tpu",
        description="TPU-native 78rpm audio restoration")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_restore(sub)
    _add_stream(sub)
    _add_serve(sub)
    _add_train(sub)
    _add_analyze(sub)
    _add_evaluate(sub)
    _add_export(sub)
    _add_acquire(sub)

    args = parser.parse_args(argv)

    from .utils.cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    if args.command == "restore":
        return _cmd_restore(args)
    if args.command == "stream":
        return _cmd_stream(args)
    if args.command == "serve":
        return _cmd_serve(args)
    if args.command == "train":
        return _cmd_train(args)
    if args.command == "analyze":
        return _cmd_analyze(args)
    if args.command == "evaluate":
        return _cmd_evaluate(args)
    if args.command == "export":
        return _cmd_export(args)
    if args.command == "acquire":
        return _cmd_acquire(args)
    parser.error(f"unknown command {args.command}")


if __name__ == "__main__":
    sys.exit(main())
