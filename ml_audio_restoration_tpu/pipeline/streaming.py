"""Streaming (block-by-block) restoration with exact recurrent state.

A capability the reference architecture cannot offer: its cuDNN LSTM is
called per 2-s chunk with state reset every time (stereo_separator.py:107,
trainer.py:652-681), so chunked output differs from whole-recording output.
Here a recording can be fed in arbitrary blocks as they arrive — a live
digitization feed, a socket — and the output matches the single-shot forward
everywhere except the first `context` samples:

- conv stages (denoiser, SR, stereo encoder, stereo decoders) are given
  `context` samples of re-computed left history per block and `lookahead`
  samples of right holdback, so every emitted sample has its full receptive
  field;
- the stereo LSTM consumes each feature frame exactly once, carrying (h, c)
  across blocks — exact state continuity, no context recomputation.

Usage:
    s = StreamingRestorer(denoiser=dn, super_resolution=sr, stereo=st)
    for block in blocks:          # arbitrary block sizes
        out.append(s.feed(block)) # [2, n*f] as samples become final
    out.append(s.flush())

One compiled step per block size; feed fixed-size blocks for a single
compilation.

Multi-stream serving: `batch=B` runs B concurrent streams through ONE
compiled step (the LSTM batch dimension), which is how the per-step
dispatch+sync latency — the single-stream throughput wall measured in
docs/PERFORMANCE.md — is amortized: B streams cost one round trip, not B.
Streams advance in lockstep (same block length per feed, the natural shape
for a block-clocked serving frontend); outputs are [B, ch, n*f]. Each
stream's output bit-matches a single-stream restorer fed the same samples
(tests/test_streaming.py).

Scale-out and throughput knobs:
- `mesh=` shards the stream batch over the 'data' axis of a device mesh —
  streams are independent, so the step is pure SPMD (no collectives) and
  sharded output bit-matches unsharded (streams-per-chip × chips).
- `quantize_int8=` runs the packed denoiser/SR stages int8 (the
  window-independent part of the pipeline's measured int8 win); scales
  files are interchangeable with RestorationPipeline's.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import denoiser as denoiser_mod
from ..models import super_resolution as sr_mod
from ..models import stereo_separator as stereo_mod
from ..ops.lstm import stacked_lstm


class StreamingRestorer:
    """Stateful block-wise denoise -> super-res -> stereo."""

    def __init__(self,
                 denoiser: Optional[Tuple] = None,
                 super_resolution: Optional[Tuple] = None,
                 stereo: Optional[Tuple] = None,
                 context: int = 1024,
                 lookahead: int = 512,
                 batch: int = 1,
                 mid_exact: bool = False,
                 packed: bool = True,
                 source_rate: bool = False,
                 quantize_int8: bool = False,
                 int8_scales=None,
                 mesh=None,
                 lstm_impl: Optional[str] = None,
                 compute_dtype: str = "float32"):
        """context/lookahead in input-rate samples; both must exceed the conv
        receptive field (~400 samples for the default models). batch = number
        of concurrent lockstep streams. mid_exact mirrors
        PipelineConfig.stereo_mid_exact (out = mid +/- predicted side).
        packed mirrors PipelineConfig.packed_convs for the denoiser/SR
        stages (the always-win subset per docs/PERFORMANCE.md; falls back
        per-window when shapes don't divide the packing rate).
        source_rate mirrors PipelineConfig.stereo_source_rate: the stereo
        stage consumes the PRE-SR signal (half the LSTM steps per block)
        and only its side is upsampled around the exact SR mid — the
        half-pixel (align_corners=False) interpolation of a windowed side
        slice matches the single-shot interpolation in the interior, so
        block-fed output still matches the whole-recording forward.
        Implies mid-exact semantics.
        quantize_int8 mirrors PipelineConfig.quantize_int8 for the packed
        denoiser/SR stages only (the window-independent int8 win — the
        streaming stereo stage is never packed, matching the batch
        pipeline's sub-chunked-window gate, docs/PERFORMANCE.md "int8").
        Scales auto-calibrate from the first drained window, or pass
        `int8_scales` (a dict or a path written by
        RestorationPipeline.save_int8_scales — the two serving modes share
        one scales-file format since they run the same packed forwards).
        Like the pipeline, misconfigurations downgrade to float serving
        with a warning. Quantized output trades the exact-continuity bars
        for throughput (quantization noise ~1e-3-1e-2 waveform-scale).
        mesh: a jax.sharding.Mesh with a 'data' axis — shards the stream
        batch across devices (batch must divide evenly); each feed then
        runs one SPMD step over all chips, outputs gathered to host. Per
        stream the computation is unchanged (streams are independent), so
        sharded output bit-matches unsharded.
        lstm_impl: 'pallas' | 'scan' | None (auto). The streaming regime is
        the one place the Pallas LSTM kernel WINS: short per-block
        sequences pay lax.scan re-entry overhead every feed, and the
        carry-I/O kernel measured 29.6 vs 37.2 ms device per batch-16 1-s
        feed (+26%, 541 vs 429 realtime streams; bit-identical output —
        scripts/profile_streaming_ablate.py, 2026-08-20). Auto selects the
        kernel on TPU backends and the scan elsewhere (the kernel needs
        Mosaic; batch inference stays scan per the same measurement).
        compute_dtype: 'float32' (default — the exact-continuity contract
        the streaming bars are defined against) or 'bfloat16': params and
        activations run bf16 like PipelineConfig.compute_dtype (the feed
        is HBM-fusion-bound), LSTM state stays f32 inside the Pallas
        kernel, carries cross feeds at bf16, emitted audio returns f32."""
        self.denoiser = denoiser
        self.super_resolution = super_resolution
        self.stereo = stereo
        self.batch = int(batch)
        # bf16 streaming mirrors PipelineConfig.compute_dtype: params and
        # activations run bf16 (the feed is HBM-fusion-bound), LSTM state
        # stays f32 inside the kernel, carries cross feeds at bf16, and
        # emitted audio returns f32. Off (f32) = the exact-continuity
        # default the streaming bars are defined against.
        self.compute_dtype = jnp.dtype(compute_dtype)
        if self.compute_dtype not in (jnp.float32, jnp.bfloat16):
            raise ValueError(
                f"compute_dtype must be float32|bfloat16, got {compute_dtype}")
        self.mid_exact = bool(mid_exact)
        self.packed = bool(packed)
        self.source_rate = bool(source_rate)
        self.quantize_int8 = bool(quantize_int8)
        if lstm_impl not in (None, "pallas", "scan"):
            raise ValueError(
                f"lstm_impl must be pallas|scan|None, got {lstm_impl!r}")
        if lstm_impl is None:
            import jax

            # kernel on TPU (the measured streaming win), scan elsewhere
            # (Mosaic-only; CPU tests and the virtual-device dryrun take
            # the bit-compatible scan)
            lstm_impl = ("pallas" if jax.devices()[0].platform == "tpu"
                         else "scan")
        self.lstm_impl = lstm_impl
        self._int8_scales = None
        self._int8_version = 0
        self._int8_ready = False  # gates not yet run on a drained window
        if int8_scales is not None:
            if isinstance(int8_scales, dict):
                self._int8_scales = int8_scales
            else:
                self.load_int8_scales(int8_scales)
        self.mesh = mesh
        if mesh is not None:
            ndev = mesh.shape["data"]
            if self.batch % ndev:
                raise ValueError(
                    f"batch {self.batch} must divide evenly over the "
                    f"'data' mesh axis ({ndev} devices)")
        # the U-Net pools by 8, so window starts must stay on the pooling
        # grid (the model is shift-variant modulo 8): context and emission
        # lengths are kept multiples of the alignment
        self._align = 8 if denoiser is not None else 1
        self.context = -(-context // self._align) * self._align
        self.lookahead = lookahead
        self.f = (2 ** len(super_resolution[0]["upsample"])
                  if super_resolution is not None else 1)
        # rate factor at the stereo stage: 1 when it consumes the pre-SR
        # signal (source_rate), f when it consumes the SR output
        self._g = 1 if self.source_rate else self.f
        self._compiled = {}
        self.reset()

    def reset(self):
        self._in_buffer = np.zeros((self.batch, 0), np.float32)  # unemitted
        self._warm = 0  # samples of valid history in front of the buffer
        self._fed = 0
        self._emitted = 0
        self._dec_hist_buf = None
        if self.stereo is not None:
            # per-layer hidden size: stacked_lstm supports non-uniform
            # layer widths, so layer i's carry must match ITS w_hh
            self._lstm_carry = [
                (jnp.zeros((self.batch, layer["w_hh"].shape[0]),
                           self.compute_dtype),
                 jnp.zeros((self.batch, layer["w_hh"].shape[0]),
                           self.compute_dtype))
                for layer in self.stereo[0]["lstm"]
            ]
        else:
            self._lstm_carry = None

    def reset_stream(self, i: int):
        """Recycle slot i for a NEW stream (batch mode): zero its input
        history, LSTM carry and decoder history. The slot then behaves
        exactly like a fresh stream whose start coincides with the batch
        clock — zero left-context, zero recurrent state — while the other
        B-1 streams are untouched."""
        if not 0 <= i < self.batch:
            raise IndexError(f"stream {i} out of range (batch {self.batch})")
        self._in_buffer[i] = 0.0
        if self.stereo is not None:
            # mask at the carry dtype: an f32 mask would silently promote
            # bf16 carries and force a recompile on the next feed
            mask = jnp.ones((self.batch, 1),
                            self.compute_dtype).at[i, 0].set(0.0)
            self._lstm_carry = [(h * mask, c * mask)
                                for h, c in self._lstm_carry]
            if self._dec_hist_buf is not None:
                self._dec_hist_buf = (
                    self._dec_hist_buf
                    * mask[:, :, None].astype(self._dec_hist_buf.dtype))

    # ---------------------------------------------------------------- setup
    @classmethod
    def from_checkpoints(cls, denoiser_path=None, super_res_path=None,
                         stereo_path=None, **kwargs):
        """Load stages from reference .pth or native .msgpack checkpoints
        (same dispatch as RestorationPipeline.from_checkpoints); other
        kwargs go to the constructor."""
        from .restore import load_stage

        return cls(
            denoiser=load_stage(denoiser_path, "denoiser"),
            super_resolution=load_stage(super_res_path, "super_resolution"),
            stereo=load_stage(stereo_path, "stereo_separator"),
            **kwargs)

    # ------------------------------------------------------------ compiled
    def _get_step(self, ctx: int, n: int, la: int):
        key = (ctx, n, la, self._int8_version)
        if key in self._compiled:
            return self._compiled[key]

        f = self.f
        dn, sr, st = self.denoiser, self.super_resolution, self.stereo
        dtype = self.compute_dtype
        if dtype != jnp.float32:
            # one bf16 copy per compiled step (params are closure
            # constants); int8-quantized weights and BN stats ride along
            # untouched (non-float leaves)
            cast = lambda tree: jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)
            dn = cast(dn) if dn is not None else None
            sr = cast(sr) if sr is not None else None
            st = cast(st) if st is not None else None

        from .restore import _denoiser_packable, _sr_packable

        packable = (self.packed
                    and (dn is None or _denoiser_packable(dn))
                    and (sr is None or _sr_packable(sr)))

        g = self._g
        # int8 rides the packed denoiser/SR forwards (same gate + scales
        # format as RestorationPipeline; scope "packed" per measurement)
        int8 = self.quantize_int8 and self._int8_scales is not None
        scales = self._int8_scales if int8 else {}

        def step(carries, window):
            # window: [B, >= ctx + n + la, 1] raw input; emit the middle n.
            # The packed gate keys on the actual (static) window length —
            # the drain loop can pass longer windows than ctx+n+la.
            x = window.astype(dtype)
            pk = packable and window.shape[1] % 4 == 0
            if int8 and pk:
                from ..ops.quant import QuantCtx
            if dn is not None:
                if int8 and pk:
                    x = denoiser_mod.apply_packed(
                        dn[0], dn[1], x,
                        q=QuantCtx(scales["denoiser"], "packed",
                                   skip=denoiser_mod.INT8_FLOAT_LAYERS))
                else:
                    x = (denoiser_mod.apply_packed(dn[0], dn[1], x) if pk
                         else denoiser_mod.apply(dn[0], dn[1], x)[0])
            x_src = x  # pre-SR signal (source_rate stereo input)
            if sr is not None:
                if int8 and pk:
                    x = sr_mod.apply_packed(
                        sr[0], sr[1], x,
                        q=QuantCtx(scales["super_resolution"], "packed"))
                else:
                    x = (sr_mod.apply_packed(sr[0], sr[1], x) if pk
                         else sr_mod.apply(sr[0], sr[1], x)[0])
            if st is None:
                return carries, x[:, ctx * f:(ctx + n) * f, :].astype(
                    jnp.float32)
            # int8 denoiser/SR exit in f32 (dequant epilogue) — hand the
            # stereo stage the compute dtype, like restore.py's stack()
            feats, _ = stereo_mod.encode(
                st[0], st[1],
                (x_src if self.source_rate else x).astype(dtype))
            # The LSTM consumes each NEW frame exactly once; the carried
            # state supplies the past (exact). The conv context supplied the
            # feature edges.
            new_feats = feats[:, ctx * g:(ctx + n) * g, :]
            lstm_out, new_carries = stacked_lstm(
                new_feats, st[0]["lstm"], carries=carries,
                return_carries=True, impl=self.lstm_impl)
            # Decoders are centered convs: they need LSTM outputs on BOTH
            # sides of the emitted region. Left side comes from the carried
            # decoder-history buffer; right side from a speculative LSTM run
            # over the lookahead frames whose state is NOT committed (those
            # frames will be consumed for real next block).
            future_feats = feats[:, (ctx + n) * g:, :]
            lstm_future = stacked_lstm(future_feats, st[0]["lstm"],
                                       carries=new_carries,
                                       impl=self.lstm_impl)
            dec_hist = carries[-1]  # [1, ctx*g, H]
            dec_in = jnp.concatenate([dec_hist, lstm_out, lstm_future],
                                     axis=1)
            # Two-stack (legacy) decode: the grouped dual decoder
            # (stereo_separator.decode_grouped) measured SLOWER here —
            # 40.0 vs 37.2 ms device per batch-16 1-s feed
            # (scripts/profile_streaming_ablate.py) — matching the batch
            # pipeline's finding that plain-layout grouping loses in every
            # regime (docs/PERFORMANCE.md "Grouped dual decoders").
            stereo = stereo_mod.decode(st[0], st[1], dec_in)[0]
            if self.source_rate:
                # side at the source rate over the WHOLE decoded window,
                # upsampled, then sliced: half-pixel interp of a window
                # starting at absolute frame (warm - ctx) reproduces the
                # single-shot interp at every emitted sample (src index
                # ctx + (k+0.5)/f - 0.5 in window coords == warm +
                # (k'+0.5)/f - 0.5 absolute), and ctx/lookahead keep the
                # clamped edges out of the emitted region
                side = (stereo[..., 0:1] - stereo[..., 1:2]) * 0.5
                if f > 1:
                    from ..ops.interp import upsample_linear

                    side = upsample_linear(side, f)
                mid = x[:, ctx * f:(ctx + n) * f, :].astype(side.dtype)
                side = side[:, ctx * f:(ctx + n) * f, :]
                out = jnp.concatenate([mid + side, mid - side], axis=-1)
            else:
                out = stereo[:, ctx * f:(ctx + n) * f, :]
                if self.mid_exact:
                    mid = x[:, ctx * f:(ctx + n) * f, :].astype(out.dtype)
                    side = (out[..., 0:1] - out[..., 1:2]) * 0.5
                    out = jnp.concatenate([mid + side, mid - side], axis=-1)
            new_dec_hist = jnp.concatenate(
                [dec_hist, lstm_out], axis=1)[:, -ctx * g:, :]
            return (new_carries[:len(st[0]["lstm"])] + [new_dec_hist],
                    out.astype(jnp.float32))

        if self.mesh is not None:
            # shard every argument/result leaf's leading (stream-batch)
            # axis over 'data': streams are independent, so this is pure
            # SPMD — no collectives in the step at all; outputs come back
            # addressable per-shard and np.asarray gathers them.
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P("data"))
            jitted = jax.jit(step, in_shardings=shard, out_shardings=shard)
        else:
            jitted = jax.jit(step)
        self._compiled[key] = jitted
        return jitted

    # ------------------------------------------------------- int8 serving
    def _int8_gates(self, window_len: int):
        """Raise ValueError on any int8 misconfiguration so _drain can
        downgrade to float serving with a warning — both for
        auto-calibration and for pre-loaded scales files (a scales file
        calibrated with a stage disabled must not crash the step trace
        with a KeyError when that stage is enabled)."""
        from .restore import _denoiser_packable, _sr_packable

        dn, sr = self.denoiser, self.super_resolution
        if not self.packed:
            raise ValueError("int8 streaming rides the packed conv paths: "
                             "packed=False")
        if dn is not None and not _denoiser_packable(dn):
            raise ValueError("denoiser checkpoint is not packable "
                             "(non-default layout); int8 unavailable")
        if sr is not None and not _sr_packable(sr):
            raise ValueError("super-resolution checkpoint is not packable "
                             "(non-default layout); int8 unavailable")
        if window_len % 4 != 0:
            raise ValueError(
                f"int8 streaming rides the packed path: window length "
                f"{window_len} must be a multiple of 4 (choose "
                f"context/lookahead/block sizes accordingly)")

    def _calibrate_int8(self, window: np.ndarray):
        """Collect denoiser/SR activation scales from one f32 pass over the
        first drained window (mirrors RestorationPipeline.calibrate_int8,
        restore.py; gates raise ValueError so _drain downgrades to float
        with a warning)."""
        from ..ops.quant import QuantCtx, scales_from_amax

        dn, sr = self.denoiser, self.super_resolution
        self._int8_gates(window.shape[1])

        def calib(dn, sr, w):
            amax, x = {}, w
            if dn is not None:
                q = QuantCtx()
                x = denoiser_mod.apply_packed(dn[0], dn[1], x, q=q)
                amax["denoiser"] = q.amax
            if sr is not None:
                q = QuantCtx()
                x = sr_mod.apply_packed(sr[0], sr[1], x, q=q)
                amax["super_resolution"] = q.amax
            return amax

        amax = jax.jit(calib)(dn, sr, window[:, :, None])
        self._int8_scales = {
            stage: scales_from_amax({k: np.asarray(v, np.float32)
                                     for k, v in d.items()})
            for stage, d in amax.items()}
        self._int8_version += 1
        return self._int8_scales

    def save_int8_scales(self, path):
        """Persist calibration (ops/quant.py::save_scales_file — the same
        writer RestorationPipeline uses, so the files stay interchangeable)."""
        from ..ops.quant import save_scales_file

        assert self._int8_scales is not None, "no scales calibrated yet"
        return save_scales_file(path, self._int8_scales)

    def load_int8_scales(self, path):
        from ..ops.quant import load_scales_file

        self._int8_scales = load_scales_file(path)
        self._int8_version += 1
        self._int8_ready = False  # re-gate the new scales on next drain
        return self._int8_scales

    # ---------------------------------------------------------------- api
    def warmup(self, block: int, max_feeds: int = 64) -> dict:
        """Precompile the fixed-block feed steps a serving frontend will hit.

        A block-clocked frontend (pipeline/server.py::StreamServer, `cli
        stream`) feeds a constant block size forever, so the step programs
        it needs are exactly the emission sizes of the first few feeds (the
        lookahead fills over the early feeds, then emission settles at one
        block per feed). This feeds zero blocks until no new program has
        compiled for several consecutive feeds, then `reset()`s — call it
        BEFORE serving real streams, never with streams in flight.

        int8 with no scales loaded is skipped with a warning: the first
        drained window would auto-calibrate on the warmup silence, poisoning
        the scales real traffic then serves with. Load a scales file first
        (the programs also key on the calibration version, so warming the
        float path would be wasted anyway).

        `block` is rounded up to the pooling-grid alignment exactly like
        StreamServer does. Returns {"programs", "seconds"}.
        """
        import time as _time
        import warnings

        if self.quantize_int8 and self._int8_scales is None:
            warnings.warn(
                "streaming warmup skipped: quantize_int8 is set but no "
                "scales are loaded — the first drained window would "
                "calibrate on warmup silence. load_int8_scales() first")
            return {"programs": 0, "seconds": 0.0}
        t0 = _time.monotonic()
        block = -(-int(block) // self._align) * self._align
        before = len(self._compiled)
        z = np.zeros((self.batch, block), np.float32)
        idle = 0  # consecutive feeds that compiled nothing new
        for i in range(max_feeds):
            had = len(self._compiled)
            self.feed(z)
            idle = idle + 1 if len(self._compiled) == had else 0
            # emission can't start until the lookahead is covered — don't
            # count the silent ramp-up feeds as "no new programs"
            if (i + 1) * block > self.lookahead + block and idle >= 4:
                break
        self.reset()
        return {"programs": len(self._compiled) - before,
                "seconds": _time.monotonic() - t0}

    def feed(self, block) -> np.ndarray:
        """Append input samples for every stream; return finalized output
        samples ([out_ch, m*f], or [B, out_ch, m*f] for batch > 1; possibly
        m == 0 while the lookahead fills)."""
        block = np.asarray(block, np.float32)
        if self.batch > 1:
            # a 1-D (or wrong-leading-dim) block whose size happens to divide
            # B would silently smear one stream's samples across all streams
            if block.ndim != 2 or block.shape[0] != self.batch:
                raise ValueError(
                    f"feed() with batch={self.batch} requires a "
                    f"[{self.batch}, n] block, got shape {block.shape}")
        elif block.ndim not in (1, 2) or (block.ndim == 2
                                          and block.shape[0] != 1):
            # same guard for batch=1: a [2, n] stereo array (caller forgot
            # the mixdown) would otherwise be silently time-concatenated
            # into one doubled-length mono stream
            raise ValueError(
                f"feed() takes mono samples: a 1-D array or [1, n], "
                f"got shape {block.shape}")
        if block.ndim == 1:
            block = block[None]
        block = block.reshape(self.batch, -1)
        self._fed += block.shape[1]
        self._in_buffer = np.concatenate([self._in_buffer, block], axis=1)
        return self._drain()

    def flush(self) -> np.ndarray:
        """Zero-pad the lookahead and emit everything still buffered."""
        remaining = self._fed - self._emitted
        aligned = -(-remaining // self._align) * self._align
        pad = np.zeros((self.batch,
                        self.lookahead + (aligned - remaining)), np.float32)
        self._in_buffer = np.concatenate([self._in_buffer, pad], axis=1)
        out = self._drain()
        # trim alignment padding from the final output
        excess = (self._emitted - self._fed) * self.f
        return out[..., :out.shape[-1] - excess] if excess > 0 else out

    def _drain(self) -> np.ndarray:
        ctx, la = self.context, self.lookahead
        outs = []
        while True:
            avail = self._in_buffer.shape[1]
            n = avail - self._warm - la  # emittable samples
            n -= n % self._align  # keep window starts on the pooling grid
            if n <= 0:
                break
            # history shorter than ctx at stream start: left-pad with zeros
            window = self._in_buffer[:, max(0, self._warm - ctx):]
            deficit = ctx - min(ctx, self._warm)
            if deficit:
                window = np.concatenate(
                    [np.zeros((self.batch, deficit), np.float32), window],
                    axis=1)
            # Right-pad the window to a multiple of 8 so the packed (and
            # int8) denoiser/SR paths engage on EVERY window — raw drained
            # lengths are ctx + buffered and usually miss the %4 packing
            # grid, which silently routed most feeds to the plain convs.
            # The zeros land beyond the emitted region's lookahead (>= the
            # conv receptive field), so no emitted sample can see them:
            # the emitted slice [ctx, ctx+n) and the committed LSTM frames
            # are unchanged (exactness tests hold under the pad).
            pad = -window.shape[1] % 8
            if pad:
                window = np.concatenate(
                    [window, np.zeros((self.batch, pad), np.float32)],
                    axis=1)
            if self.quantize_int8 and not self._int8_ready:
                # first drained window: auto-calibrate (mirrors restore()'s
                # first-recording auto-calibration) or, with pre-loaded
                # scales, run the same gates; violations downgrade to float
                # serving, not a crash. A scales file lacking an enabled
                # stage (calibrated with it disabled) is discarded and
                # recalibrated rather than KeyError-ing the step trace.
                import warnings

                if self._int8_scales is not None:
                    need = [k for k, m in
                            (("denoiser", self.denoiser),
                             ("super_resolution", self.super_resolution))
                            if m is not None]
                    missing = [k for k in need
                               if k not in self._int8_scales]
                    if missing:
                        warnings.warn(
                            f"int8 scales lack stage(s) {missing} — "
                            f"calibrated with those stages disabled? "
                            f"Recalibrating on the first window")
                        self._int8_scales = None
                        self._int8_version += 1
                try:
                    if self._int8_scales is None:
                        self._calibrate_int8(window)
                    else:
                        self._int8_gates(window.shape[1])
                    self._int8_ready = True
                except ValueError as e:
                    warnings.warn(f"int8 streaming unavailable — serving "
                                  f"float instead: {e}")
                    self.quantize_int8 = False
            step = self._get_step(ctx, n, la)
            carries = (self._lstm_carry + [self._dec_hist()]
                       if self.stereo is not None else None)
            window = window[:, :, None]
            if self.mesh is not None:
                # place inputs on the mesh explicitly: reset()/reset_stream()
                # create carries on the default device, which would otherwise
                # conflict with the step's committed shardings
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard = NamedSharding(self.mesh, P("data"))
                window = jax.device_put(window, shard)
                if carries is not None:
                    carries = jax.device_put(carries, shard)
            carries, out = step(carries, window)
            if self.stereo is not None:
                self._lstm_carry = carries[:-1]
                self._dec_hist_buf = carries[-1]
            outs.append(np.asarray(out).transpose(0, 2, 1))  # [B, ch, n*f]
            self._warm += n
            self._emitted += n
            # drop history we will never need again
            keep_from = max(0, self._warm - ctx)
            self._in_buffer = self._in_buffer[:, keep_from:]
            self._warm -= keep_from
        if not outs:
            ch = 2 if self.stereo is not None else 1
            full = np.zeros((self.batch, ch, 0), np.float32)
        else:
            full = np.concatenate(outs, axis=2)
        return full[0] if self.batch == 1 else full

    def _dec_hist(self):
        if not hasattr(self, "_dec_hist_buf") or self._dec_hist_buf is None:
            h_dim = self.stereo[0]["lstm"][-1]["w_hh"].shape[0]
            self._dec_hist_buf = jnp.zeros(
                (self.batch, self.context * self._g, h_dim),
                self.compute_dtype)
        return self._dec_hist_buf
