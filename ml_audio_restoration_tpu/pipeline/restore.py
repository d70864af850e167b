"""End-to-end restoration pipeline: denoise -> super-resolution -> stereo.

Capability parity with /root/reference/src/inference.py:17-108 (load ->
normalize -> denoiser -> optional SR (x2 rate) -> stereo -> normalize -> save),
rebuilt TPU-first:

- The reference runs ONE unchunked forward per model (inference.py:59-95) and,
  during training rendering, a sequential Python loop over 2-s chunks with
  hard seams (trainer.py:652-681). Here the recording is framed into a
  *batch* of overlapping chunks, all three models run over the batch inside a
  single jit (one XLA program, MXU kept full), and seams are crossfaded with
  COLA overlap-add.
- Chunk-count is bucketed (padded up with zero chunks) so arbitrary-length
  recordings hit a handful of compiled programs instead of one per length.
- `whole_file=True` reproduces the reference CLI behavior exactly (single
  chunk spanning the recording) for parity testing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..models import denoiser as denoiser_mod
from ..models import super_resolution as sr_mod
from ..models import stereo_separator as stereo_mod
from ..ops import overlap_add, frame_structured
from ..ops.chunking import num_chunks
from ..ops.interp import upsample_linear
from ..audio import load_audio, save_audio, normalize_audio


def load_stage(path, name):
    """Load one stage's (params, state) from a reference .pth or a native
    .msgpack checkpoint (dispatch on extension); None passes through.
    Shared by RestorationPipeline / StreamingRestorer `.from_checkpoints`."""
    if path is None:
        return None
    p = str(path)
    import os

    if not os.path.exists(p):
        raise FileNotFoundError(
            f"{name} checkpoint not found: {p!r} — pass a reference "
            f".pth or a native .msgpack checkpoint, or disable the "
            f"stage (--no-denoise/--no-super-res/--no-stereo)")
    if p.endswith(".pth"):
        from ..compat import load_model

        return load_model(p, name)
    from ..train.checkpoints import load_native

    return load_native(p, name)


class Int8LengthGateError(ValueError):
    """Per-recording int8 calibration gate: a whole_file length off the
    packing grid. Unlike the config/checkpoint-shaped gates this is
    retryable — the next recording may align — so restore() keys its
    don't-retry flag on the exception type, not the message."""


def _denoiser_packable(dn) -> bool:
    p = dn[0]
    return (len(p["encoder"]) == 3
            and p["encoder"][0]["c1"]["conv"]["w"].shape[1] == 1
            and p["final_conv"]["w"].shape[2] == 1)


def _sr_packable(sr) -> bool:
    p = sr[0]
    return (len(p["upsample"]) >= 1 and p["initial"]["w"].shape[1] == 1
            and p["recon"]["w"].shape[2] == 1)


def _bucket(n: int, granularity: int = 4) -> int:
    """Round the chunk count up so recompiles are bounded."""
    return max(granularity, ((n + granularity - 1) // granularity) * granularity)


def stereo_sub_cfg(cfg: PipelineConfig, stage_len: int, f: int,
                   sample_rate: Optional[int] = None):
    """Internal stereo re-framing plan: (sub, hop, ov) in samples at the
    stereo stage's input rate, or None to run the stage on the outer chunks.

    The LSTM's wall time is its sequential step count, so re-framing into
    shorter windows (more batch, fewer steps) trades LSTM context length for
    throughput (docs/PERFORMANCE.md "Stereo LSTM window"). Shared by the
    single-device and staged pipelines so both honor
    config.stereo_chunk_seconds identically.

    `sample_rate`: the rate of the audio actually flowing through the
    stage (restore()'s argument). Defaults to cfg.sample_rate, but a
    caller restoring off-rate audio must pass it — a seconds-denominated
    window sized at the wrong rate would silently cover the wrong
    duration (half/double the LSTM context)."""
    if cfg.stereo_chunk_seconds is None:
        return None
    rate = sample_rate or cfg.sample_rate
    sub = int(round(cfg.stereo_chunk_seconds * rate * f))
    # round to the packing grid so the packed stereo path stays applicable
    # (apply_packed requires T % 4 == 0); a +-2-sample window change is far
    # inside the sweep's noise floor (docs/PERFORMANCE.md)
    sub = max(4, (sub // 4) * 4)
    sub_ov = min(int(round(cfg.overlap_seconds * rate * f)),
                 sub // 4)
    if sub >= stage_len:
        return None
    return (sub, sub - sub_ov, sub_ov)


def apply_stereo(st, x, sub_cfg, packed: bool = False, q=None,
                 grouped: bool = False, lstm_impl: str = "auto"):
    """Stereo stage over [N, T2, 1] -> [N, T2, 2], optionally re-framed into
    shorter internal LSTM windows with crossfade overlap-add (sub_cfg from
    stereo_sub_cfg; None = whole-window). `packed` routes the encoder/
    decoder conv stages through the r-packed layout (stereo_separator
    .apply_packed — numerically equal up to float reassociation; requires
    the stage window length % 4 == 0, else falls back to plain). `q`: an
    ops/quant.py QuantCtx — int8 serving (or calibration) via the packed
    forward, which hosts the quantized conv stacks; the LSTM stays float.
    `grouped` upgrades the PLAIN fallback to the grouped dual decoder
    (stereo_separator.apply_grouped) — kept for ablation only: the
    plain-layout grouped decoder measured SLOWER than the two-stack decode
    in every production regime (full-window / sub-chunked / streaming), so
    no production caller passes it; grouping pays only inside apply_packed
    (docs/PERFORMANCE.md "Grouped dual decoders")."""
    stage_len = sub_cfg[0] if sub_cfg is not None else x.shape[1]
    # the Pallas recurrence pads batch to a multiple of 8: below 8 rows
    # (whole-file parity mode serves ONE chunk) the pad would multiply the
    # gates-buffer traffic up to 8x — gate on the effective LSTM batch
    if lstm_impl == "pallas":
        eff_batch = x.shape[0] * (num_chunks(x.shape[1], sub_cfg[0],
                                             sub_cfg[1])
                                  if sub_cfg is not None else 1)
        if eff_batch < 8:
            lstm_impl = "auto"
    if q is not None and stage_len % 4 == 0:
        run = lambda p, s, v: stereo_mod.apply_packed(p, s, v, q=q,
                                                      lstm_impl=lstm_impl)
    elif packed and stage_len % 4 == 0:
        run = lambda p, s, v: stereo_mod.apply_packed(p, s, v,
                                                      lstm_impl=lstm_impl)
    elif grouped:
        run = lambda p, s, v: stereo_mod.apply_grouped(p, s, v,
                                                       lstm_impl=lstm_impl)
    else:
        run = lambda p, s, v: stereo_mod.apply(p, s, v,
                                               lstm_impl=lstm_impl)[0]
    if sub_cfg is None:
        return run(st[0], st[1], x)
    sub, sub_hop, sub_ov = sub_cfg
    n, t2, c = x.shape
    m = num_chunks(t2, sub, sub_hop)
    total2 = (m - 1) * sub_hop + sub
    xp = jnp.pad(x, ((0, 0), (0, total2 - t2), (0, 0)))
    # [N, T2, C] -> [N, M, sub, C] -> [N*M, sub, C]
    frames = jax.vmap(
        lambda row: frame_structured(row.T, m, sub, sub_hop))(xp)
    y = run(st[0], st[1], frames.reshape(n * m, sub, c))
    y = y.reshape(n, m, sub, 2).transpose(0, 1, 3, 2)  # [N, M, 2, sub]
    out = jax.vmap(
        lambda ch: overlap_add(ch, sub_hop, t2, overlap=sub_ov))(y)
    return out.transpose(0, 2, 1)  # [N, T2, 2]


class RestorationPipeline:
    """Holds (params, state) per stage and jit-compiled chunk processors.

    Any stage may be None: the bench configs need denoise-only, SR-only and
    stereo-only paths as well as the full chain.
    """

    def __init__(self,
                 denoiser: Optional[Tuple] = None,
                 super_resolution: Optional[Tuple] = None,
                 stereo: Optional[Tuple] = None,
                 config: Optional[PipelineConfig] = None,
                 mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — the chunk
        batch is sharded across it (multi-chip serving scale-out; the
        reference is strictly single-device, inference.py:59-95)."""
        self.config = config or PipelineConfig()
        if self.config.lstm_impl not in (None, "scan", "pallas"):
            # 'pallas_train' is the TRAINING kernel: it materializes the
            # activation + cell sequences as residual outputs (~5x the
            # output HBM traffic) and must never serve inference; typos
            # would otherwise silently route the scan fallback
            raise ValueError(
                f"PipelineConfig.lstm_impl={self.config.lstm_impl!r}: "
                "serving accepts None (auto), 'scan' or 'pallas'")
        self.denoiser = denoiser
        self.super_resolution = super_resolution
        self.stereo = stereo
        self.mesh = mesh
        self._compiled = {}
        # int8 serving state: per-stage {point: scale} from calibrate_int8
        self._int8_scales = None
        self._int8_version = 0
        self._int8_failed = False  # gate failure: don't retry per recording

    # ---------------------------------------------------------------- setup
    @classmethod
    def from_checkpoints(cls, denoiser_path=None, super_res_path=None,
                         stereo_path=None, config=None):
        """Load stages from reference .pth or our native checkpoints
        (dispatch on extension)."""
        return cls(
            denoiser=load_stage(denoiser_path, "denoiser"),
            super_resolution=load_stage(super_res_path, "super_resolution"),
            stereo=load_stage(stereo_path, "stereo_separator"),
            config=config,
        )

    # ------------------------------------------------------------- compiled
    def _stages_key(self):
        return (self.denoiser is not None,
                self.super_resolution is not None
                and self.config.enable_super_resolution,
                self.stereo is not None)

    @property
    def upscale_factor(self) -> int:
        if not self._stages_key()[1]:
            return 1
        return 2 ** len(self.super_resolution[0]["upsample"])

    @property
    def out_channels(self) -> int:
        return 2 if self.stereo is not None else 1

    def _config_key(self):
        """Config fields that select a compiled program (shared by every
        processor cache key so a config/int8 change can't alias). Includes
        the mesh: processors close over it for sharding constraints, and
        the CLI assigns `pipe.mesh` after construction — a mesh change must
        not reuse a program compiled under different sharding."""
        return (self._stages_key(), self.mesh,
                self.config.compute_dtype, self.config.stereo_chunk_seconds,
                self.config.stereo_mid_exact, self.config.stereo_source_rate,
                self.config.packed_convs, self.config.lstm_impl,
                self.config.quantize_int8, self.config.int8_scope,
                self._int8_version)

    def _build_stage_stack(self, chunk_size: int,
                           sample_rate: Optional[int] = None):
        """The per-chunk model stack: fn(dn, sr, st, x[N, chunk, 1] f32) ->
        [N, C_out, chunk*f] f32. All routing decisions (packed / grouped /
        int8 / source-rate / mid-exact / stereo sub-chunking) live here so
        the single-recording processor and the coalesced multi-recording
        processor (`restore_many`) run the exact same computation.

        `sample_rate`: rate of the audio in the chunks (sizes the
        seconds-denominated stereo sub-window); defaults to
        config.sample_rate."""
        dtype = jnp.dtype(self.config.compute_dtype)
        has_dn, has_sr, has_st = self._stages_key()
        f = self.upscale_factor
        # packed (space-to-depth) serving: denoiser + SR run on the r-packed
        # layout with a direct packed handoff (denoiser r4 out -> SR r4 in);
        # stages with non-default shapes (or non-r-divisible chunk lengths,
        # e.g. whole-file parity mode) fall back to the plain path
        packed = (self.config.packed_convs and chunk_size % 4 == 0
                  and (not has_dn or _denoiser_packable(self.denoiser))
                  and (not has_sr or _sr_packable(self.super_resolution)))

        # source-rate stereo: the stereo stage consumes the pre-SR signal
        # (chunk_size samples at sample_rate, not chunk_size*f) and only its
        # side output is upsampled — config.stereo_source_rate docstring
        src_rate = self.config.stereo_source_rate and has_st
        st_len, st_f = ((chunk_size, 1) if src_rate
                        else (chunk_size * f, f))
        # optional finer chunking for the stereo stage (stereo_sub_cfg above)
        sub_cfg = (stereo_sub_cfg(self.config, st_len, st_f,
                                  sample_rate=sample_rate)
                   if has_st else None)
        # packed stereo pays at FULL windows only: at sub-chunked short
        # windows (large batch x short T) it measured ~3% slower than plain
        # (docs/PERFORMANCE.md). Gate on the EFFECTIVE sub_cfg — a
        # stereo_chunk_seconds >= the window length is a no-op and must not
        # change the computation path.
        packed_stereo = (self.config.packed_convs and has_st
                         and sub_cfg is None)
        # Grouped dual decoders pay ONLY inside the packed layout (the
        # apply_packed default: +13% device, 160.7 vs 184.7 ms ungrouped per
        # 120 s). The PLAIN-layout grouped fallback measured SLOWER in every
        # regime — sub-chunked fast_serve 118.1 vs 109.3 ms (-8%), streaming
        # feeds 40.0 vs 37.2 ms (-7%), full 2-s windows 70.2 vs 63.1 ms
        # stereo-only (-11%) — so it is never selected in production
        # (docs/PERFORMANCE.md "Grouped dual decoders").
        # int8 serving rides the packed forwards (they host the quantized
        # conv stacks), so it shares the packed gate; it additionally needs
        # calibrated scales (restore() auto-calibrates before compiling)
        int8 = (self.config.quantize_int8 and packed
                and self._int8_scales is not None)
        scales = self._int8_scales if int8 else {}
        scope = self.config.int8_scope
        # int8 stereo shares the packed-stereo gate (full windows only):
        # at sub-chunked windows the quantized stereo runs the packed
        # layout, which measured ~3% slower than plain there — enough to
        # cancel its quantization win (docs/PERFORMANCE.md "int8"), while
        # the denoiser/SR int8 win (~8 ms/120 s) is window-independent.
        int8_stereo = int8 and sub_cfg is None
        # LSTM recurrence impl: the fused Pallas kernel on TPU (round-4
        # serve A/B, scripts/profile_serve_lstm_ablate.py: wins every
        # serve regime, bit-identical in f32), the scan elsewhere (the
        # kernel is Mosaic/TPU-only). apply_stereo additionally falls
        # back to the scan below an effective batch of 8 (whole-file
        # mode) where the kernel's batch padding would inflate traffic.
        devs = (self.mesh.devices.flat if self.mesh is not None
                else jax.devices())
        lstm_impl = self.config.lstm_impl or (
            "pallas" if devs[0].platform == "tpu" else "auto")

        def cast(tree):
            if tree is None or dtype == jnp.float32:
                return tree
            return jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

        mesh = self.mesh

        def stack(dn, sr, st, chunks):
            # the model stack over a chunk batch [N, chunk, 1] -> per-chunk
            # outputs [N, C_out, chunk*f]; no framing/reassembly here
            dn, sr, st = cast(dn), cast(sr), cast(st)
            x = chunks.astype(dtype)  # [N, chunk, C]
            if mesh is not None:
                # shard the chunk batch over 'data' AND the time axis over
                # 'model' (sequence parallelism — XLA inserts the conv halo
                # exchanges, and gathers time before the LSTM scan). With
                # model=1 this is plain chunk sharding; with data=1 +
                # model=N it serves ONE very long chunk (whole_file mode)
                # across N chips. XLA all-gathers before the overlap-add.
                from jax.sharding import NamedSharding, PartitionSpec as P

                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("data", "model", None)))
            if int8:
                from ..ops.quant import QuantCtx
            if has_dn:
                if int8:
                    x = denoiser_mod.apply_packed(
                        dn[0], dn[1], x,
                        q=QuantCtx(scales["denoiser"], scope,
                                   skip=denoiser_mod.INT8_FLOAT_LAYERS))
                else:
                    x = (denoiser_mod.apply_packed(dn[0], dn[1], x) if packed
                         else denoiser_mod.apply(dn[0], dn[1], x)[0])

            def run_stereo(v):
                # int8 denoiser/SR exit in f32: hand the stereo stage its
                # expected dtype (f32 when quantizing, compute dtype when
                # running the plain/packed float path)
                return apply_stereo(
                    st, v.astype(jnp.float32 if int8_stereo else dtype)
                    if int8 else v, sub_cfg, packed=packed_stereo,
                    q=(QuantCtx(scales["stereo"], scope)
                       if int8_stereo else None),
                    lstm_impl=lstm_impl)

            side = None
            if has_st and src_rate:
                # source-rate stereo: predict the side from the denoised
                # pre-SR signal (half the LSTM steps); only the side is
                # upsampled below, the mid stays the exact SR output
                y = run_stereo(x)
                side = (y[..., 0:1] - y[..., 1:2]) * 0.5
            if has_sr:
                if int8:
                    x = sr_mod.apply_packed(
                        sr[0], sr[1], x, q=QuantCtx(scales["super_resolution"], scope))
                else:
                    x = (sr_mod.apply_packed(sr[0], sr[1], x) if packed
                         else sr_mod.apply(sr[0], sr[1], x)[0])
            if has_st:
                if src_rate:
                    if f > 1:
                        side = upsample_linear(side, f)
                    x = x + jnp.concatenate([side, -side],
                                            axis=-1).astype(x.dtype)
                else:
                    y = run_stereo(x)
                    if self.config.stereo_mid_exact:
                        # out = mid +/- predicted side: mono fidelity exact by
                        # construction, width carried entirely by the side
                        side = (y[..., 0:1] - y[..., 1:2]) * 0.5
                        y = jnp.concatenate([x + side, x - side], axis=-1)
                    x = y
            return x.astype(jnp.float32).transpose(0, 2, 1)  # [N,C_out,ch*f]

        return stack

    def _get_processor(self, n_chunks: int, chunk_size: int, hop: int,
                       overlap: int, sample_rate: Optional[int] = None):
        key = ("rec", n_chunks, chunk_size, hop,
               sample_rate) + self._config_key()
        if key in self._compiled:
            return self._compiled[key]
        f = self.upscale_factor
        stack = self._build_stage_stack(chunk_size, sample_rate)

        def process(dn, sr, st, audio_padded, valid):
            # frame -> stages -> overlap-add, all in ONE XLA program, with
            # reshape-based framing/reassembly (no gather/scatter HLOs).
            # `valid` = number of real (non-bucketing-padding) chunks; traced
            # so all chunk counts share one compiled program.
            chunks = frame_structured(audio_padded, n_chunks, chunk_size, hop)
            x = stack(dn, sr, st, chunks)
            total = (n_chunks - 1) * hop + chunk_size
            return overlap_add(x, hop * f, total * f, overlap=overlap * f,
                               valid=valid)

        jitted = jax.jit(process)
        self._compiled[key] = jitted
        return jitted

    def _get_chunk_processor(self, n_chunks: int, chunk_size: int,
                             sample_rate: Optional[int] = None):
        """The coalesced path's stage program: pre-framed chunk batch in,
        per-chunk outputs out (overlap-add happens per recording in
        `_get_oa`). Shares `_build_stage_stack` with `_get_processor`, so a
        coalesced restore runs the exact same per-chunk computation as a
        single-recording restore."""
        key = ("chunks", n_chunks, chunk_size,
               sample_rate) + self._config_key()
        if key in self._compiled:
            return self._compiled[key]
        stack = self._build_stage_stack(chunk_size, sample_rate)
        jitted = jax.jit(stack)
        self._compiled[key] = jitted
        return jitted

    def _get_oa(self, n_total: int, n_bucket: int, chunk_size: int,
                hop: int, overlap: int):
        """Per-recording reassembly for the coalesced path: slice this
        recording's (bucketed) chunk rows out of the combined stage output
        and overlap-add them. `offset`/`valid` are traced so every recording
        with the same bucketed chunk count shares one tiny program; rows
        beyond `valid` (bucket padding — possibly the NEXT recording's real
        chunks, since recordings are packed contiguously) get zero crossfade
        weight, which is what makes the packed layout exact."""
        key = ("oa", n_total, n_bucket, chunk_size, hop) + self._config_key()
        if key in self._compiled:
            return self._compiled[key]
        f = self.upscale_factor

        def reassemble(big, offset, valid):
            seg = jax.lax.dynamic_slice_in_dim(big, offset, n_bucket, axis=0)
            total = (n_bucket - 1) * hop + chunk_size
            return overlap_add(seg, hop * f, total * f, overlap=overlap * f,
                               valid=valid)

        jitted = jax.jit(reassemble)
        self._compiled[key] = jitted
        return jitted

    # ------------------------------------------------------- int8 serving
    def calibrate_int8(self, audio, sample_rate: Optional[int] = None,
                       max_chunks: int = 8):
        """Collect per-layer activation scales for int8 serving from one
        f32 pass over (up to max_chunks of) `audio`, framed exactly as
        restore() would frame it. Stored on the pipeline; restore() calls
        this automatically on the first recording when
        config.quantize_int8 is set (ops/quant.py for the scheme)."""
        from ..ops.quant import QuantCtx, scales_from_amax

        cfg = self.config
        sample_rate = sample_rate or cfg.sample_rate
        # Same gates as _build's `packed` (int8 rides the packed forwards):
        # raise ValueError so restore()'s auto-calibration downgrades to
        # float serving with a warning instead of crashing mid-trace or
        # silently burning a calibration pass that can never activate.
        if not cfg.packed_convs:
            raise ValueError("int8 serving rides the packed conv paths: "
                             "config.packed_convs is off")
        has_dn0, has_sr0, _ = self._stages_key()
        if has_dn0 and not _denoiser_packable(self.denoiser):
            raise ValueError("denoiser checkpoint is not packable "
                             "(non-default layout); int8 unavailable")
        if has_sr0 and not _sr_packable(self.super_resolution):
            raise ValueError("super-resolution checkpoint is not packable "
                             "(non-default layout); int8 unavailable")
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        if audio.shape[0] > 1:
            audio = np.mean(audio, axis=0, keepdims=True)
        t = audio.shape[1]
        chunk_size = int(round(cfg.chunk_seconds * sample_rate))
        if cfg.whole_file:
            chunk_size = t
        if chunk_size % 4 != 0:
            raise Int8LengthGateError(
                f"int8 serving rides the packed path: chunk length "
                f"{chunk_size} must be a multiple of 4")
        overlap = int(round(cfg.overlap_seconds * sample_rate))
        hop = chunk_size - overlap
        n = min(max(num_chunks(t, chunk_size, hop), 1), max_chunks)
        total = (n - 1) * hop + chunk_size
        audio_padded = np.pad(audio, ((0, 0), (0, max(total - t, 0))))

        has_dn, has_sr, has_st = self._stages_key()
        f = self.upscale_factor
        src_rate = cfg.stereo_source_rate and has_st
        st_len, st_f = ((chunk_size, 1) if src_rate else (chunk_size * f, f))
        sub_cfg = (stereo_sub_cfg(cfg, st_len, st_f,
                                  sample_rate=sample_rate)
                   if has_st else None)

        def calib(dn, sr, st, audio_padded):
            chunks = frame_structured(audio_padded, n, chunk_size, hop)
            amax = {}
            x = chunks
            if has_dn:
                ctx = QuantCtx()
                x = denoiser_mod.apply_packed(dn[0], dn[1], x, q=ctx)
                amax["denoiser"] = ctx.amax
            if has_st and src_rate:
                # source-rate mode: the stereo stage consumes the PRE-SR
                # signal — calibrate it on what it will actually see
                ctx = QuantCtx()
                apply_stereo(st, x, sub_cfg, q=ctx)
                amax["stereo"] = ctx.amax
            if has_sr:
                ctx = QuantCtx()
                x = sr_mod.apply_packed(sr[0], sr[1], x, q=ctx)
                amax["super_resolution"] = ctx.amax
            if has_st and not src_rate:
                ctx = QuantCtx()
                apply_stereo(st, x, sub_cfg, q=ctx)
                amax["stereo"] = ctx.amax
            return amax

        amax = jax.jit(calib)(self.denoiser, self.super_resolution,
                              self.stereo, audio_padded[:, :total])
        self._int8_scales = {
            stage: scales_from_amax({k: np.asarray(v, np.float32)
                                     for k, v in d.items()})
            for stage, d in amax.items()}
        self._int8_version += 1
        return self._int8_scales

    def save_int8_scales(self, path):
        """Persist calibration so later processes skip the f32 pass
        (ops/quant.py::save_scales_file — the one shared file format)."""
        from ..ops.quant import save_scales_file

        assert self._int8_scales is not None, "calibrate_int8 first"
        return save_scales_file(path, self._int8_scales)

    def load_int8_scales(self, path):
        from ..ops.quant import load_scales_file

        self._int8_scales = load_scales_file(path)
        self._int8_version += 1
        self._int8_failed = False  # new scales: give int8 another shot
        return self._int8_scales

    def _int8_discard_uncovered(self) -> bool:
        """Discard a loaded scales file that lacks an ENABLED stage — it
        would KeyError the step trace. Enabled per _stages_key (NOT raw
        `is not None`: an SR checkpoint loaded under
        enable_super_resolution=False never appears in the trace, so
        requiring its scales would discard+recalibrate on every restore).
        Returns True when the scales were discarded. Shared by restore(),
        restore_many() and warmup()."""
        if self._int8_scales is None:
            return False
        has_dn, has_sr, has_st = self._stages_key()
        need = [name for name, on in (("denoiser", has_dn),
                                      ("super_resolution", has_sr),
                                      ("stereo", has_st)) if on]
        missing = [k for k in need if k not in self._int8_scales]
        if not missing:
            return False
        import warnings

        warnings.warn(
            f"int8 scales lack stage(s) {missing} — calibrated "
            f"with those stages disabled? Recalibrating on the next "
            f"recording")
        self._int8_scales = None
        self._int8_version += 1
        return True

    def _ensure_int8(self, audio, sample_rate):
        """Pre-restore int8 readiness: discard a loaded scales file that
        lacks an enabled stage (it would KeyError the step trace), then
        auto-calibrate on this recording if scales are still missing.
        Shared by restore() and restore_many()."""
        cfg = self.config
        if not cfg.quantize_int8:
            return
        self._int8_discard_uncovered()
        if self._int8_scales is None and not self._int8_failed:
            # seed the static activation scales with one f32 pass over (a
            # slice of) this recording; later recordings reuse them
            try:
                self.calibrate_int8(np.asarray(audio), sample_rate)
            except ValueError as e:
                import warnings

                warnings.warn(f"int8 serving disabled: {e}")
                # config/checkpoint-shaped gate failures can never succeed —
                # don't re-run and re-warn on every restore_directory file.
                # Only whole_file's length gate is per-recording: a later
                # packing-grid-aligned recording may still calibrate.
                self._int8_failed = not (
                    cfg.whole_file and isinstance(e, Int8LengthGateError))

    # ------------------------------------------------------------- warmup
    def warmup(self, coalesce: int = 1,
               sample_rate: Optional[int] = None) -> dict:
        """Precompile every serving program before real traffic arrives.

        A cold pipeline compiles on demand, so the first request of each
        chunk-bucket shape pays the full XLA compile (tens of seconds to
        minutes on a TPU host) inside its own latency. Serving daemons call
        this at startup instead (`cli serve --warmup`): it drives zero audio
        through every bucketed chunk program from the bucketing granularity
        up to `config.max_chunks_per_program` — the top bucket is also the
        slab program, so arbitrarily long recordings are covered — and,
        with `coalesce` > 1, the combined-batch stage program plus the
        common short-request reassembly program used by dynamic batching
        (`restore_many`). Compilation happens at dispatch, synchronously,
        so when this returns the programs are resident; the zero-input
        executions themselves are discarded.

        Not enumerable (warns and returns 0 programs):
        - `whole_file` mode compiles one program per recording LENGTH;
        - `quantize_int8` with no scales loaded — the float programs
          compiled now would be invalidated by the first recording's
          auto-calibration (`_int8_version` keys every program); load a
          scales file or `calibrate_int8` on a representative recording
          first. (After a permanent gate failure float serving is the
          steady state, so that case warms normally.)

        Returns {"programs": newly compiled, "seconds": wall, "buckets":
        chunk-count buckets covered}.
        """
        import time as _time
        import warnings

        cfg = self.config
        t0 = _time.monotonic()
        if cfg.whole_file:
            warnings.warn("warmup is a no-op in whole_file mode: programs "
                          "are compiled per recording length")
            return {"programs": 0, "seconds": 0.0, "buckets": []}
        if cfg.quantize_int8:
            # same coverage gate as restore(): scales lacking an enabled
            # stage would KeyError the warmup traces (and the programs
            # would be recompiled after the first request's recalibration
            # anyway)
            self._int8_discard_uncovered()
            if self._int8_scales is None and not self._int8_failed:
                warnings.warn(
                    "warmup skipped: quantize_int8 is set but no scales "
                    "are loaded — programs compiled now would be "
                    "recompiled after first-recording calibration. "
                    "load_int8_scales() or calibrate_int8() on a "
                    "representative recording first")
                return {"programs": 0, "seconds": 0.0, "buckets": []}
        sample_rate = sample_rate or cfg.sample_rate
        chunk_size = int(round(cfg.chunk_seconds * sample_rate))
        overlap = int(round(cfg.overlap_seconds * sample_rate))
        hop = chunk_size - overlap
        gran = 4
        if self.mesh is not None:
            import math

            gran = math.lcm(4, self.mesh.shape["data"])
        max_n = max(cfg.max_chunks_per_program, 4)
        # every short-recording bucket, plus the slab program (s = max_n,
        # which restore() reuses for every recording longer than one slab)
        buckets = sorted({*range(gran, max_n + 1, gran), max_n})
        before = len(self._compiled)
        for n in buckets:
            total = (n - 1) * hop + chunk_size
            proc = self._get_processor(n, chunk_size, hop, overlap, sample_rate)
            proc(self.denoiser, self.super_resolution, self.stereo,
                 np.zeros((1, total), np.float32), np.int32(n))
            if coalesce > 1:
                # dynamic batching: the combined chunk-stage program and
                # the short-request (granularity-bucket) reassembly program.
                # Rarer (n_total, n_bucket) mixes still compile on demand —
                # the reassembly programs are tiny next to the stage stack.
                procc = self._get_chunk_processor(n, chunk_size, sample_rate)
                big = procc(self.denoiser, self.super_resolution,
                            self.stereo,
                            np.zeros((n, chunk_size, 1), np.float32))
                nb = min(gran, n)
                oa = self._get_oa(n, nb, chunk_size, hop, overlap)
                oa(big, np.int32(0), np.int32(1))
        return {"programs": len(self._compiled) - before,
                "seconds": _time.monotonic() - t0, "buckets": buckets}

    # ---------------------------------------------------------------- run
    def restore(self, audio, sample_rate: Optional[int] = None):
        """audio: [C, T] (mono mixed down if C>1) -> ([out_ch, T*f], out_rate).

        Mirrors the reference restore_audio body after loading: the input is
        assumed normalized by the caller (restore_file normalizes).
        """
        cfg = self.config
        sample_rate = sample_rate or cfg.sample_rate
        # host-side prep: every eager device op costs a dispatch round trip,
        # so mixdown/padding stay numpy and the jit call gets one H2D array
        on_host = not isinstance(audio, jax.Array)
        xp = np if on_host else jnp
        audio = xp.asarray(audio, xp.float32)
        if audio.ndim == 1:
            audio = audio[None]
        if audio.shape[0] > 1:
            audio = xp.mean(audio, axis=0, keepdims=True)

        t = audio.shape[1]
        f = self.upscale_factor
        self._ensure_int8(audio, sample_rate)
        if cfg.whole_file:
            chunk_size, hop, overlap = t, t, 0
            n = n_real = 1
        else:
            chunk_size = int(round(cfg.chunk_seconds * sample_rate))
            overlap = int(round(cfg.overlap_seconds * sample_rate))
            hop = chunk_size - overlap
            gran = 4
            if self.mesh is not None:
                import math

                gran = math.lcm(4, self.mesh.shape["data"])
            n_real = num_chunks(t, chunk_size, hop)
            n = _bucket(n_real, gran)

        max_n = max(cfg.max_chunks_per_program, 4)
        if cfg.whole_file or n <= max_n:
            total = (n - 1) * hop + chunk_size
            audio_padded = xp.pad(audio, ((0, 0), (0, total - t)))
            proc = self._get_processor(n, chunk_size, hop, overlap, sample_rate)
            out = proc(self.denoiser, self.super_resolution, self.stereo,
                       audio_padded, np.int32(n_real))  # [out_ch, total*f]
            return out[:, :t * f], sample_rate * f

        # Long recording: process fixed-size slabs of chunks with ONE reused
        # compiled program (bounded HBM), then crossfade slab outputs.
        # Adjacent slabs share exactly `overlap` input samples, so the
        # trapezoid slab crossfade reproduces the single-shot chunk-level
        # overlap-add exactly. Slab count comes from the REAL chunk count so
        # every slab holds at least one real chunk; per-slab `valid` masks
        # the bucketing padding in the final slab.
        s = max_n
        num_slabs = -(-n_real // s)
        n = num_slabs * s
        slab_len = (s - 1) * hop + chunk_size
        needed = (num_slabs - 1) * s * hop + slab_len
        audio_padded = xp.pad(audio, ((0, 0), (0, needed - t)))
        proc = self._get_processor(s, chunk_size, hop, overlap, sample_rate)
        outs = []
        for i in range(num_slabs):
            start = i * s * hop
            if on_host:
                seg = audio_padded[:, start:start + slab_len]
            else:
                seg = jax.lax.dynamic_slice_in_dim(
                    audio_padded, start, slab_len, axis=1)
            valid_i = np.int32(min(max(n_real - i * s, 0), s))
            outs.append(proc(self.denoiser, self.super_resolution,
                             self.stereo, seg, valid_i))
        stacked = jnp.stack(outs)  # [num_slabs, out_ch, slab_len*f]
        out = overlap_add(stacked, s * hop * f, needed * f,
                          overlap=overlap * f)
        return out[:, :t * f], sample_rate * f

    def restore_many(self, audios, sample_rate: Optional[int] = None):
        """Coalesced multi-recording restore — the serving daemon's dynamic
        batching. The recordings' chunk frames are packed contiguously into
        ONE combined chunk batch, the model stack runs over it as a single
        XLA program, and each recording is reassembled by a tiny per-
        recording overlap-add program. Returns [(out [C,T_i*f], rate)] in
        input order, each exactly equal to `restore(audios[i])`:

        - the stage stack is literally the same traced function
          (`_build_stage_stack`) in both paths, and per-chunk work is batch-
          independent (convs/LSTM never reduce over the batch axis);
        - bucket-padding rows (including a neighbor recording's chunks that
          a bucketed slice may overhang into) get zero crossfade weight in
          the overlap-add (`overlap_add(valid=...)`).

        Why it pays: a short request's chunk count buckets up to the
        granularity (a 10 s file = 5 chunks pads to 8 — 37% wasted rows) and
        every request pays a program dispatch. Coalescing K short requests
        amortizes both — one near-full program instead of K padded ones.
        The reference has no batch serving at all (per-invocation CLI,
        inference.py:111-143). Groups are capped at
        config.max_chunks_per_program chunks (the slab bound); recordings
        too long to coalesce take the single-recording slab path.
        """
        cfg = self.config
        audios = list(audios)
        if not audios:
            return []
        sample_rate = sample_rate or cfg.sample_rate
        if cfg.whole_file or len(audios) == 1:
            # whole_file compiles one program PER LENGTH — nothing to share
            return [self.restore(a, sample_rate) for a in audios]

        f = self.upscale_factor
        chunk_size = int(round(cfg.chunk_seconds * sample_rate))
        overlap = int(round(cfg.overlap_seconds * sample_rate))
        hop = chunk_size - overlap
        gran = 4
        if self.mesh is not None:
            import math

            gran = math.lcm(4, self.mesh.shape["data"])

        # host prep: mono mixdown in numpy (eager device ops cost a
        # dispatch round trip each; the combined batch is ONE H2D)
        prepped = []
        for a in audios:
            x = np.asarray(a, np.float32)
            if x.ndim == 1:
                x = x[None]
            if x.shape[0] > 1:
                x = x.mean(axis=0, keepdims=True)
            prepped.append(x)
        self._ensure_int8(prepped[0], sample_rate)

        max_n = max(cfg.max_chunks_per_program, 4)
        metas = []  # (n_real, n_bucket) per recording
        solo = set()  # too long to coalesce -> single-recording slab path
        # cur_cover tracks max(offset_i + n_bucket_i): the combined batch
        # must cover every member's BUCKETED slice (see n_total below), so
        # the grouping cap must be applied to the bucketed coverage, not
        # the raw chunk sum — otherwise a group like [61, 2] at max_n=64
        # yields n_total=68 > max_chunks_per_program, busting the HBM slab
        # cap and compiling a chunk program warmup() never covered
        groups, cur, cur_n, cur_cover = [], [], 0, 0
        for i, x in enumerate(prepped):
            n_real = num_chunks(x.shape[1], chunk_size, hop)
            metas.append((n_real, _bucket(n_real, gran)))
            if metas[i][1] > max_n:
                solo.add(i)
                continue
            cover = max(cur_cover, cur_n + metas[i][1])
            if cur and _bucket(max(cur_n + n_real, cover), gran) > max_n:
                groups.append(cur)
                cur, cur_n = [], 0
                cover = metas[i][1]
            cur.append(i)
            cur_n += n_real
            cur_cover = cover
        if cur:
            groups.append(cur)

        results: list = [None] * len(audios)
        for i in solo:
            results[i] = self.restore(prepped[i], sample_rate)
        for grp in groups:
            if len(grp) == 1:
                i = grp[0]
                results[i] = self.restore(prepped[i], sample_rate)
                continue
            offs, rows = [], 0
            for i in grp:
                offs.append(rows)
                rows += metas[i][0]
            # the combined batch must cover every recording's bucketed
            # slice (dynamic_slice clamps the start when offset+size
            # overruns, which would MISALIGN the frames — pad instead)
            n_total = _bucket(
                max(rows, max(o + metas[i][1] for o, i in zip(offs, grp))),
                gran)
            xall = np.zeros((n_total, chunk_size, 1), np.float32)
            for o, i in zip(offs, grp):
                x = prepped[i][0]
                n_real = metas[i][0]
                total = (n_real - 1) * hop + chunk_size
                xp = np.pad(x, (0, max(total - x.shape[0], 0)))
                # reshape-free host framing: strided view over the padded
                # signal; the slice assignment below makes the one copy
                frames = np.lib.stride_tricks.sliding_window_view(
                    xp, chunk_size)[::hop]
                xall[o:o + n_real, :, 0] = frames[:n_real]
            proc = self._get_chunk_processor(n_total, chunk_size, sample_rate)
            big = proc(self.denoiser, self.super_resolution, self.stereo,
                       xall)  # [n_total, C_out, chunk*f], async
            for o, i in zip(offs, grp):
                n_real, b = metas[i]
                oa = self._get_oa(n_total, b, chunk_size, hop, overlap)
                out = oa(big, np.int32(o), np.int32(n_real))
                t = prepped[i].shape[1]
                results[i] = (out[:, :t * f], sample_rate * f)
        return results

    def restore_file(self, input_path, output_path,
                     sample_rate: Optional[int] = None,
                     normalize: bool = True):
        """Full file-to-file restore (reference inference.py:17-108)."""
        cfg = self.config
        sr_in = sample_rate or cfg.sample_rate
        audio, _ = load_audio(input_path, sample_rate=sr_in, mono=True)
        if normalize:
            audio = np.asarray(normalize_audio(audio))
        restored, out_rate = self.restore(audio, sr_in)
        # transfer once, then normalize on host (eager device ops are
        # round-trip-expensive; the D2H is needed for the file write anyway)
        restored = normalize_audio(np.asarray(restored))
        save_audio(output_path, restored, out_rate)
        return output_path, out_rate

    def restore_directory(self, input_dir, output_dir,
                          sample_rate: Optional[int] = None,
                          suffix: str = "_restored",
                          normalize: bool = True,
                          coalesce: int = 4):
        """Batch-restore every audio file in a directory through ONE pipeline
        instance: chunk-count bucketing + slab processing mean all files
        share a handful of compiled programs, so throughput approaches the
        steady-state device rate (the reference CLI reloads and recompiles
        per invocation).

        The host work is pipelined around the device (VERDICT r02 item 8):
        group i+1 is decoded+normalized on a background thread and group
        i-1's outputs are transferred/written WHILE the device runs group
        i's program (jax dispatch is async, so restore/restore_many return
        before the device finishes). Per-file results are identical to
        restore_file.

        `coalesce`: files per device batch — consecutive files are served
        through ONE combined chunk program (`restore_many`, measured 3.17×
        device-side on 10 s files, docs/PERFORMANCE.md "Coalesced
        short-request serving"); recordings too long to coalesce take the
        slab path automatically. `coalesce=1` keeps the one-program-per-file
        legacy behavior."""
        from concurrent.futures import ThreadPoolExecutor
        from pathlib import Path

        from ..audio import find_audio_files

        cfg = self.config
        sr_in = sample_rate or cfg.sample_rate
        out_dir = Path(output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        files = find_audio_files(input_dir, recursive=False)
        if not files:
            return []
        step = max(1, int(coalesce))
        groups = [files[i:i + step] for i in range(0, len(files), step)]

        def load(fs):
            out = []
            for f in fs:
                audio, _ = load_audio(f, sample_rate=sr_in, mono=True)
                if normalize:
                    audio = np.asarray(normalize_audio(audio))
                out.append(audio)
            return out

        def write(path, restored, rate):
            # D2H + host normalize + encode — off the device critical path.
            # Output peak-normalization is unconditional, exactly like
            # restore_file (the `normalize` flag gates INPUT normalization
            # only), keeping the per-file-identical contract honest.
            save_audio(path, normalize_audio(np.asarray(restored)), rate)

        results = []
        pending: list = []  # [(path, device array, rate)] awaiting write
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(load, groups[0])
            try:
                for gi, grp in enumerate(groups):
                    audios = fut.result()
                    if gi + 1 < len(groups):
                        fut = ex.submit(load, groups[gi + 1])
                    if len(audios) == 1:
                        outs = [self.restore(audios[0], sr_in)]  # async
                    else:
                        outs = self.restore_many(audios, sr_in)  # async
                    while pending:
                        # pop BEFORE writing: if this write raises, the
                        # finally must not retry the same failed write (the
                        # retry's error would mask the original)
                        todo = pending.pop(0)
                        write(*todo)
                        results.append((todo[0], todo[2]))
                    pending = [
                        (out_dir / f"{f.stem}{suffix}.wav", o, r)
                        for f, (o, r) in zip(grp, outs)]
            finally:
                # a failure on group i must not lose group i-1's computed
                # outputs (sequential restore_file would have written them)
                while pending:
                    todo = pending.pop(0)
                    write(*todo)
                    results.append((todo[0], todo[2]))
        return results


def restore_audio(input_path, output_path, *,
                  denoiser_checkpoint="models/checkpoints/best_model.pth",
                  super_res_checkpoint="models/checkpoints/super_resolution/best_model.pth",
                  stereo_checkpoint="models/checkpoints/stereo/best_model.pth",
                  sample_rate: int = 22050,
                  enable_super_resolution: bool = True,
                  whole_file: bool = False,
                  chunk_seconds: float = 2.0,
                  overlap_seconds: float = 0.05):
    """Functional entry point mirroring the reference CLI surface
    (inference.py:111-143)."""
    config = PipelineConfig(
        sample_rate=sample_rate,
        chunk_seconds=chunk_seconds,
        overlap_seconds=overlap_seconds,
        enable_super_resolution=enable_super_resolution,
        whole_file=whole_file,
    )
    pipe = RestorationPipeline.from_checkpoints(
        denoiser_path=denoiser_checkpoint,
        super_res_path=super_res_checkpoint if enable_super_resolution else None,
        stereo_path=stereo_checkpoint,
        config=config,
    )
    return pipe.restore_file(input_path, output_path)
