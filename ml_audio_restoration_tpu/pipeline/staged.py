"""Pipeline-parallel (staged) serving: one model stage per device.

SURVEY.md §2.7 row 3: the reference's three-model chain is strictly
sequential on one GPU (/root/reference/src/inference.py:59-95). The default
TPU-native scale-out in this framework is DATA parallelism — chunks are
embarrassingly parallel, so `RestorationPipeline(mesh=...)` shards the chunk
batch and that is almost always the right tool. Staging the models across
devices (denoiser -> dev0, super-res -> dev1, stereo -> dev2) only pays in
the regime where the chunk batch is too small to shard — e.g. low-latency
serving of short clips arriving one at a time — because it keeps per-stage
batch intact while overlapping stage k of slab i with stage k-1 of slab i+1.

Implementation: each stage is its own jitted program whose parameters are
committed to its device; slab activations hop devices with `jax.device_put`
(ICI transfers on a real pod). JAX's async dispatch provides the overlap —
when slab i+1's denoise is enqueued on dev0, dev1 can still be running slab
i's super-res; no scheduler thread is needed.

Output contract: bit-identical to `RestorationPipeline.restore` for the
same config (the framing/overlap-add math is shared; tests assert equality).

Measured result (docs/PERFORMANCE.md "Pipeline-parallel serving"): for
batch/throughput serving, data-parallel chunk sharding dominates — staged
mode is kept for the small-batch latency niche and as the §2.7 capability.
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
from .restore import (
    apply_stereo,
    stereo_sub_cfg,
    _bucket,
    _denoiser_packable,
    _sr_packable,
)


class StagedRestorationPipeline:
    """denoise | super-res | stereo staged across three devices."""

    def __init__(self,
                 denoiser: Optional[Tuple] = None,
                 super_resolution: Optional[Tuple] = None,
                 stereo: Optional[Tuple] = None,
                 config: Optional[PipelineConfig] = None,
                 devices=None):
        self.config = config or PipelineConfig()
        # staged serving is a linear per-device chain: config fields that
        # fork the dataflow (source-rate stereo consumes the PRE-SR signal)
        # or need calibration state (int8) are rejected rather than
        # silently ignored — use RestorationPipeline for those modes
        for field in ("stereo_source_rate", "quantize_int8"):
            if getattr(self.config, field):
                raise ValueError(
                    f"StagedRestorationPipeline does not support "
                    f"config.{field}; use RestorationPipeline")
        devices = list(devices if devices is not None else jax.devices())
        stages = [s for s in
                  (("denoiser", denoiser),
                   ("super_resolution",
                    super_resolution if self.config.enable_super_resolution
                    else None),
                   ("stereo", stereo)) if s[1] is not None]
        if not stages:
            raise ValueError("no stages")
        # one device per stage, reusing devices round-robin if fewer exist
        self.placement = {}
        self.stage_params = {}
        for i, (name, tree) in enumerate(stages):
            dev = devices[i % len(devices)]
            self.placement[name] = dev
            self.stage_params[name] = jax.device_put(tree, dev)
        self._order = [name for name, _ in stages]
        self._compiled = {}

    @property
    def upscale_factor(self) -> int:
        if "super_resolution" not in self.stage_params:
            return 1
        return 2 ** len(self.stage_params["super_resolution"][0]["upsample"])

    @property
    def out_channels(self) -> int:
        return 2 if "stereo" in self.stage_params else 1

    def _stage_fn(self, name, sample_rate=None):
        mid_exact = name == "stereo" and self.config.stereo_mid_exact
        # every config field the trace closes over must key the cache:
        # overlap_seconds/sample_rate feed stereo_sub_cfg's sub-window plan
        key = ("stage", name, mid_exact, self.config.compute_dtype,
               self.config.stereo_chunk_seconds, self.config.packed_convs,
               self.config.overlap_seconds, self.config.sample_rate,
               sample_rate)
        if key not in self._compiled:
            mod = {"denoiser": denoiser_mod, "super_resolution": sr_mod,
                   "stereo": stereo_mod}[name]
            dtype = jnp.dtype(self.config.compute_dtype)
            cfg, f = self.config, self.upscale_factor

            def cast(tree):
                if dtype == jnp.float32:
                    return tree
                return jax.tree_util.tree_map(
                    lambda a: a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

            def run(tree, x):
                # cast params/inputs to the serving compute dtype and the
                # output back to f32, exactly like the plain pipeline's
                # process(); bf16->f32->bf16 at stage seams is the identity
                # and pack/unpack are pure reshapes, so staged output stays
                # bit-identical to the fused path, packed paths included
                tree = cast(tree)
                x = x.astype(dtype)
                t = x.shape[1]
                # joint packability, matching the plain pipeline's condition
                # exactly so the bit-identical contract holds even in
                # fallback corners (one stage packable, the other not)
                sp = self.stage_params
                pk = (cfg.packed_convs and t % 4 == 0
                      and ("denoiser" not in sp
                           or _denoiser_packable(sp["denoiser"]))
                      and ("super_resolution" not in sp
                           or _sr_packable(sp["super_resolution"])))
                if name == "stereo":
                    # packed stereo only at (effective) full windows,
                    # matching the plain pipeline's measured gate; the
                    # PLAIN fallback (sub-chunked or off-grid windows)
                    # stays the two-stack decode like restore.py's — the
                    # plain-layout grouped decoder measured slower
                    # everywhere (docs/PERFORMANCE.md) and would break
                    # the bit-identical-to-plain contract
                    sub = stereo_sub_cfg(cfg, t, f,
                                         sample_rate=sample_rate)
                    # same recurrence routing as the plain pipeline
                    # (Pallas on TPU — bit-identical in f32, so the
                    # staged == single-device contract holds)
                    impl = cfg.lstm_impl or (
                        "pallas"
                        if self.placement["stereo"].platform == "tpu"
                        else "auto")
                    y = apply_stereo(tree, x, sub,
                                     packed=cfg.packed_convs and sub is None,
                                     lstm_impl=impl)
                elif pk and name in ("denoiser", "super_resolution"):
                    y = mod.apply_packed(tree[0], tree[1], x)
                else:
                    y = mod.apply(tree[0], tree[1], x)[0]
                return x, y

            if mid_exact:
                def fn(tree, x):
                    x, y = run(tree, x)
                    side = (y[..., 0:1] - y[..., 1:2]) * 0.5
                    out = jnp.concatenate([x + side, x - side], axis=-1)
                    return out.astype(jnp.float32)
            else:
                def fn(tree, x):
                    return run(tree, x)[1].astype(jnp.float32)
            self._compiled[key] = jax.jit(fn)
        return self._compiled[key]

    def _frame_fn(self, n, chunk, hop):
        key = ("frame", n, chunk, hop)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                lambda a: frame_structured(a, n, chunk, hop))
        return self._compiled[key]

    def _oa_fn(self, hop_f, total_f, ov_f):
        key = ("oa", hop_f, total_f, ov_f)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                lambda x, valid: overlap_add(
                    jnp.transpose(x, (0, 2, 1)), hop_f, total_f,
                    overlap=ov_f, valid=valid))
        return self._compiled[key]

    def restore(self, audio, sample_rate: Optional[int] = None):
        """audio: [C, T] -> ([out_ch, T*f], out_rate). Slabs of chunks flow
        through the device stages; async dispatch overlaps the stages."""
        cfg = self.config
        sample_rate = sample_rate or cfg.sample_rate
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        if audio.shape[0] > 1:
            audio = audio.mean(axis=0, keepdims=True)

        t = audio.shape[1]
        f = self.upscale_factor
        chunk = int(round(cfg.chunk_seconds * sample_rate))
        ov = int(round(cfg.overlap_seconds * sample_rate))
        hop = chunk - ov
        n_real = num_chunks(t, chunk, hop)
        # bucket the slab size like the plain pipeline (restore.py _bucket):
        # staged mode's niche is short clips arriving one at a time, where
        # an exact per-length s would recompile every stage program for
        # every distinct clip length; `valid_i` below already masks the
        # bucket-padding chunks out of the crossfade
        s = min(max(cfg.max_chunks_per_program, 4),
                _bucket(max(n_real, 4), 4))
        num_slabs = -(-n_real // s)
        slab_len = (s - 1) * hop + chunk
        needed = (num_slabs - 1) * s * hop + slab_len
        padded = np.pad(audio, ((0, 0), (0, needed - t)))

        first_dev = self.placement[self._order[0]]
        last_dev = self.placement[self._order[-1]]
        frame = self._frame_fn(s, chunk, hop)
        oa = self._oa_fn(hop * f, ((s - 1) * hop + chunk) * f, ov * f)

        slab_outs = []
        for i in range(num_slabs):
            seg = padded[:, i * s * hop:i * s * hop + slab_len]
            x = jax.device_put(jnp.asarray(seg), first_dev)
            x = frame(x)  # [s, chunk, 1] on first device
            for name in self._order:
                dev = self.placement[name]
                x = jax.device_put(x, dev)  # ICI hop (no-op if same device)
                x = self._stage_fn(name, sample_rate)(
                    self.stage_params[name], x)
            valid_i = np.int32(min(max(n_real - i * s, 0), s))
            # per-slab overlap-add on the last stage's device
            slab_outs.append(oa(x, jax.device_put(valid_i, last_dev)))

        if num_slabs == 1:
            out = slab_outs[0]
        else:
            stacked = jnp.stack(slab_outs)  # [num_slabs, C_out, slab*f]
            out = overlap_add(stacked, s * hop * f, needed * f,
                              overlap=ov * f)
        return out[:, :t * f], sample_rate * f
