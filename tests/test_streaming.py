"""Streaming restorer: block-fed output must match the single-shot forward
(exact LSTM state continuity; conv context recomputation)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import has_reference
from ml_audio_restoration_tpu.models import (
    denoiser as dn_mod, super_resolution as sr_mod,
    stereo_separator as st_mod)
from ml_audio_restoration_tpu.pipeline.streaming import StreamingRestorer

SR = 22050


@pytest.fixture(scope="module")
def stages():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "denoiser": dn_mod.init(k1),
        "super_resolution": sr_mod.init(k2),
        "stereo": st_mod.init(k3),
    }


@pytest.fixture
def audio(rng):
    t = np.arange(3 * SR) / SR
    sig = (0.3 * np.sin(2 * np.pi * 330 * t)
           + 0.1 * np.sin(2 * np.pi * 1234 * t)
           + 0.02 * rng.normal(size=t.shape))
    return sig.astype(np.float32)[None]


def _single_shot(stages, audio, with_sr=True, with_stereo=True):
    x = jnp.asarray(audio.T[None])
    dn = stages["denoiser"]
    x, _ = dn_mod.apply(dn[0], dn[1], x)
    if with_sr:
        sr = stages["super_resolution"]
        x, _ = sr_mod.apply(sr[0], sr[1], x)
    if with_stereo:
        st = stages["stereo"]
        x, _ = st_mod.apply(st[0], st[1], x)
    return np.asarray(x)[0].T  # [ch, T*f]


def test_streaming_denoiser_matches_single_shot(stages, audio):
    want = _single_shot(stages, audio, with_sr=False, with_stereo=False)
    s = StreamingRestorer(denoiser=stages["denoiser"])
    outs = [s.feed(b) for b in np.array_split(audio, 6, axis=1)]
    outs.append(s.flush())
    got = np.concatenate(outs, axis=1)
    assert got.shape == want.shape
    # exact between the stream edges (start/end differ by input-level vs
    # layer-level zero padding within one receptive field)
    assert np.max(np.abs(got[:, 2000:-600] - want[:, 2000:-600])) < 1e-5


def test_streaming_full_chain_matches_single_shot(stages, audio):
    want = _single_shot(stages, audio)
    s = StreamingRestorer(**stages)
    outs = [s.feed(b) for b in np.array_split(audio, 4, axis=1)]
    outs.append(s.flush())
    got = np.concatenate(outs, axis=1)
    assert got.shape == want.shape  # [2, T*2]
    # LSTM state is carried exactly; early-edge conv differences decay
    # through the forgetting gates
    dev = np.max(np.abs(got[:, 8000:-1200] - want[:, 8000:-1200]))
    assert dev < 1e-3, dev


def test_streaming_mid_exact_preserves_mono(stages, audio):
    """mid_exact streaming: the output's mean must equal the mono signal
    entering the stereo stage (denoise+SR output) in the interior, and the
    side signal must match the raw-mode restorer's."""
    mono = _single_shot(stages, audio, with_stereo=False)  # [1, T*2]

    def run(**kw):
        s = StreamingRestorer(**stages, **kw)
        outs = [s.feed(b) for b in np.array_split(audio, 4, axis=1)]
        outs.append(s.flush())
        return np.concatenate(outs, axis=1)

    got = run(mid_exact=True)
    mid = got.mean(axis=0)
    dev = np.max(np.abs(mid[8000:-1200] - mono[0, 8000:-1200]))
    assert dev < 1e-3, dev
    raw = run()
    np.testing.assert_allclose((got[0] - got[1]) / 2, (raw[0] - raw[1]) / 2,
                               atol=1e-5)


def test_streaming_source_rate_matches_single_shot(stages, audio):
    """source_rate streaming (stereo side predicted at the pre-SR rate,
    half the LSTM steps per block) must match the single-shot source-rate
    forward: mid exact, side = upsampled source-rate side."""
    from ml_audio_restoration_tpu.ops.interp import upsample_linear

    x = jnp.asarray(audio.T[None])
    dn = stages["denoiser"]
    x22, _ = dn_mod.apply(dn[0], dn[1], x)
    sr = stages["super_resolution"]
    mid, _ = sr_mod.apply(sr[0], sr[1], x22)
    st = stages["stereo"]
    y22, _ = st_mod.apply(st[0], st[1], x22)
    side = upsample_linear((y22[..., 0:1] - y22[..., 1:2]) * 0.5, 2)
    want = np.asarray(jnp.concatenate([mid + side, mid - side], -1))[0].T

    s = StreamingRestorer(**stages, source_rate=True)
    outs = [s.feed(b) for b in np.array_split(audio, 4, axis=1)]
    outs.append(s.flush())
    got = np.concatenate(outs, axis=1)
    assert got.shape == want.shape  # [2, T*2]
    dev = np.max(np.abs(got[:, 8000:-1200] - want[:, 8000:-1200]))
    assert dev < 1e-3, dev
    # the mid is the exact SR output in the interior
    mono = np.asarray(mid)[0, :, 0]
    dev_mid = np.max(np.abs(got.mean(axis=0)[8000:-1200]
                            - mono[8000:-1200]))
    assert dev_mid < 1e-3, dev_mid


def test_streaming_irregular_blocks(stages, audio):
    """Arbitrary block sizes emit the same total output."""
    s = StreamingRestorer(**stages)
    cuts = [0, 1111, 5000, 12345, 30000, audio.shape[1]]
    outs = [s.feed(audio[:, a:b]) for a, b in zip(cuts[:-1], cuts[1:])]
    outs.append(s.flush())
    got = np.concatenate(outs, axis=1)
    assert got.shape == (2, audio.shape[1] * 2)
    assert np.isfinite(got).all()


def test_streaming_latency_is_lookahead(stages):
    """Output becomes available once `lookahead` future samples exist."""
    s = StreamingRestorer(denoiser=stages["denoiser"], lookahead=512)
    first = s.feed(np.zeros((1, 512), np.float32))
    assert first.shape[1] == 0  # exactly at the lookahead boundary
    second = s.feed(np.zeros((1, 104), np.float32))
    assert second.shape[1] == 104  # multiple of the pooling alignment


def test_batched_streams_match_independent_single_streams(stages, rng):
    """B concurrent streams through one compiled step (batch=B) must
    bit-match B independent single-stream restorers fed the same samples."""
    B, n_blocks, block = 3, 5, 2000
    streams = np.stack([
        (0.3 * np.sin(2 * np.pi * (200 + 150 * b)
                      * np.arange(n_blocks * block) / SR)
         + 0.02 * rng.normal(size=n_blocks * block)).astype(np.float32)
        for b in range(B)])

    batched = StreamingRestorer(**stages, batch=B)
    outs = [batched.feed(streams[:, i * block:(i + 1) * block])
            for i in range(n_blocks)]
    outs.append(batched.flush())
    got = np.concatenate(outs, axis=2)  # [B, 2, T*2]
    assert got.shape == (B, 2, n_blocks * block * 2)

    for b in range(B):
        single = StreamingRestorer(**stages)
        souts = [single.feed(streams[b, i * block:(i + 1) * block])
                 for i in range(n_blocks)]
        souts.append(single.flush())
        want = np.concatenate(souts, axis=1)  # [2, T*2]
        assert np.max(np.abs(got[b] - want)) < 1e-6, b


def test_reset_stream_recycles_one_slot(stages, rng):
    """Resetting slot i mid-serving recycles it for a new stream on the
    batch clock: its post-reset output bit-matches a fresh single-stream
    restorer fed the zero-gap (unemitted region zeroed by the reset) plus
    the new stream's samples; the other slot is completely undisturbed."""
    B, block = 2, 2000
    pre = rng.normal(size=(B, 3 * block)).astype(np.float32) * 0.1
    post = rng.normal(size=(B, 4 * block)).astype(np.float32) * 0.1

    batched = StreamingRestorer(**stages, batch=B)
    pre_outs = [batched.feed(pre[:, i * block:(i + 1) * block])
                for i in range(3)]
    emitted_pre = sum(o.shape[2] for o in pre_outs) // 2  # input samples
    batched.reset_stream(1)
    post_outs = [batched.feed(post[:, i * block:(i + 1) * block])
                 for i in range(4)]
    post_outs.append(batched.flush())
    got_post = np.concatenate(post_outs, axis=2)  # [B, 2, *]

    # slot 1 == fresh stream fed the zero gap + its new samples
    gap = 3 * block - emitted_pre
    fresh = StreamingRestorer(**stages)
    fouts = [fresh.feed(np.zeros((1, gap), np.float32))]
    fouts += [fresh.feed(post[1, i * block:(i + 1) * block])
              for i in range(4)]
    fouts.append(fresh.flush())
    want1 = np.concatenate(fouts, axis=1)
    assert want1.shape[1] == got_post.shape[2]
    assert np.max(np.abs(got_post[1] - want1)) < 1e-6

    # slot 0 == uninterrupted stream fed pre+post
    cont = StreamingRestorer(**stages)
    full0 = np.concatenate([pre[0], post[0]])
    couts = [cont.feed(full0[i * block:(i + 1) * block]) for i in range(7)]
    couts.append(cont.flush())
    want0 = np.concatenate(couts, axis=1)
    got0 = np.concatenate([np.concatenate(pre_outs, axis=2)[0], got_post[0]],
                          axis=1)
    assert got0.shape == want0.shape
    assert np.max(np.abs(got0 - want0)) < 1e-6


def test_streaming_never_uses_grouped_decoder(stages, audio, monkeypatch):
    """The streaming step must use the legacy two-stack stereo decode under
    BOTH packed settings: the plain-layout grouped decoder measured slower
    per feed (scripts/profile_streaming_ablate.py: 40.0 vs 37.2 ms device,
    batch 16), so it was ungated from the streaming path entirely."""
    def boom(*a, **k):
        raise AssertionError("grouped decoder used")

    monkeypatch.setattr(st_mod, "decode_grouped", boom)
    short = audio[:, : SR // 2]
    for packed in (False, True):
        s = StreamingRestorer(**stages, packed=packed)
        out = np.concatenate([s.feed(short), s.flush()], axis=1)
        assert out.shape[0] == 2


def test_sharded_multistream_matches_unsharded(stages, rng):
    """Stream batch sharded over the 'data' mesh axis (one SPMD step, no
    collectives — streams are independent) matches the unsharded batched
    restorer to float-reassociation noise (the partitioner fuses slightly
    differently per shard): multi-chip streaming is streams-per-chip x
    chips."""
    from ml_audio_restoration_tpu.parallel import make_mesh

    B, block = 8, 4096
    blocks = (rng.normal(size=(3, B, block)) * 0.1).astype(np.float32)
    plain = StreamingRestorer(**stages, batch=B)
    sharded = StreamingRestorer(**stages, batch=B,
                                mesh=make_mesh(data_parallel=8))
    for b in blocks:
        want, got = plain.feed(b), sharded.feed(b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.flush()),
                               np.asarray(plain.flush()), atol=1e-6)


def test_sharded_streaming_batch_must_divide_mesh(stages):
    from ml_audio_restoration_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="divide evenly"):
        StreamingRestorer(**stages, batch=3, mesh=make_mesh(data_parallel=8))


def test_streaming_int8_close_to_float(stages, audio):
    """int8 streaming (packed denoiser/SR stages quantized, auto-calibrated
    on the first window) stays within quantization tolerance of the float
    stream and keeps the output shape/chain semantics."""
    want = _single_shot(stages, audio)
    s = StreamingRestorer(**stages, quantize_int8=True)
    outs = [s.feed(b) for b in np.array_split(audio, 4, axis=1)]
    outs.append(s.flush())
    got = np.concatenate(outs, axis=1)
    assert got.shape == want.shape
    assert s.quantize_int8, "auto-calibration should not have downgraded"
    assert s._int8_scales is not None
    core = slice(8000, -1200)
    ref = np.max(np.abs(want[:, core]))
    dev = np.max(np.abs(got[:, core] - want[:, core]))
    assert dev < 0.15 * ref, (dev, ref)
    # and it actually quantized: output differs from the float stream
    sf = StreamingRestorer(**stages)
    fouts = [sf.feed(b) for b in np.array_split(audio, 4, axis=1)]
    fouts.append(sf.flush())
    gotf = np.concatenate(fouts, axis=1)
    assert np.max(np.abs(got - gotf)) > 0


@pytest.mark.slow
def test_streaming_int8_scales_interchange_with_pipeline(stages, audio,
                                                         tmp_path):
    """The streaming and batch pipelines run the SAME packed forwards, so
    one scales file serves both: pipeline-calibrated scales load into the
    streaming restorer (and streaming-calibrated scales into the pipeline)
    with every quantization point resolved."""
    from ml_audio_restoration_tpu.config import PipelineConfig
    from ml_audio_restoration_tpu.pipeline import RestorationPipeline

    # 0.8 s @ 22050 Hz = 17640 samples, a multiple of 4 as the int8
    # packed path requires (1.0 s would be 22050 and trip the gate)
    cfg = PipelineConfig(chunk_seconds=0.8, overlap_seconds=0.05,
                         quantize_int8=True)
    pipe = RestorationPipeline(**stages, config=cfg)
    pipe.calibrate_int8(audio, SR)
    path = str(tmp_path / "scales.json")
    pipe.save_int8_scales(path)

    s = StreamingRestorer(**stages, quantize_int8=True, int8_scales=path)
    out = np.concatenate([s.feed(audio), s.flush()], axis=1)
    assert out.shape[0] == 2 and np.isfinite(out).all()
    assert s._int8_version == 1  # loaded, not recalibrated

    # reverse direction: streaming-calibrated scales serve the pipeline.
    # Streaming never quantizes stereo, so its file carries only the
    # denoiser/SR stages — pair it with a sub-chunked-stereo config (the
    # fast_serve shape), where the pipeline's stereo stage is float too.
    s2 = StreamingRestorer(**stages, quantize_int8=True)
    np.concatenate([s2.feed(audio), s2.flush()], axis=1)
    path2 = str(tmp_path / "scales2.json")
    s2.save_int8_scales(path2)
    import dataclasses

    cfg2 = dataclasses.replace(cfg, stereo_chunk_seconds=0.25)
    pipe2 = RestorationPipeline(**stages, config=cfg2)
    loaded = pipe2.load_int8_scales(path2)
    assert set(loaded) == {"denoiser", "super_resolution"}
    y, rate = pipe2.restore(audio, SR)
    assert rate == 2 * SR and np.isfinite(np.asarray(y)).all()


def test_streaming_int8_downgrades_unpackable(stages, audio):
    """Gate violations downgrade to float serving with a warning (mirrors
    restore()'s auto-calibration behavior), never a crash."""
    s = StreamingRestorer(**stages, packed=False, quantize_int8=True)
    with pytest.warns(UserWarning, match="int8 streaming unavailable"):
        out = np.concatenate([s.feed(audio[:, :SR]), s.flush()], axis=1)
    assert not s.quantize_int8
    assert out.shape[0] == 2


def test_feed_rejects_wrong_shapes_batch_one(stages):
    """batch=1 feed() must reject a [2, n] block (a forgotten mixdown)
    instead of silently time-concatenating the channels into one
    doubled-length mono stream."""
    s = StreamingRestorer(denoiser=stages["denoiser"], batch=1)
    with pytest.raises(ValueError, match="mono"):
        s.feed(np.zeros((2, 1024), np.float32))
    with pytest.raises(ValueError, match="mono"):
        s.feed(np.zeros((2, 512, 1), np.float32))
    out = s.feed(np.zeros(1024, np.float32))  # 1-D still fine
    assert out.shape[0] >= 1


def test_lstm_impl_auto_resolves_by_backend(stages):
    """lstm_impl=None picks the Pallas kernel only on TPU backends (the
    measured +26% streaming win, docs/PERFORMANCE.md "Pallas LSTM in the
    streaming regime") and the scan on CPU; an explicit impl is honored and
    an unknown one rejected. On-TPU output equality pallas-vs-scan is
    pinned on the real backend (bit-identical, 2026-08-20) — here the CPU
    resolution plus the interpret-mode kernel tests cover the contract."""
    s = StreamingRestorer(**stages, batch=2)
    assert s.lstm_impl == "scan"  # tests always run on the CPU backend
    s2 = StreamingRestorer(**stages, batch=2, lstm_impl="scan")
    assert s2.lstm_impl == "scan"
    out = s2.feed(np.zeros((2, 4096), np.float32))
    assert out.shape[0] == 2
    with pytest.raises(ValueError, match="lstm_impl"):
        StreamingRestorer(**stages, lstm_impl="cudnn")


def test_streaming_bf16_tracks_f32_and_keeps_dtypes(stages, audio):
    """compute_dtype='bfloat16': the emitted audio must stay f32, track
    the f32 stream within bf16 tolerance, and the carries must come back
    at the compute dtype (an f32/bf16 mismatch would force a retrace
    every feed — the silent failure mode this pins)."""
    import jax.numpy as jnp

    blocks = [audio[:, :SR], audio[:, SR:2 * SR]]
    ref = StreamingRestorer(**stages, batch=1)
    want = np.concatenate([ref.feed(b) for b in blocks]
                          + [ref.flush()], axis=1)

    s = StreamingRestorer(**stages, batch=1, compute_dtype="bfloat16")
    got = np.concatenate([s.feed(b) for b in blocks] + [s.flush()], axis=1)
    assert got.dtype == np.float32
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-3)
    assert np.abs(got - want).max() <= 0.05 * scale
    for h, c in s._lstm_carry:
        assert h.dtype == jnp.bfloat16 and c.dtype == jnp.bfloat16
    assert s._dec_hist_buf.dtype == jnp.bfloat16
    # reset_stream's mask must not promote the carries back to f32
    s.reset_stream(0)
    for h, c in s._lstm_carry:
        assert h.dtype == jnp.bfloat16

    with pytest.raises(ValueError, match="compute_dtype"):
        StreamingRestorer(**stages, compute_dtype="float16")
