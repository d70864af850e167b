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
