"""Serving warmup: `RestorationPipeline.warmup` / `StreamingRestorer.warmup`
must precompile exactly the programs real traffic hits (so a warmed server
never compiles inside a request) without changing any output, and must
refuse the configs where precompilation is impossible or harmful
(whole_file's per-length programs; int8 before scales exist)."""
import numpy as np
import pytest
import jax

from ml_audio_restoration_tpu.config import PipelineConfig
from ml_audio_restoration_tpu.models import denoiser
from ml_audio_restoration_tpu.pipeline import (RestorationPipeline,
                                               StreamingRestorer)

SR = 22050


@pytest.fixture(scope="module")
def dn_stage():
    return denoiser.init(jax.random.PRNGKey(0))


def _pipe(dn_stage, **over):
    cfg = PipelineConfig(chunk_seconds=0.25, overlap_seconds=0.02,
                         max_chunks_per_program=8, **over)
    return RestorationPipeline(denoiser=dn_stage, config=cfg)


def _tone(seconds):
    t = np.arange(int(seconds * SR)) / SR
    return (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]


def test_warmup_covers_serving_traffic(dn_stage):
    """After warmup, representative traffic (short, mid, slab-length and
    coalesced requests) compiles NOTHING new."""
    pipe = _pipe(dn_stage)
    info = pipe.warmup(coalesce=2)
    assert info["programs"] == len(pipe._compiled) > 0
    assert info["buckets"] == [4, 8]
    warmed = set(pipe._compiled)

    chunk = int(round(0.25 * SR))
    hop = chunk - int(round(0.02 * SR))
    pipe.restore(_tone(0.2), SR)                        # 1 chunk  -> bucket 4
    pipe.restore(_tone((4 * hop + chunk) / SR), SR)     # 5 chunks -> bucket 8
    pipe.restore(_tone((19 * hop + chunk) / SR), SR)    # 20 chunks -> slabs
    pipe.restore_many([_tone(0.2), _tone(0.2)], SR)     # coalesced pair
    assert set(pipe._compiled) == warmed, (
        f"traffic compiled new programs: {set(pipe._compiled) - warmed}")


def test_warmup_output_unchanged(dn_stage):
    """A warmed pipeline's restore is bit-identical to a cold one's."""
    warmed = _pipe(dn_stage)
    warmed.warmup(coalesce=2)
    cold = _pipe(dn_stage)
    x = _tone(0.9)
    got, rate = warmed.restore(x, SR)
    want, want_rate = cold.restore(x, SR)
    assert rate == want_rate
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_warmup_whole_file_is_a_noop(dn_stage):
    pipe = _pipe(dn_stage, whole_file=True)
    with pytest.warns(UserWarning, match="whole_file"):
        info = pipe.warmup()
    assert info["programs"] == 0 and not pipe._compiled


def test_warmup_int8_without_scales_skips(dn_stage):
    """int8 with no scales loaded: warming the float path would be wasted
    (calibration bumps the program-key version) — skip with a warning and
    leave calibration state untouched."""
    pipe = _pipe(dn_stage, quantize_int8=True)
    with pytest.warns(UserWarning, match="scales"):
        info = pipe.warmup()
    assert info["programs"] == 0 and not pipe._compiled
    assert pipe._int8_scales is None and not pipe._int8_failed


def test_streaming_warmup_covers_block_clock_and_resets(dn_stage):
    """After warmup(block), a block-clocked feed sequence compiles nothing
    new, and the output is bit-identical to a cold restorer's (warmup's
    internal feeds are fully reset)."""
    block = 2048
    warmed = StreamingRestorer(denoiser=dn_stage, batch=2)
    info = warmed.warmup(block)
    assert info["programs"] == len(warmed._compiled) > 0
    keys = set(warmed._compiled)

    cold = StreamingRestorer(denoiser=dn_stage, batch=2)
    rng = np.random.RandomState(7)
    got, want = [], []
    for _ in range(4):
        b = rng.randn(2, block).astype(np.float32) * 0.3
        got.append(warmed.feed(b))
        want.append(cold.feed(b))
    assert set(warmed._compiled) == keys
    np.testing.assert_array_equal(np.concatenate(got, axis=2),
                                  np.concatenate(want, axis=2))


def test_streaming_warmup_int8_without_scales_skips(dn_stage):
    """Warmup silence must never become the int8 calibration signal."""
    s = StreamingRestorer(denoiser=dn_stage, quantize_int8=True)
    with pytest.warns(UserWarning, match="scales"):
        info = s.warmup(2048)
    assert info["programs"] == 0
    assert s._int8_scales is None and s.quantize_int8
