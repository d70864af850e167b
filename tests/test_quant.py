"""int8 serving quantization (ops/quant.py): per-model calibrate+quantize
accuracy bounds, default-path invariance, and pipeline integration
(auto-calibration, scale persistence, fallback gating)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ml_audio_restoration_tpu.config import PipelineConfig
from ml_audio_restoration_tpu.models import (
    denoiser,
    super_resolution,
    stereo_separator,
)
from ml_audio_restoration_tpu.ops.quant import (
    QT,
    QuantCtx,
    calibrate,
    quantize_weight,
    requantize,
)
from ml_audio_restoration_tpu.pipeline import RestorationPipeline


@pytest.fixture(scope="module")
def x_mono(rng_module):
    return jnp.asarray(
        (rng_module.normal(size=(2, 1024, 1)) * 0.1).astype(np.float32))


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32))
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8
    back = wq.astype(jnp.float32) * s
    # per-out-channel symmetric quant: error bounded by half a step
    step = np.asarray(s)
    assert np.all(np.abs(np.asarray(back - w)) <= step / 2 + 1e-7)
    # the max-magnitude element of each channel hits +-127 exactly
    assert int(jnp.max(jnp.abs(wq))) == 127


def test_requantize_clips():
    y = jnp.asarray([-10.0, 0.0, 0.004, 10.0])
    q = requantize(y, 0.01)
    assert q.dtype == jnp.int8
    assert np.array_equal(np.asarray(q), [-127, 0, 0, 127])  # round-half-even


@pytest.mark.parametrize("model,init_kw,nscales", [
    (denoiser, {}, 20),
    (super_resolution, {}, 13),
    (stereo_separator, {}, 16),
])
def test_model_int8_close_to_f32(model, init_kw, nscales, x_mono):
    p, s = model.init(jax.random.PRNGKey(3), **init_kw)
    y32 = jax.jit(lambda p, s, x: model.apply_packed(p, s, x))(p, s, x_mono)
    scales = calibrate(lambda x: model.packed_amax(p, s, x), [x_mono])
    assert len(scales) == nscales
    yq = jax.jit(
        lambda p, s, x: model.apply_packed(p, s, x, q=QuantCtx(scales))
    )(p, s, x_mono)
    assert yq.shape == y32.shape and yq.dtype == jnp.float32
    err = float(jnp.abs(yq - y32).max())
    # random-init bound; trained-checkpoint quality is measured in
    # docs/RESULTS.md (scripts/full_chain_eval.py --int8)
    assert err < 5e-3, err


@pytest.mark.parametrize("model", [denoiser, stereo_separator])
def test_int8_packed_scope_close_to_f32(model, x_mono):
    """scope='packed' (the config default) keeps the plain-layout C>=128
    stages float — measured faster on v5e than quantizing them
    (docs/PERFORMANCE.md) — and must stay at least as close to f32 as the
    full scope since it quantizes strictly fewer layers."""
    p, s = model.init(jax.random.PRNGKey(7))
    y32 = jax.jit(lambda p, s, x: model.apply_packed(p, s, x))(p, s, x_mono)
    scales = calibrate(lambda x: model.packed_amax(p, s, x), [x_mono])
    yp = jax.jit(lambda p, s, x: model.apply_packed(
        p, s, x, q=QuantCtx(scales, scope="packed")))(p, s, x_mono)
    yf = jax.jit(lambda p, s, x: model.apply_packed(
        p, s, x, q=QuantCtx(scales, scope="full")))(p, s, x_mono)
    err_p = float(jnp.abs(yp - y32).max())
    err_f = float(jnp.abs(yf - y32).max())
    assert err_p < 5e-3, err_p
    assert err_p <= err_f * 1.5 + 1e-4, (err_p, err_f)
    # the two scopes genuinely differ (packed keeps the middle/tail float)
    assert float(jnp.abs(yp - yf).max()) > 0


def test_stereo_int8_grouped_bitexact_vs_ungrouped(x_mono):
    """int8 serving FORCED through the grouped dual decoder (the default
    routes int8 ungrouped — measured 7% faster) is BIT-IDENTICAL to the two
    independent decoders under the same scales: the s8 conv accumulation is
    exact integer arithmetic and int8_exec's grouped fold reproduces the
    ungrouped per-output-channel quantization exactly (ops/quant.py)."""
    p, s = stereo_separator.init(jax.random.PRNGKey(9))
    scales = calibrate(lambda x: stereo_separator.packed_amax(p, s, x),
                       [x_mono])
    yg = jax.jit(lambda p, s, x: stereo_separator.apply_packed(
        p, s, x, q=QuantCtx(scales), grouped=True))(p, s, x_mono)
    yu = jax.jit(lambda p, s, x: stereo_separator.apply_packed(
        p, s, x, q=QuantCtx(scales), grouped=False))(p, s, x_mono)
    np.testing.assert_array_equal(np.asarray(yg), np.asarray(yu))


def test_stereo_int8_scales_interchangeable_across_decoder_layouts(x_mono):
    """Calibration through the grouped decoder records the SAME quantization
    points as the ungrouped one (tuple names split into the per-side
    entries — QuantCtx.record), so one scales file serves both decoder
    layouts in either direction."""
    import functools

    from ml_audio_restoration_tpu.ops import quant

    p, s = stereo_separator.init(jax.random.PRNGKey(10))
    grp = functools.partial(stereo_separator.apply_packed, grouped=True)
    sc_g = calibrate(lambda x: quant.packed_amax(grp, p, s, x), [x_mono])
    ung = functools.partial(stereo_separator.apply_packed, grouped=False)
    sc_u = calibrate(lambda x: quant.packed_amax(ung, p, s, x), [x_mono])
    assert set(sc_g) == set(sc_u)
    for k in sc_g:
        np.testing.assert_allclose(sc_g[k], sc_u[k], rtol=1e-5, atol=1e-8,
                                    err_msg=k)
    # ungrouped-calibrated scales serve the grouped decoder (the exact
    # "stale scales file from the pre-grouped era" compatibility case)
    y32 = jax.jit(lambda p, s, x: stereo_separator.apply_packed(p, s, x))(
        p, s, x_mono)
    yq = jax.jit(lambda p, s, x: stereo_separator.apply_packed(
        p, s, x, q=QuantCtx(sc_u)))(p, s, x_mono)
    assert float(jnp.abs(yq - y32).max()) < 5e-3


def test_calibration_keys_match_quantized_consumption(x_mono):
    """Every scale the int8 forward reads exists in the calibration dict
    (a missing key would KeyError at trace time — this guards renames)."""
    p, s = denoiser.init(jax.random.PRNGKey(4))
    scales = calibrate(lambda x: denoiser.packed_amax(p, s, x), [x_mono])
    # trace only (no execution) — enough to touch every scale lookup
    jax.eval_shape(
        lambda x: denoiser.apply_packed(p, s, x, q=QuantCtx(scales)), x_mono)


def test_default_path_ignores_quant_machinery(x_mono):
    """apply_packed with q=None must equal the plain apply() as before."""
    for model in (denoiser, super_resolution, stereo_separator):
        p, s = model.init(jax.random.PRNGKey(5))
        y_ref = jax.jit(lambda p, s, x, m=model: m.apply(p, s, x)[0])(
            p, s, x_mono)
        y_pk = jax.jit(lambda p, s, x, m=model: m.apply_packed(p, s, x))(
            p, s, x_mono)
        assert float(jnp.abs(y_pk - y_ref).max()) < 1e-5


def _stages(seed=11):
    dn = denoiser.init(jax.random.PRNGKey(seed))
    sr = super_resolution.init(jax.random.PRNGKey(seed + 1))
    st = stereo_separator.init(jax.random.PRNGKey(seed + 2))
    return {"denoiser": dn, "super_resolution": sr, "stereo": st}


@pytest.mark.slow
def test_pipeline_int8_autocalibrates_and_tracks_f32(rng_module):
    audio = (rng_module.normal(size=(1, 22050)) * 0.15).astype(np.float32)
    base = PipelineConfig(chunk_seconds=0.4, overlap_seconds=0.05)
    int8 = PipelineConfig(chunk_seconds=0.4, overlap_seconds=0.05,
                          quantize_int8=True)
    stages = _stages()
    out32, rate32 = RestorationPipeline(**stages, config=base).restore(audio)
    pq = RestorationPipeline(**stages, config=int8)
    outq, rateq = pq.restore(audio)
    assert pq._int8_scales is not None  # auto-calibrated
    assert set(pq._int8_scales) == {"denoiser", "super_resolution", "stereo"}
    assert rateq == rate32 and outq.shape == out32.shape
    a, b = np.asarray(out32), np.asarray(outq)
    denom = float(np.abs(a).mean()) + 1e-9
    assert float(np.abs(a - b).mean()) / denom < 0.05
    # a second recording reuses the scales (no recalibration)
    v = pq._int8_version
    pq.restore((rng_module.normal(size=(1, 11025)) * 0.1).astype(np.float32))
    assert pq._int8_version == v


@pytest.mark.slow
def test_pipeline_int8_subchunk_stereo_stays_float(rng_module):
    """At sub-chunked stereo windows (fast_serve), int8 applies to the
    denoiser/SR only — the stereo stage runs the same plain float path as
    the non-int8 preset (the packed-stereo gate; measured rationale in
    docs/PERFORMANCE.md 'int8'), so outputs still track f32."""
    audio = (rng_module.normal(size=(1, 22050)) * 0.15).astype(np.float32)
    base = PipelineConfig(chunk_seconds=0.4, overlap_seconds=0.05,
                          stereo_chunk_seconds=0.1)
    int8 = PipelineConfig(chunk_seconds=0.4, overlap_seconds=0.05,
                          stereo_chunk_seconds=0.1, quantize_int8=True)
    stages = _stages()
    out32, _ = RestorationPipeline(**stages, config=base).restore(audio)
    pq = RestorationPipeline(**stages, config=int8)
    outq, _ = pq.restore(audio)
    assert "stereo" in pq._int8_scales  # calibration still records it
    a, b = np.asarray(out32), np.asarray(outq)
    denom = float(np.abs(a).mean()) + 1e-9
    assert float(np.abs(a - b).mean()) / denom < 0.05


@pytest.mark.slow
def test_pipeline_int8_with_source_rate_stereo(rng_module):
    """int8 + stereo_source_rate: calibration runs the stereo stage on the
    PRE-SR signal (what it will actually consume), quantized serving
    tracks the f32 source-rate output, and the mid stays exactly the
    (quantized) denoise+SR output."""
    import dataclasses

    audio = (rng_module.normal(size=(1, 22050)) * 0.15).astype(np.float32)
    base = PipelineConfig(chunk_seconds=0.4, overlap_seconds=0.05,
                          stereo_source_rate=True)
    stages = _stages()
    out32, _ = RestorationPipeline(**stages, config=base).restore(audio)
    pq = RestorationPipeline(**stages, config=dataclasses.replace(
        base, quantize_int8=True))
    outq, _ = pq.restore(audio)
    assert set(pq._int8_scales) == {"denoiser", "super_resolution", "stereo"}
    a, b = np.asarray(out32), np.asarray(outq)
    denom = float(np.abs(a).mean()) + 1e-9
    assert float(np.abs(a - b).mean()) / denom < 0.05
    # mid == the int8 pipeline's own denoise+SR output (exact construction)
    mono_q, _ = RestorationPipeline(
        denoiser=stages["denoiser"],
        super_resolution=stages["super_resolution"],
        config=dataclasses.replace(base, quantize_int8=True)).restore(audio)
    np.testing.assert_allclose(b.mean(axis=0), np.asarray(mono_q)[0],
                               atol=1e-5)


@pytest.mark.slow
def test_pipeline_int8_scales_roundtrip(tmp_path, rng_module):
    audio = (rng_module.normal(size=(1, 11025)) * 0.15).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=0.4, quantize_int8=True)
    stages = _stages()
    p1 = RestorationPipeline(**stages, config=cfg)
    out1, _ = p1.restore(audio)
    path = p1.save_int8_scales(tmp_path / "scales.json")
    p2 = RestorationPipeline(**stages, config=cfg)
    p2.load_int8_scales(path)
    out2, _ = p2.restore(audio)
    assert p2._int8_scales == p1._int8_scales
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_pipeline_int8_whole_file_odd_length_falls_back(rng_module):
    """whole_file with a length not on the packing grid cannot quantize:
    it must warn and produce the plain-path output exactly."""
    audio = (rng_module.normal(size=(1, 4099)) * 0.1).astype(np.float32)
    stages = _stages()
    plain, _ = RestorationPipeline(
        **stages, config=PipelineConfig(whole_file=True)).restore(audio)
    pq = RestorationPipeline(
        **stages, config=PipelineConfig(whole_file=True, quantize_int8=True))
    with pytest.warns(UserWarning, match="int8 serving disabled"):
        outq, _ = pq.restore(audio)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(outq))


def test_pipeline_int8_without_packed_convs_falls_back(rng_module):
    """quantize_int8 without packed_convs can never activate (int8 rides
    the packed forwards): restore() must warn and serve the plain float
    path exactly, without burning a calibration pass."""
    import dataclasses

    audio = (rng_module.normal(size=(1, 11025)) * 0.1).astype(np.float32)
    base = PipelineConfig(chunk_seconds=0.4, packed_convs=False)
    stages = _stages()
    plain, _ = RestorationPipeline(**stages, config=base).restore(audio)
    pq = RestorationPipeline(**stages, config=dataclasses.replace(
        base, quantize_int8=True))
    with pytest.warns(UserWarning, match="int8 serving disabled"):
        outq, _ = pq.restore(audio)
    assert pq._int8_scales is None  # no wasted calibration pass
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(outq))


def test_pipeline_int8_stale_scales_clear_error(tmp_path, rng_module):
    """A loaded scales file that does not cover this pipeline's
    quantization points must fail with an actionable message, not a bare
    KeyError from inside the trace."""
    import json

    audio = (rng_module.normal(size=(1, 11025)) * 0.1).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=0.4, quantize_int8=True)
    pq = RestorationPipeline(**_stages(), config=cfg)
    path = tmp_path / "stale.json"
    path.write_text(json.dumps(
        {"denoiser": {}, "super_resolution": {}, "stereo": {}}))
    pq.load_int8_scales(path)
    with pytest.raises(KeyError, match="quantization point"):
        pq.restore(audio)


@pytest.mark.slow
def test_pipeline_int8_missing_stage_scales_recalibrate(tmp_path,
                                                        rng_module):
    """A loaded scales file calibrated with a stage disabled (e.g. a
    StreamingRestorer-written file has no 'stereo') must warn and
    recalibrate, not KeyError the step trace."""
    audio = (rng_module.normal(size=(1, 11025)) * 0.15).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=0.4, quantize_int8=True)
    stages = _stages()
    ref = RestorationPipeline(**stages, config=cfg)
    out_ref, _ = ref.restore(audio)  # auto-calibrates all three stages

    partial = {k: v for k, v in ref._int8_scales.items() if k != "stereo"}
    pq = RestorationPipeline(**stages, config=cfg)
    pq._int8_scales = partial
    pq._int8_version += 1
    with pytest.warns(UserWarning, match="lack stage"):
        outq, _ = pq.restore(audio)
    assert set(pq._int8_scales) == {"denoiser", "super_resolution", "stereo"}
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(outq))


def test_streaming_int8_missing_stage_scales_recalibrate(rng_module):
    """Same contract for streaming: scales lacking an enabled stage are
    discarded and recalibrated on the first drained window."""
    from ml_audio_restoration_tpu.pipeline.streaming import StreamingRestorer

    stages = _stages()
    x = (rng_module.normal(size=8192) * 0.1).astype(np.float32)

    def run(s):
        outs = [s.feed(x[o:o + 2048]) for o in range(0, x.size, 2048)]
        outs.append(s.flush())
        return np.concatenate([np.asarray(o) for o in outs], axis=-1)

    ref = StreamingRestorer(denoiser=stages["denoiser"],
                            super_resolution=stages["super_resolution"],
                            quantize_int8=True)
    out_ref = run(ref)  # auto-calibrates denoiser + super_resolution

    partial = {"denoiser": ref._int8_scales["denoiser"]}
    s = StreamingRestorer(denoiser=stages["denoiser"],
                          super_resolution=stages["super_resolution"],
                          quantize_int8=True, int8_scales=partial)
    with pytest.warns(UserWarning, match="lack stage"):
        out = run(s)
    assert s.quantize_int8  # recalibrated, not downgraded to float
    assert set(s._int8_scales) == {"denoiser", "super_resolution"}
    np.testing.assert_allclose(out_ref, out)


def test_pipeline_int8_gate_failure_does_not_retry_per_recording(rng_module):
    """A config-shaped gate failure (packed_convs off) must warn once, then
    serve float silently — not re-run calibration and re-warn on every
    file of a directory run."""
    import dataclasses
    import warnings

    audio = (rng_module.normal(size=(1, 11025)) * 0.1).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=0.4, packed_convs=False,
                         quantize_int8=True)
    pq = RestorationPipeline(**_stages(), config=cfg)
    with pytest.warns(UserWarning, match="int8 serving disabled"):
        pq.restore(audio)
    assert pq._int8_failed
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        pq.restore(audio)  # second recording: no retry, no warning


def test_streaming_int8_preloaded_scales_respect_packed_gate(rng_module):
    """Pre-loaded scales used to bypass the calibration-time gates
    entirely; the gates now run for them too, so packed=False downgrades
    to float serving (bit-matching the float restorer) instead of
    attempting int8 off the packed paths."""
    from ml_audio_restoration_tpu.pipeline.streaming import StreamingRestorer

    stages = _stages()
    x = (rng_module.normal(size=4096) * 0.1).astype(np.float32)

    def run(s):
        outs = [s.feed(x[o:o + 2048]) for o in range(0, x.size, 2048)]
        outs.append(s.flush())
        return np.concatenate([np.asarray(o) for o in outs], axis=-1)

    calib = StreamingRestorer(denoiser=stages["denoiser"],
                              quantize_int8=True)
    run(calib)  # valid scales to preload

    want = run(StreamingRestorer(denoiser=stages["denoiser"], packed=False))
    s = StreamingRestorer(denoiser=stages["denoiser"], packed=False,
                          quantize_int8=True,
                          int8_scales=calib._int8_scales)
    with pytest.warns(UserWarning, match="int8 streaming unavailable"):
        out = run(s)
    assert not s.quantize_int8
    np.testing.assert_array_equal(want, out)


@pytest.mark.slow
def test_warmup_with_uncovered_scales_skips_not_crashes(rng_module):
    """warmup() must run the same scales-coverage gate as restore(): a
    loaded scales file lacking an enabled stage previously KeyErrored the
    warmup trace, crashing `cli serve --warmup` at startup."""
    audio = (rng_module.normal(size=(1, 11025)) * 0.15).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=0.4, quantize_int8=True,
                         max_chunks_per_program=4)
    stages = _stages()
    ref = RestorationPipeline(**stages, config=cfg)
    ref.restore(audio)  # auto-calibrates all three stages

    pq = RestorationPipeline(**stages, config=cfg)
    pq._int8_scales = {k: v for k, v in ref._int8_scales.items()
                       if k != "stereo"}
    with pytest.warns(UserWarning, match="lack stage"):
        info = pq.warmup()
    assert info["programs"] == 0  # skipped, awaiting calibration
    assert pq._int8_scales is None
    # and the pipeline still serves (auto-calibrates on first recording)
    out, _ = pq.restore(audio)
    assert np.isfinite(np.asarray(out)).all()


def test_disabled_sr_stage_does_not_recalibrate_every_restore(rng_module):
    """An SR checkpoint loaded under enable_super_resolution=False never
    appears in the trace, so its scales are never produced — the coverage
    check must key off the ENABLED stages or every restore discards the
    scales and repays a full calibration + recompile."""
    import warnings as _warnings

    cfg = PipelineConfig(chunk_seconds=0.4, quantize_int8=True,
                         enable_super_resolution=False)
    pipe = RestorationPipeline(**_stages(), config=cfg)
    a = (rng_module.normal(size=(1, 11025)) * 0.15).astype(np.float32)
    b = (rng_module.normal(size=(1, 11025)) * 0.15).astype(np.float32)
    out_a, rate = pipe.restore(a)  # calibrates denoiser + stereo
    assert rate == 22050  # SR disabled: no upsampling
    assert set(pipe._int8_scales) == {"denoiser", "stereo"}
    version = pipe._int8_version
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # any discard warning -> failure
        pipe.restore(b)
        pipe.restore(a)
    assert pipe._int8_version == version, \
        "scales discarded+recalibrated despite full coverage"


def test_scales_file_roundtrip_atomic(tmp_path):
    """save_scales_file writes via tmp+rename: the target is either the old
    or the new complete JSON (cli serve persists at shutdown and auto-loads
    on the next start — truncated JSON would poison every later start), and
    no .tmp litter is left behind."""
    from ml_audio_restoration_tpu.ops.quant import (load_scales_file,
                                                    save_scales_file)

    path = tmp_path / "scales.json"
    save_scales_file(path, {"denoiser": {"in": [0.1, 0.2]}})
    save_scales_file(path, {"denoiser": {"in": [0.3]}, "stereo": {"in": [1.0]}})
    assert load_scales_file(path) == {"denoiser": {"in": [0.3]},
                                      "stereo": {"in": [1.0]}}
    assert [p.name for p in tmp_path.iterdir()] == ["scales.json"]
