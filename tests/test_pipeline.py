"""End-to-end pipeline tests: parity vs the chained torch reference models,
chunked-vs-whole consistency, and file-to-file restore."""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import has_reference, reference_models
from ml_audio_restoration_tpu.compat import torch_loader
from ml_audio_restoration_tpu.config import PipelineConfig
from ml_audio_restoration_tpu.pipeline import RestorationPipeline

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")


def _sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def torch_models():
    den_mod, sr_mod, st_mod = reference_models()
    torch.manual_seed(7)
    dn = den_mod.AudioDenoiser()
    sr = sr_mod.AudioSuperResolution(upscale_factor=2)
    st = st_mod.StereoSeparator()
    for m in (dn, sr, st):
        m.eval()
    return dn, sr, st


@pytest.fixture(scope="module")
def pipeline_stages(torch_models):
    dn, sr, st = torch_models
    return {
        "denoiser": torch_loader.convert_denoiser(_sd(dn)),
        "super_resolution": torch_loader.convert_super_resolution(_sd(sr)),
        "stereo": torch_loader.convert_stereo_separator(_sd(st)),
    }


def _torch_chain(torch_models, audio):
    """The reference inference chain (inference.py:59-95): single unchunked
    forward per model."""
    dn, sr, st = torch_models
    x = torch.from_numpy(audio[None])  # [1, 1, T]
    with torch.no_grad():
        x = dn(x)
        x = sr(x)
        x = st(x)
    return x[0].numpy()  # [2, 2T]


def test_full_pipeline_whole_file_parity(pipeline_stages, torch_models, rng):
    t = 8192
    audio = (rng.normal(size=(1, t)) * 0.2).astype(np.float32)

    want = _torch_chain(torch_models, audio)

    pipe = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"],
        super_resolution=pipeline_stages["super_resolution"],
        stereo=pipeline_stages["stereo"],
        config=PipelineConfig(whole_file=True),
    )
    got, out_rate = pipe.restore(audio, sample_rate=22050)
    got = np.asarray(got)

    assert out_rate == 44100
    assert got.shape == want.shape
    # BASELINE.json bar: <=1e-3 max waveform deviation vs PyTorch CPU.
    assert np.max(np.abs(got - want)) < 1e-3


def test_denoise_only_chunked_matches_whole_interior(pipeline_stages, rng):
    """Chunked overlap-add must equal the unchunked forward away from seams
    (the U-Net is fully convolutional with a bounded receptive field)."""
    t = 8000
    audio = (rng.normal(size=(1, t)) * 0.2).astype(np.float32)
    stages = dict(denoiser=pipeline_stages["denoiser"])

    whole = RestorationPipeline(
        **stages, config=PipelineConfig(whole_file=True))
    chunked = RestorationPipeline(
        **stages,
        config=PipelineConfig(chunk_seconds=2000 / 22050,
                              overlap_seconds=200 / 22050))

    w, _ = whole.restore(audio, 22050)
    c, _ = chunked.restore(audio, 22050)
    w, c = np.asarray(w), np.asarray(c)
    assert w.shape == c.shape == (1, t)

    hop = 2000 - 200
    mask = np.ones(t, bool)
    for seam in range(hop, t, hop):
        mask[max(0, seam - 600):seam + 600] = False
    # the final receptive field sees the last chunk's zero tail-padding,
    # which legitimately differs from whole-file edge semantics
    mask[-600:] = False
    assert np.max(np.abs(w[0][mask] - c[0][mask])) < 1e-4


def test_chunk_count_bucketing_pads_with_zeros(pipeline_stages, rng):
    """Zero-padded bucket chunks must not affect real output."""
    audio = (rng.normal(size=(1, 5000)) * 0.2).astype(np.float32)
    pipe = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"],
        config=PipelineConfig(chunk_seconds=1000 / 22050, overlap_seconds=0))
    out, _ = pipe.restore(audio, 22050)  # 5 chunks -> bucket 8
    whole = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"],
        config=PipelineConfig(whole_file=True))
    w, _ = whole.restore(audio, 22050)
    # interior check away from the 4 seams
    mask = np.ones(5000, bool)
    for seam in range(1000, 5000, 1000):
        mask[seam - 600:seam + 600] = False
    mask[-600:] = False
    assert np.max(np.abs(np.asarray(out)[0][mask] - np.asarray(w)[0][mask])) < 1e-4


def test_bucketing_exact_including_tail(pipeline_stages, rng):
    """Bucketed chunked output == overlap-add of ONLY the real chunks,
    including the final `overlap` samples: padding chunks are weight-masked
    out of the crossfade (round-1 advisory: they previously crossfaded a
    mostly-zero-window model output into the tail at up-to-full weight)."""
    from ml_audio_restoration_tpu.models import denoiser as denoiser_mod
    from ml_audio_restoration_tpu.ops import overlap_add, frame_structured
    from ml_audio_restoration_tpu.ops.chunking import num_chunks

    t, chunk, overlap = 4200, 1000, 200
    hop = chunk - overlap
    audio = (rng.normal(size=(1, t)) * 0.2).astype(np.float32)
    pipe = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"],
        config=PipelineConfig(chunk_seconds=chunk / 22050,
                              overlap_seconds=overlap / 22050))
    got, _ = pipe.restore(audio, 22050)  # 5 real chunks -> bucketed to 8

    n_real = num_chunks(t, chunk, hop)
    assert n_real == 5
    total = (n_real - 1) * hop + chunk
    assert total == t  # no tail padding: any tail deviation = mask bug
    params, state = pipeline_stages["denoiser"]
    frames = frame_structured(jnp.asarray(audio), n_real, chunk, hop)
    y, _ = denoiser_mod.apply(params, state, frames)
    want = overlap_add(y.transpose(0, 2, 1), hop, total, overlap=overlap)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_restore_file_roundtrip(pipeline_stages, tmp_path, rng):
    from ml_audio_restoration_tpu.audio import save_audio, wav_info

    sr_hz = 22050
    t = 4096
    sig = (0.4 * np.sin(2 * np.pi * 440 * np.arange(t) / sr_hz)).astype(
        np.float32)[None]
    in_path = tmp_path / "in.wav"
    out_path = tmp_path / "out.wav"
    save_audio(in_path, sig, sr_hz)

    pipe = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"],
        super_resolution=pipeline_stages["super_resolution"],
        stereo=pipeline_stages["stereo"],
        config=PipelineConfig(whole_file=True),
    )
    _, out_rate = pipe.restore_file(in_path, out_path)

    info = wav_info(out_path)
    assert out_rate == 44100
    assert info.sample_rate == 44100
    assert info.channels == 2
    assert info.frames == t * 2


def test_multichip_sharded_pipeline_matches_single(pipeline_stages, rng):
    """Chunk batch sharded over an 8-device mesh == single-device output."""
    from ml_audio_restoration_tpu.parallel import make_mesh

    audio = (rng.normal(size=(1, 22050)) * 0.2).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=2000 / 22050,
                         overlap_seconds=200 / 22050)
    stages = dict(denoiser=pipeline_stages["denoiser"],
                  super_resolution=pipeline_stages["super_resolution"],
                  stereo=pipeline_stages["stereo"])
    single = RestorationPipeline(**stages, config=cfg)
    sharded = RestorationPipeline(**stages, config=cfg,
                                  mesh=make_mesh(data_parallel=8))
    a, ra = single.restore(audio, 22050)
    b, rb = sharded.restore(audio, 22050)
    assert ra == rb == 44100
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-4)


def test_stereo_subchunking(pipeline_stages, rng):
    """Finer internal stereo windows: disabled when >= chunk length (exact
    match with the plain path), shape-correct + finite when enabled."""
    audio = (rng.normal(size=(1, 22050)) * 0.2).astype(np.float32)
    stages = dict(denoiser=pipeline_stages["denoiser"],
                  super_resolution=pipeline_stages["super_resolution"],
                  stereo=pipeline_stages["stereo"])
    base_cfg = PipelineConfig(chunk_seconds=4000 / 22050,
                              overlap_seconds=200 / 22050)
    plain = RestorationPipeline(**stages, config=base_cfg)
    import dataclasses

    same = RestorationPipeline(**stages, config=dataclasses.replace(
        base_cfg, stereo_chunk_seconds=4000 / 22050))  # >= chunk -> no-op
    fine = RestorationPipeline(**stages, config=dataclasses.replace(
        base_cfg, stereo_chunk_seconds=1000 / 22050))

    a, _ = plain.restore(audio, 22050)
    b, _ = same.restore(audio, 22050)
    c, _ = fine.restore(audio, 22050)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(c).shape == np.asarray(a).shape
    assert np.isfinite(np.asarray(c)).all()
    # same model, shorter context: outputs correlated but not identical
    corr = np.corrcoef(np.asarray(a)[0], np.asarray(c)[0])[0, 1]
    assert corr > 0.9


def test_stereo_mid_exact_preserves_mono(pipeline_stages, rng):
    """stereo_mid_exact rebuilds L/R around the true mid: the output's mean
    must equal the mono signal entering the stereo stage (here: the input,
    stereo-only pipeline) to float rounding, while still carrying side."""
    import dataclasses

    audio = (rng.normal(size=(1, 22050)) * 0.2).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=4000 / 22050,
                         overlap_seconds=200 / 22050)
    raw = RestorationPipeline(stereo=pipeline_stages["stereo"], config=cfg)
    exact = RestorationPipeline(stereo=pipeline_stages["stereo"],
                                config=dataclasses.replace(
                                    cfg, stereo_mid_exact=True))
    a, _ = exact.restore(audio, 22050)
    a = np.asarray(a)
    assert a.shape[0] == 2
    mid = a.mean(axis=0)
    np.testing.assert_allclose(mid, audio[0], atol=1e-6)
    # invariant also holds with finer internal stereo windows
    sub = RestorationPipeline(stereo=pipeline_stages["stereo"],
                              config=dataclasses.replace(
                                  cfg, stereo_mid_exact=True,
                                  stereo_chunk_seconds=1000 / 22050))
    c, _ = sub.restore(audio, 22050)
    np.testing.assert_allclose(np.asarray(c).mean(axis=0), audio[0],
                               atol=1e-6)
    # the side signal is the model's (shared with raw mode)
    b, _ = raw.restore(audio, 22050)
    b = np.asarray(b)
    np.testing.assert_allclose((a[0] - a[1]) / 2, (b[0] - b[1]) / 2,
                               atol=1e-6)


def test_stereo_source_rate_upmix(pipeline_stages, rng):
    """stereo_source_rate: the stereo stage runs on the denoised PRE-SR
    signal (half the LSTM steps) and only its side is upsampled. The output
    mid must equal the denoise+SR-only pipeline exactly (overlap-add is
    linear, so the invariant survives chunking), and the side must equal
    the linearly-upsampled source-rate stereo side."""
    import dataclasses

    audio = (rng.normal(size=(1, 22050)) * 0.2).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=4000 / 22050,
                         overlap_seconds=200 / 22050)
    src = RestorationPipeline(**pipeline_stages, config=dataclasses.replace(
        cfg, stereo_source_rate=True))
    out, rate = src.restore(audio, 22050)
    out = np.asarray(out)
    assert rate == 44100 and out.shape == (2, 44100)

    mono = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"],
        super_resolution=pipeline_stages["super_resolution"], config=cfg)
    mid_want, _ = mono.restore(audio, 22050)
    np.testing.assert_allclose(out.mean(axis=0), np.asarray(mid_want)[0],
                               atol=1e-6)
    # it actually carries a side signal
    assert np.abs(out[0] - out[1]).max() > 1e-4

    # value check against a manual composition at whole-file framing:
    # side = upsample(side(stereo(denoised22))), out = mid +/- side
    from ml_audio_restoration_tpu.ops.interp import upsample_linear

    wcfg = dataclasses.replace(cfg, whole_file=True)
    src_w = RestorationPipeline(
        **pipeline_stages, config=dataclasses.replace(
            wcfg, stereo_source_rate=True))
    got, _ = src_w.restore(audio, 22050)
    dn22, _ = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"],
        config=dataclasses.replace(wcfg, enable_super_resolution=False),
    ).restore(audio, 22050)
    y22, _ = RestorationPipeline(
        stereo=pipeline_stages["stereo"], config=wcfg).restore(
            np.asarray(dn22), 22050)
    side = upsample_linear(
        np.asarray((y22[0:1] - y22[1:2]) * 0.5).T[None], 2)[0].T
    mid, _ = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"],
        super_resolution=pipeline_stages["super_resolution"],
        config=wcfg).restore(audio, 22050)
    want = np.concatenate([np.asarray(mid) + side, np.asarray(mid) - side])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6)

    # degenerate (no SR): identical to stereo_mid_exact
    a, _ = RestorationPipeline(
        stereo=pipeline_stages["stereo"], config=dataclasses.replace(
            cfg, stereo_source_rate=True)).restore(audio, 22050)
    b, _ = RestorationPipeline(
        stereo=pipeline_stages["stereo"], config=dataclasses.replace(
            cfg, stereo_mid_exact=True)).restore(audio, 22050)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mid invariant also holds with finer internal stereo windows (the
    # sub-windows re-frame the SOURCE-rate stage input)
    sub, _ = RestorationPipeline(
        **pipeline_stages, config=dataclasses.replace(
            cfg, stereo_source_rate=True,
            stereo_chunk_seconds=1000 / 22050)).restore(audio, 22050)
    np.testing.assert_allclose(np.asarray(sub).mean(axis=0),
                               np.asarray(mid_want)[0], atol=1e-6)


def test_stereo_source_rate_staged_rejected(pipeline_stages):
    """Staged serving is a linear device chain: the forked source-rate
    dataflow must be rejected loudly, not silently ignored."""
    import dataclasses
    from ml_audio_restoration_tpu.pipeline import StagedRestorationPipeline

    cfg = dataclasses.replace(PipelineConfig(), stereo_source_rate=True)
    with pytest.raises(ValueError, match="stereo_source_rate"):
        StagedRestorationPipeline(**pipeline_stages, config=cfg)
    cfg = dataclasses.replace(PipelineConfig(), quantize_int8=True)
    with pytest.raises(ValueError, match="quantize_int8"):
        StagedRestorationPipeline(**pipeline_stages, config=cfg)


def test_stereo_mid_exact_staged_matches_batch(pipeline_stages, rng):
    """mid-exact mode must behave identically in staged serving."""
    import dataclasses
    from ml_audio_restoration_tpu.pipeline import StagedRestorationPipeline

    cfg = dataclasses.replace(
        PipelineConfig(chunk_seconds=0.25, overlap_seconds=0.02,
                       max_chunks_per_program=8),
        stereo_mid_exact=True)
    audio = (rng.normal(size=(1, 22050)) * 0.2).astype(np.float32)
    want, _ = RestorationPipeline(**pipeline_stages, config=cfg).restore(
        audio, 22050)
    got, _ = StagedRestorationPipeline(**pipeline_stages, config=cfg).restore(
        audio, 22050)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_slab_processing_matches_single_shot(pipeline_stages, rng):
    """Long recordings processed in bounded slabs must match the single-shot
    program (the slab crossfade is exact)."""
    import dataclasses

    audio = (rng.normal(size=(1, 30000)) * 0.2).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=2000 / 22050,
                         overlap_seconds=200 / 22050,
                         max_chunks_per_program=1000)
    stages = dict(denoiser=pipeline_stages["denoiser"])
    single = RestorationPipeline(**stages, config=cfg)
    slabbed = RestorationPipeline(**stages, config=dataclasses.replace(
        cfg, max_chunks_per_program=8))  # 17 chunks -> 3 slabs
    a, _ = single.restore(audio, 22050)
    b, _ = slabbed.restore(audio, 22050)
    assert np.asarray(b).shape == np.asarray(a).shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_restore_many_matches_individual(pipeline_stages, rng):
    """Coalesced multi-recording restore must equal per-recording restore:
    the stage stack is the same traced function and bucket-padding rows
    (including neighbor-recording overhang) carry zero crossfade weight."""
    cfg = PipelineConfig(sample_rate=8000, chunk_seconds=0.25,
                         overlap_seconds=0.05)
    pipe = RestorationPipeline(**pipeline_stages, config=cfg)
    lens = [1500, 4100, 9000, 2000, 2000]  # mixed chunk counts, one repeat
    audios = [(rng.normal(size=(1, t)) * 0.2).astype(np.float32)
              for t in lens]
    got = pipe.restore_many(audios)
    assert len(got) == len(audios)
    for a, (out, rate) in zip(audios, got):
        want, wrate = pipe.restore(a)
        assert rate == wrate
        assert np.asarray(out).shape == np.asarray(want).shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-6, rtol=0)


def test_restore_many_group_split_and_solo(pipeline_stages, rng):
    """Group capacity: recordings split across several coalesced programs
    when their combined chunk count exceeds max_chunks_per_program, and a
    recording too long to coalesce rides the single-recording slab path —
    all still matching individual restore."""
    cfg = PipelineConfig(sample_rate=8000, chunk_seconds=0.25,
                         overlap_seconds=0.05, max_chunks_per_program=8)
    pipe = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"], config=cfg)
    # chunk=2000 hop=1600: 4000->3 chunks, 6000->4, 24000->15 (solo: its
    # bucket 16 > 8), 2000->1
    lens = [4000, 6000, 24000, 2000]
    audios = [(rng.normal(size=(1, t)) * 0.2).astype(np.float32)
              for t in lens]
    got = pipe.restore_many(audios)
    for a, (out, rate) in zip(audios, got):
        want, _ = pipe.restore(a)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-6, rtol=0)
    assert pipe.restore_many([]) == []
    one = pipe.restore_many([audios[0]])
    np.testing.assert_allclose(np.asarray(one[0][0]),
                               np.asarray(got[0][0]), atol=0)


def test_restore_many_full_config_combos(pipeline_stages, rng):
    """Coalescing composes with the production serving config knobs
    (bf16 + sub-chunked stereo + mid-exact): still matches individual."""
    cfg = PipelineConfig(sample_rate=8000, chunk_seconds=0.25,
                         overlap_seconds=0.05, compute_dtype="bfloat16",
                         stereo_chunk_seconds=0.1, stereo_mid_exact=True)
    pipe = RestorationPipeline(**pipeline_stages, config=cfg)
    audios = [(rng.normal(size=(1, t)) * 0.2).astype(np.float32)
              for t in (3000, 5200)]
    got = pipe.restore_many(audios)
    for a, (out, _) in zip(audios, got):
        want, _ = pipe.restore(a)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-6, rtol=0)


@pytest.mark.slow
def test_restore_many_int8(pipeline_stages, rng):
    """Coalescing composes with int8 serving: scales auto-calibrate on the
    first recording (shared _ensure_int8) and the combined program runs the
    quantized stacks; with the SAME scales, coalesced == individual."""
    cfg = PipelineConfig(sample_rate=8000, chunk_seconds=0.25,
                         overlap_seconds=0.05, quantize_int8=True)
    pipe = RestorationPipeline(**pipeline_stages, config=cfg)
    audios = [(rng.normal(size=(1, t)) * 0.2).astype(np.float32)
              for t in (3000, 5200, 2000)]
    got = pipe.restore_many(audios)
    assert pipe._int8_scales is not None  # the quantized path engaged
    for a, (out, _) in zip(audios, got):
        want, _ = pipe.restore(a)  # same pipeline -> same scales
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-6, rtol=0)


@pytest.mark.slow
def test_staged_pipeline_matches_single_device(pipeline_stages):
    """Pipeline-parallel serving (one stage per device, slabs streamed
    through with device hops) must produce the single-device pipeline's
    output, with each stage resident on its own device."""
    import jax
    from ml_audio_restoration_tpu.pipeline import StagedRestorationPipeline

    cfg = PipelineConfig(chunk_seconds=0.25, overlap_seconds=0.02,
                         max_chunks_per_program=8)
    rng = np.random.default_rng(3)
    t = np.arange(int(5.3 * 22050)) / 22050
    audio = (0.3 * np.sin(2 * np.pi * 347 * t)
             + 0.02 * rng.normal(size=t.shape)).astype(np.float32)[None]

    plain = RestorationPipeline(**pipeline_stages, config=cfg)
    want, rate_w = plain.restore(audio, 22050)

    staged = StagedRestorationPipeline(**pipeline_stages, config=cfg)
    got, rate_g = staged.restore(audio, 22050)

    assert rate_g == rate_w
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)
    # three stages on three DIFFERENT devices
    devs = {name: next(iter(jax.tree_util.tree_leaves(tree)[0].devices()))
            for name, tree in staged.stage_params.items()}
    assert len(set(devs.values())) == 3


def test_packed_convs_match_plain_pipeline(pipeline_stages):
    """packed_convs=True (default) must equal the plain computation order on
    converted reference weights — the parity bar rides on this equivalence
    (ops/packed.py; VERDICT r02 item 1)."""
    import dataclasses

    rng = np.random.default_rng(11)
    audio = (rng.normal(size=(1, 22050 * 3)) * 0.1).astype(np.float32)
    for extra in ({}, {"stereo_chunk_seconds": 0.25},
                  {"stereo_mid_exact": True}):
        cfg = PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05, **extra)
        packed = RestorationPipeline(**pipeline_stages, config=cfg)
        plain = RestorationPipeline(
            **pipeline_stages,
            config=dataclasses.replace(cfg, packed_convs=False))
        out_p, rate_p = packed.restore(audio, 22050)
        out_s, rate_s = plain.restore(audio, 22050)
        assert rate_p == rate_s
        dev = float(np.abs(np.asarray(out_p) - np.asarray(out_s)).max())
        assert dev < 1e-5, (extra, dev)


def test_restore_directory_matches_restore_file(pipeline_stages, tmp_path):
    """The pipelined directory path (prefetch decode + deferred writes,
    VERDICT r02 item 8) must produce byte-identical files to sequential
    restore_file calls."""
    from ml_audio_restoration_tpu.audio import save_audio

    rng = np.random.default_rng(3)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):
        x = (rng.normal(size=(1, 22050 + 800 * i)) * 0.1).astype(np.float32)
        save_audio(in_dir / f"r{i}.wav", x, 22050)

    cfg = PipelineConfig(chunk_seconds=0.5, overlap_seconds=0.02)
    pipe = RestorationPipeline(**pipeline_stages, config=cfg)
    results = pipe.restore_directory(in_dir, tmp_path / "batch")
    assert len(results) == 3

    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    for i in range(3):
        pipe.restore_file(in_dir / f"r{i}.wav",
                          seq_dir / f"r{i}_restored.wav")
    # default coalesce=4: all three files rode ONE combined program
    for i in range(3):
        a = (tmp_path / "batch" / f"r{i}_restored.wav").read_bytes()
        b = (seq_dir / f"r{i}_restored.wav").read_bytes()
        assert a == b, f"file {i} differs (coalesced)"

    # coalesce=1: the legacy one-program-per-file path, same bytes
    results = pipe.restore_directory(in_dir, tmp_path / "solo", coalesce=1)
    assert len(results) == 3
    for i in range(3):
        a = (tmp_path / "solo" / f"r{i}_restored.wav").read_bytes()
        b = (seq_dir / f"r{i}_restored.wav").read_bytes()
        assert a == b, f"file {i} differs (coalesce=1)"


@pytest.mark.slow
def test_packed_convs_match_plain_bf16(pipeline_stages):
    """The packed paths must also be equivalent under the bf16 serving mode
    (the headline config): packed-vs-plain deviation stays an order below
    the bf16-vs-f32 deviation itself."""
    import dataclasses

    rng = np.random.default_rng(12)
    audio = (rng.normal(size=(1, 22050 * 2)) * 0.1).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05,
                         compute_dtype="bfloat16")
    packed = RestorationPipeline(**pipeline_stages, config=cfg)
    plain = RestorationPipeline(
        **pipeline_stages, config=dataclasses.replace(cfg,
                                                      packed_convs=False))
    out_p, _ = packed.restore(audio, 22050)
    out_s, _ = plain.restore(audio, 22050)
    dev = float(np.abs(np.asarray(out_p) - np.asarray(out_s)).max())
    assert dev < 2e-4, dev  # bf16 rounding noise, well under the 1e-3 bar


def test_subchunked_fast_serve_uses_legacy_decoder(pipeline_stages,
                                                   monkeypatch):
    """The fast_serve HEADLINE combination — bf16 + sub-chunked stereo
    windows, packed stereo gated off — must run the legacy two-stack
    decode, NOT the plain-layout grouped decoder (measured 8% slower
    there: profile_serve_ablate.py fast_serve 118.1 vs fast_serve_ungrouped
    109.3 ms — docs/PERFORMANCE.md "Grouped dual decoders"), and must stay
    within bf16 rounding of the packed_convs=False path."""
    import dataclasses

    from ml_audio_restoration_tpu.models import stereo_separator as st_mod

    def boom(*a, **k):
        raise AssertionError("plain-layout grouped decoder used")

    monkeypatch.setattr(st_mod, "decode_grouped", boom)
    monkeypatch.setattr(st_mod, "apply_grouped", boom)
    rng = np.random.default_rng(13)
    audio = (rng.normal(size=(1, 22050 * 2)) * 0.1).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05,
                         stereo_chunk_seconds=0.25,
                         compute_dtype="bfloat16")
    fast = RestorationPipeline(**pipeline_stages, config=cfg)
    legacy = RestorationPipeline(
        **pipeline_stages, config=dataclasses.replace(cfg,
                                                      packed_convs=False))
    out_f, _ = fast.restore(audio, 22050)
    out_l, _ = legacy.restore(audio, 22050)
    dev = float(np.abs(np.asarray(out_f) - np.asarray(out_l)).max())
    assert dev < 2e-4, dev


def test_staged_subchunked_never_uses_plain_grouped_decoder(pipeline_stages,
                                                            monkeypatch):
    """Staged serving at sub-chunked stereo windows must run the same
    two-stack plain decode as the fused pipeline — the plain-layout grouped
    decoder measured slower everywhere (docs/PERFORMANCE.md) and would also
    break staged's bit-identical-to-plain contract. Regression guard for
    the gate that f65412e applied to restore.py/streaming.py."""
    import dataclasses

    from ml_audio_restoration_tpu.models import stereo_separator as st_mod
    from ml_audio_restoration_tpu.pipeline import StagedRestorationPipeline

    def boom(*a, **k):
        raise AssertionError("plain-layout grouped decoder used")

    monkeypatch.setattr(st_mod, "decode_grouped", boom)
    monkeypatch.setattr(st_mod, "apply_grouped", boom)
    rng = np.random.default_rng(17)
    audio = (rng.normal(size=(1, 22050)) * 0.1).astype(np.float32)
    cfg = PipelineConfig(chunk_seconds=0.25, overlap_seconds=0.02,
                         stereo_chunk_seconds=0.1, max_chunks_per_program=8)
    want, _ = RestorationPipeline(**pipeline_stages, config=cfg).restore(
        audio, 22050)
    got, _ = StagedRestorationPipeline(**pipeline_stages, config=cfg).restore(
        audio, 22050)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_sequence_parallel_whole_file_matches_single(pipeline_stages):
    """whole_file serving with the TIME axis sharded over the 'model' mesh
    axis (sequence parallelism: XLA conv halo exchanges + gather before the
    LSTM) must match the unsharded whole-file output."""
    import dataclasses

    from ml_audio_restoration_tpu.parallel import make_mesh

    rng = np.random.default_rng(13)
    audio = (rng.normal(size=(1, 22050)) * 0.1).astype(np.float32)
    cfg = PipelineConfig(whole_file=True)
    single = RestorationPipeline(**pipeline_stages, config=cfg)
    want, rate = single.restore(audio, 22050)
    seq = RestorationPipeline(
        **pipeline_stages, config=dataclasses.replace(cfg),
        mesh=make_mesh(data_parallel=1, model_parallel=8))
    got, rate2 = seq.restore(audio, 22050)
    assert rate == rate2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_restore_inputs_shorter_than_one_chunk(pipeline_stages):
    """Files shorter than chunk_seconds (even a single sample) must restore
    to finite stereo output at 2x length — the tail-padding path with
    n_chunks == 1."""
    rng = np.random.default_rng(5)
    pipe = RestorationPipeline(
        **pipeline_stages,
        config=PipelineConfig(chunk_seconds=2.0, overlap_seconds=0.05))
    for n in (1, 100):
        audio = (rng.normal(size=(1, n)) * 0.1).astype(np.float32)
        out, rate = pipe.restore(audio)
        assert out.shape == (2, 2 * n) and rate == 44100
        assert np.isfinite(np.asarray(out)).all()


def test_restore_many_group_cap_counts_bucketed_coverage(pipeline_stages,
                                                         rng):
    """Group packing must cap on the BUCKETED coverage, not the raw chunk
    sum: a [5, 2]-chunk pair at max_chunks_per_program=8 needs
    n_total = bucket(offset_5 + bucket(2)) = 12 rows to cover the second
    recording's bucketed slice, so coalescing them would bust the slab
    cap (and compile a chunk program warmup never covers). Outputs must
    still match individual restores."""
    cfg = PipelineConfig(sample_rate=8000, chunk_seconds=0.25,
                         overlap_seconds=0.05, max_chunks_per_program=8)
    pipe = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"], config=cfg)
    # chunk=2000 hop=1600: 8400 -> 5 chunks (bucket 8), 3600 -> 2 (bucket 4)
    audios = [(rng.normal(size=(1, t)) * 0.2).astype(np.float32)
              for t in (8400, 3600)]
    got = pipe.restore_many(audios)
    for a, (out, _) in zip(audios, got):
        want, _ = pipe.restore(a)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-6, rtol=0)
    big = [k[1] for k in pipe._compiled if k[0] == "chunks"]
    assert all(n <= 8 for n in big), \
        f"coalesced chunk program exceeds max_chunks_per_program: {big}"


def test_mesh_change_selects_new_programs(pipeline_stages, rng):
    """`pipe.mesh` is assigned post-construction by the CLI, and compiled
    processors close over it for sharding constraints — changing the mesh
    must compile a NEW program (not silently reuse the unsharded one) and
    still produce the same output."""
    from ml_audio_restoration_tpu.parallel import make_mesh

    cfg = PipelineConfig(sample_rate=8000, chunk_seconds=0.25,
                         overlap_seconds=0.05)
    pipe = RestorationPipeline(
        denoiser=pipeline_stages["denoiser"], config=cfg)
    # 13200 @ chunk 2000 / hop 1600 -> n_real 8: bucketed chunk count is 8
    # under BOTH gran 4 (no mesh) and gran 8 (8-way mesh), so only the
    # mesh term of the cache key distinguishes the two programs
    audio = (rng.normal(size=(1, 13200)) * 0.2).astype(np.float32)
    a, _ = pipe.restore(audio)
    n_before = sum(1 for k in pipe._compiled if k[0] == "rec")
    pipe.mesh = make_mesh(data_parallel=8)
    b, _ = pipe.restore(audio)
    n_after = sum(1 for k in pipe._compiled if k[0] == "rec")
    assert n_after == n_before + 1, \
        "mesh change silently reused an unsharded program"
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-4)


def test_staged_chunk_count_is_bucketed(pipeline_stages):
    """Staged serving buckets its slab size like the plain pipeline:
    nearby clip lengths share one compiled shape instead of recompiling
    every stage program per distinct length, and bucket padding is masked
    out (output still matches the plain pipeline)."""
    from ml_audio_restoration_tpu.pipeline import StagedRestorationPipeline

    cfg = PipelineConfig(sample_rate=8000, chunk_seconds=0.25,
                         overlap_seconds=0.05, max_chunks_per_program=16)
    plain = RestorationPipeline(**pipeline_stages, config=cfg)
    staged = StagedRestorationPipeline(**pipeline_stages, config=cfg)
    rng = np.random.default_rng(9)
    # chunk=2000 hop=1600 -> 9, 10, 11 chunks: one bucket (12)
    for n in (9, 10, 11):
        t = 2000 + (n - 1) * 1600
        audio = (rng.normal(size=(1, t)) * 0.2).astype(np.float32)
        want, _ = plain.restore(audio, 8000)
        got, _ = staged.restore(audio, 8000)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)
    frames = {k[1] for k in staged._compiled if k[0] == "frame"}
    assert frames == {12}, f"expected one bucketed slab shape, got {frames}"


def test_stereo_sub_cfg_uses_effective_rate():
    """The seconds-denominated stereo sub-window must be sized at the rate
    of the audio actually flowing through the stage, not blindly at
    config.sample_rate."""
    from ml_audio_restoration_tpu.pipeline.restore import stereo_sub_cfg

    cfg = PipelineConfig(sample_rate=22050, stereo_chunk_seconds=0.25,
                         overlap_seconds=0.02)
    base = stereo_sub_cfg(cfg, stage_len=10 ** 9, f=2)
    same = stereo_sub_cfg(cfg, stage_len=10 ** 9, f=2, sample_rate=22050)
    doubled = stereo_sub_cfg(cfg, stage_len=10 ** 9, f=2, sample_rate=44100)
    assert same == base
    assert abs(doubled[0] - 2 * base[0]) <= 4  # packing-grid rounding


def test_pipeline_rejects_training_lstm_impl():
    """Regression (ADVICE r04): PipelineConfig.lstm_impl was never
    validated — 'pallas_train' (the training kernel, which materializes
    acts+cell-seq residuals at ~5x the output HBM traffic) or any typo
    would flow silently into serving. The pipeline must reject anything
    outside {None, 'scan', 'pallas'} at construction."""
    import pytest as _pytest

    from ml_audio_restoration_tpu.pipeline import RestorationPipeline

    for bad in ("pallas_train", "palas", "auto "):
        with _pytest.raises(ValueError, match="lstm_impl"):
            RestorationPipeline(config=PipelineConfig(lstm_impl=bad))
    for ok in (None, "scan", "pallas"):
        RestorationPipeline(config=PipelineConfig(lstm_impl=ok))


def test_apply_stereo_small_batch_falls_back_from_pallas():
    """lstm_impl='pallas' below an effective LSTM batch of 8 (whole-file
    parity mode serves ONE chunk) must fall back to the scan: the kernel
    pads batch to 8, which would multiply the gates-buffer traffic up to
    8x — and on CPU the Mosaic kernel cannot run at all, so this test
    passing IS the proof the fallback routed (restore.py::apply_stereo)."""
    import jax

    from ml_audio_restoration_tpu.models import stereo_separator
    from ml_audio_restoration_tpu.pipeline.restore import apply_stereo

    st = stereo_separator.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.normal(size=(1, 4096, 1)) * 0.2).astype(np.float32))
    want = apply_stereo(st, x, None, lstm_impl="auto")
    got = apply_stereo(st, x, None, lstm_impl="pallas")  # batch 1 -> scan
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
