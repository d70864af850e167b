"""Artifact-simulator and dataset/loader tests (statistical + structural)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ml_audio_restoration_tpu.config import ArtifactConfig
from ml_audio_restoration_tpu.data import (
    simulate_vinyl_artifacts,
    simulate_batch,
    RestorationDataset,
    StereoDataset,
    SuperResolutionDataset,
    MixedRestorationDataset,
    DataLoader,
    train_val_split,
)
from ml_audio_restoration_tpu.audio import save_audio
from ml_audio_restoration_tpu.audio.analyze import detect_impulses_analytical

SR = 22050


@pytest.fixture
def clean_sine():
    t = np.arange(4 * SR) / SR
    return (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]


def _band_energy(x, sample_rate, f_lo, f_hi):
    spec = np.abs(np.fft.rfft(np.asarray(x)[0])) ** 2
    freqs = np.fft.rfftfreq(x.shape[-1], 1 / sample_rate)
    return spec[(freqs >= f_lo) & (freqs < f_hi)].sum()


class TestArtifactSimulator:
    def test_deterministic_under_key(self, clean_sine):
        key = jax.random.PRNGKey(3)
        a = simulate_vinyl_artifacts(key, jnp.asarray(clean_sine), SR)
        b = simulate_vinyl_artifacts(key, jnp.asarray(clean_sine), SR)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_jit_and_vmap(self, clean_sine):
        batch = jnp.asarray(np.repeat(clean_sine[None], 3, axis=0))
        fn = jax.jit(lambda k, x: simulate_batch(k, x, SR))
        out = fn(jax.random.PRNGKey(0), batch)
        assert out.shape == batch.shape
        assert np.isfinite(np.asarray(out)).all()
        # items get distinct keys
        assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))

    def test_impulse_rate_statistics(self, clean_sine):
        """Detected impulse rate should reflect the configured pop rate."""
        rates = []
        for seed in range(4):
            degraded = simulate_vinyl_artifacts(
                jax.random.PRNGKey(seed), jnp.asarray(clean_sine), SR,
                ArtifactConfig(impulse_rate=25.0))
            _, _, stats = detect_impulses_analytical(np.asarray(degraded), SR)
            rates.append(stats["impulses_per_second"])
        # detector picks crackle too; rate must scale with pops (>= ~60% of 25)
        assert np.mean(rates) > 10.0

    def test_rolloff_removes_high_frequencies(self, clean_sine):
        cfg_no = ArtifactConfig(add_rolloff=False, add_rumble=False,
                                impulse_rate=0.0,
                                surface_noise_level=(0.05, 0.05),
                                crackle_level=(1e-6, 1e-6))
        cfg_yes = ArtifactConfig(add_rolloff=True, add_rumble=False,
                                 impulse_rate=0.0,
                                 surface_noise_level=(0.05, 0.05),
                                 crackle_level=(1e-6, 1e-6))
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(clean_sine)
        flat = simulate_vinyl_artifacts(key, x, SR, cfg_no)
        rolled = simulate_vinyl_artifacts(key, x, SR, cfg_yes)
        # energy above 9 kHz should drop by >10x after the 6-8 kHz rolloff
        hi_flat = _band_energy(flat, SR, 9000, 11000)
        hi_rolled = _band_energy(rolled, SR, 9000, 11000)
        assert hi_rolled < hi_flat / 10.0

    def test_crackle_is_high_frequency(self, clean_sine):
        cfg = ArtifactConfig(add_rolloff=False, add_rumble=False,
                             impulse_rate=0.0,
                             surface_noise_level=(1e-6, 1e-6),
                             crackle_level=(0.05, 0.05))
        out = simulate_vinyl_artifacts(jax.random.PRNGKey(1),
                                       jnp.asarray(clean_sine), SR, cfg)
        added = np.asarray(out) - clean_sine
        lo = _band_energy(added[None][0], SR, 100, 2000)
        hi = _band_energy(added[None][0], SR, 3000, 10000)
        assert hi > 10 * lo

    def test_rumble_is_low_frequency(self, clean_sine):
        cfg = ArtifactConfig(add_rolloff=False, add_rumble=True,
                             impulse_rate=0.0,
                             surface_noise_level=(1e-6, 1e-6),
                             crackle_level=(1e-6, 1e-6),
                             rumble_level=(0.05, 0.05))
        out = simulate_vinyl_artifacts(jax.random.PRNGKey(1),
                                       jnp.asarray(clean_sine), SR, cfg)
        added = np.asarray(out) - clean_sine
        lo = _band_energy(added[None][0], SR, 0, 100)
        hi = _band_energy(added[None][0], SR, 500, 10000)
        assert lo > 10 * hi

    def test_adaptive_overrides_traced(self, clean_sine):
        """Per-item traced parameters (the adaptive dataset path) jit-compile."""
        x = jnp.asarray(clean_sine)

        @jax.jit
        def run(key, rate, amp, noise):
            return simulate_vinyl_artifacts(
                key, x, SR, overrides={
                    "impulse_rate": rate,
                    "impulse_amplitude_max": amp,
                    "noise_level": noise,
                })

        out = run(jax.random.PRNGKey(0), jnp.float32(20.0), jnp.float32(0.4),
                  jnp.float32(0.03))
        assert np.isfinite(np.asarray(out)).all()
        quiet = run(jax.random.PRNGKey(0), jnp.float32(1.0), jnp.float32(0.1),
                    jnp.float32(0.005))
        loud = run(jax.random.PRNGKey(0), jnp.float32(45.0), jnp.float32(0.5),
                   jnp.float32(0.08))
        err_quiet = np.abs(np.asarray(quiet) - clean_sine).mean()
        err_loud = np.abs(np.asarray(loud) - clean_sine).mean()
        assert err_loud > 2 * err_quiet


@pytest.fixture
def wav_dir(tmp_path, rng):
    d = tmp_path / "raw"
    for i in range(6):
        t = np.arange(3 * SR) / SR
        mono = (0.4 * np.sin(2 * np.pi * (200 + 100 * i) * t)).astype(
            np.float32)
        stereo = np.stack([mono, mono * 0.5])
        save_audio(d / f"s{i}.wav", stereo, SR)
    return d


class TestDatasets:
    def test_restoration_dataset(self, wav_dir):
        ds = RestorationDataset(wav_dir, chunk_duration=1.0)
        assert len(ds) == 6
        item = ds[0]
        assert item["clean"].shape == (1, SR)
        rms = np.sqrt((item["clean"] ** 2).mean())
        assert 0.05 < rms < 0.3  # -20 dB normalize

    def test_stereo_dataset(self, wav_dir):
        ds = StereoDataset(wav_dir, chunk_duration=1.0)
        item = ds[1]
        assert item["stereo"].shape == (2, SR)

    def test_super_resolution_dataset(self, wav_dir):
        ds = SuperResolutionDataset(wav_dir, chunk_duration=0.5)
        item = ds[2]
        assert item["high"].shape == (1, int(0.5 * 44100))

    def test_mixed_dataset_all_synthetic(self, wav_dir):
        ds = MixedRestorationDataset(wav_dir, None, chunk_duration=0.5)
        item = ds[0]
        assert item["is_synthetic"] == 1.0
        assert item["audio"].shape == (1, int(0.5 * SR))

    def test_mixed_dataset_with_real(self, wav_dir, tmp_path):
        real_dir = tmp_path / "real"
        t = np.arange(SR) / SR
        save_audio(real_dir / "r.wav",
                   (0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None],
                   SR)
        ds = MixedRestorationDataset(wav_dir, real_dir, chunk_duration=0.5,
                                     synthetic_ratio=0.5)
        flags = [ds[i]["is_synthetic"] for i in range(len(ds))]
        assert sum(flags) == 3  # 50% of 6
        assert len(flags) - sum(flags) == 3

    def test_loader_shapes_and_split(self, wav_dir):
        ds = RestorationDataset(wav_dir, chunk_duration=0.5)
        tr, va = train_val_split(ds, 1 / 3, seed=0)
        assert len(tr) == 4 and len(va) == 2
        loader = DataLoader(ds, batch_size=2, indices=tr, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["clean"].shape == (2, 1, int(0.5 * SR))

    def test_resample_chunks_opt_in(self, tmp_path):
        """A 2x-rate file in the corpus: default keeps the upstream quirk
        (native-rate seek chunk + warning); resample_chunks=True yields a
        correctly-resampled chunk with no warning. Plumbed through
        ChunkDataset -> load_audio_chunk (DataConfig.resample_chunks)."""
        import warnings

        d = tmp_path / "mixed_rate"
        t = np.arange(3 * 2 * SR) / (2 * SR)  # 3 s at 2x the corpus rate
        save_audio(d / "hi.wav",
                   (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None],
                   2 * SR)

        ds = RestorationDataset(d, sample_rate=SR, chunk_duration=1.0)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            item = ds[0]
        assert any("native rate" in str(w.message) or "file rate"
                   in str(w.message) for w in caught)
        # quirk behavior: chunk_size frames of NATIVE-rate audio — 1 s of
        # output covers only 0.5 s of source, so the 440 Hz tone reads as
        # 220 Hz in the corpus timebase
        assert item["clean"].shape == (1, SR)

        ds2 = RestorationDataset(d, sample_rate=SR, chunk_duration=1.0,
                                 resample_chunks=True)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            item2 = ds2[0]
        assert not caught
        assert item2["clean"].shape == (1, SR)
        # the resampled chunk preserves the true pitch: dominant bin at
        # 440 Hz, vs 220 Hz on the quirk path
        def peak_hz(x):
            spec = np.abs(np.fft.rfft(x[0]))
            return np.fft.rfftfreq(x.shape[-1], 1 / SR)[int(np.argmax(spec))]

        assert abs(peak_hz(item2["clean"]) - 440) < 5
        assert abs(peak_hz(item["clean"]) - 220) < 5

    def test_loader_propagates_errors(self, wav_dir):
        class Broken(RestorationDataset):
            getitems = None  # force the per-item path

            def __getitem__(self, idx):
                raise RuntimeError("boom")

        ds = Broken(wav_dir, chunk_duration=0.5)
        with pytest.raises(RuntimeError, match="boom"):
            list(DataLoader(ds, batch_size=2))


def test_compare_synthetic_vs_real(tmp_path, clean_sine):
    """The analytics workflow that validates the simulator against a real
    recording (analyze_impulses.py:245-291): runs end-to-end and reports
    impulse rates for both sides."""
    from ml_audio_restoration_tpu.audio import save_audio
    from ml_audio_restoration_tpu.audio.analyze import compare_synthetic_vs_real

    # a "real" degraded recording = clean + simulated artifacts on disk
    degraded = simulate_vinyl_artifacts(jax.random.PRNGKey(5),
                                        jnp.asarray(clean_sine), SR)
    real_path = tmp_path / "real.wav"
    save_audio(real_path, np.asarray(degraded), SR)

    result = compare_synthetic_vs_real(real_path, clean_sine, SR)
    assert result["real"]["impulse_stats"]["num_impulses"] >= 0
    assert "impulses_per_second" in result["synthetic"]


def test_mixed_dataset_contrastive_pairs(tmp_path, wav_dir):
    real_dir = tmp_path / "real"
    t = np.arange(SR) / SR
    save_audio(real_dir / "r.wav",
               (0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None],
               SR)
    ds = MixedRestorationDataset(wav_dir, real_dir, chunk_duration=0.5,
                                 synthetic_ratio=0.5, use_contrastive=True)
    syn = ds[0]
    real = ds[len(ds) - 1]
    assert syn["is_synthetic"] == 1.0 and real["is_synthetic"] == 0.0
    for item in (syn, real):
        assert item["contrastive_pair"].shape == item["audio"].shape
        assert item["contrastive_label"] == 0.0
    # pairs are opposite-type
    assert syn["contrastive_pair_is_synthetic"] == 0.0
    assert real["contrastive_pair_is_synthetic"] == 1.0


def test_loader_unstarted_iterator_starts_no_thread(wav_dir):
    """iter(loader) alone must not start the prefetch worker: an iterator
    that is never advanced never runs the generator body (so its finally/
    stop flag never fires), and an eagerly-started worker would spin on the
    bounded queue forever."""
    import threading

    ds = RestorationDataset(wav_dir, chunk_duration=0.5)
    loader = DataLoader(ds, batch_size=2)
    before = threading.active_count()
    it = iter(loader)
    assert threading.active_count() == before
    batch = next(it)  # first advance starts the worker and yields
    assert batch["clean"].shape[0] == 2
    it.close()
