"""Native C++ WAV codec tests (skipped when the toolchain is unavailable)."""
import numpy as np
import pytest

from ml_audio_restoration_tpu.audio import native, read_wav, write_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


@pytest.fixture
def wav_file(tmp_path, rng):
    x = rng.uniform(-0.8, 0.8, (5000, 2)).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, x, 22050, subtype="PCM_24")
    return path, x


def test_info_matches_numpy(wav_file):
    path, x = wav_file
    meta = native.info(path)
    assert meta["sample_rate"] == 22050
    assert meta["channels"] == 2
    assert meta["frames"] == 5000
    assert meta["bits"] == 24


def test_read_bit_identical_to_numpy(wav_file):
    path, _ = wav_file
    got, sr = native.read(path)
    ref, _ = read_wav(path)
    np.testing.assert_array_equal(got, ref)


def test_partial_and_mono_reads(wav_file):
    path, _ = wav_file
    ref, _ = read_wav(path)
    part, _ = native.read(path, start=100, frames=50)
    np.testing.assert_array_equal(part, ref[100:150])
    mono, _ = native.read(path, mono=True)
    np.testing.assert_allclose(mono, ref.mean(axis=1), atol=1e-7)


def test_batch_mono_read_and_padding(wav_file, tmp_path, rng):
    path, _ = wav_file
    ref, _ = read_wav(path)
    batch = native.read_batch_mono([path, path, path], [0, 100, 4950], 200)
    assert batch.shape == (3, 200)
    np.testing.assert_allclose(batch[0], ref[:200].mean(1), atol=1e-7)
    np.testing.assert_allclose(batch[1], ref[100:300].mean(1), atol=1e-7)
    # short read zero-padded
    np.testing.assert_allclose(batch[2][:50], ref[4950:].mean(1), atol=1e-7)
    assert np.all(batch[2][50:] == 0)


def test_write_pcm16_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, (1000, 2)).astype(np.float32)
    path = tmp_path / "w.wav"
    assert native.write_pcm16(path, x, 44100)
    back, sr = read_wav(path)
    assert sr == 44100
    np.testing.assert_allclose(back, x, atol=4e-5)


def test_bad_file_returns_none(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFxxxxWAVE")
    assert native.info(bad) is None
    assert native.read(bad) is None


def test_truncated_fmt_chunk_rejected(tmp_path):
    """A fmt chunk shorter than 16 bytes must be rejected, not read past its
    end (untrusted scraper downloads hit this parser; round-1 advisory)."""
    import struct

    bad = tmp_path / "shortfmt.wav"
    fmt_payload = struct.pack("<HH", 1, 1)  # csize=4: fmt tag + channels only
    data_payload = b"\x00\x00" * 8
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
            + b"data" + struct.pack("<I", len(data_payload)) + data_payload)
    bad.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert native.info(bad) is None
    assert native.read(bad) is None
    with pytest.raises(Exception):
        read_wav(bad)  # numpy fallback must reject it too


def test_mutation_fuzz_never_crashes(tmp_path, rng, wav_file):
    """Random single-byte mutations of a valid WAV must decode, return None
    (native), or raise cleanly (numpy fallback) — never read out of bounds
    or hang. Complements the FLAC mutation fuzz; scraper downloads are
    untrusted input."""
    path, _ = wav_file
    raw = path.read_bytes()
    bad = tmp_path / "fuzz.wav"
    for _ in range(60):
        m = bytearray(raw)
        pos = int(rng.integers(0, len(m)))
        m[pos] ^= int(rng.integers(1, 256))
        bad.write_bytes(bytes(m))
        native.info(bad)
        native.read(bad)
        try:
            read_wav(bad)
        except Exception:
            pass


def test_dataset_batch_path_matches_per_item(tmp_path, rng):
    """getitems (native batch) must agree with per-item __getitem__ stats."""
    from ml_audio_restoration_tpu.data import RestorationDataset
    from ml_audio_restoration_tpu.audio import save_audio

    d = tmp_path / "raw"
    for i in range(4):
        t = np.arange(22050) / 22050.0
        save_audio(d / f"f{i}.wav",
                   (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(
                       np.float32)[None], 22050)
    ds = RestorationDataset(d, chunk_duration=0.5)
    items = ds.getitems([0, 1, 2, 3])
    assert len(items) == 4
    for it in items:
        assert it["clean"].shape == (1, 11025)
        rms = float(np.sqrt((it["clean"] ** 2).mean()))
        assert 0.05 < rms < 0.3  # -20 dB normalize applied


def test_dataset_batch_path_short_file_gain_matches_per_item(tmp_path):
    """A file SHORTER than the chunk must get the same -20 dB gain on the
    native batch path as on the per-item path: _chunk normalizes over the
    true length BEFORE padding, so getitems must not average the zero pad
    into the RMS."""
    from ml_audio_restoration_tpu.data import RestorationDataset
    from ml_audio_restoration_tpu.audio import save_audio

    d = tmp_path / "raw"
    t = np.arange(5000) / 22050.0  # 5000 frames << 0.5 s chunk (11025)
    save_audio(d / "short.wav",
               (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None],
               22050)
    ds = RestorationDataset(d, chunk_duration=0.5)
    batch_item = ds.getitems([0])[0]["clean"]
    per_item = RestorationDataset(d, chunk_duration=0.5)[0]["clean"]
    assert batch_item.shape == per_item.shape == (1, 11025)
    np.testing.assert_allclose(batch_item, per_item, atol=2e-4)
    # gain really is -20 dB over the REAL samples
    rms = float(np.sqrt((batch_item[:, :5000] ** 2).mean()))
    assert abs(rms - 0.1) < 0.01
