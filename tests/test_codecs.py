"""mp3/ogg codec tests (system libmpg123/libvorbisfile via ctypes) — the
last two containers of the reference's wav/mp3/flac/ogg set
(/root/reference/src/utils/audio_processing.py:23-30). Lossy codecs are
checked by correlation, seek reads by consistency with the full decode."""
import numpy as np
import pytest

from ml_audio_restoration_tpu.audio import codecs


@pytest.fixture(scope="module")
def signal():
    sr = 44100
    t = np.arange(sr * 1) / sr
    sig = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                    0.4 * np.sin(2 * np.pi * 660 * t)],
                   axis=1).astype(np.float32)
    return sig, sr


@pytest.mark.skipif(not codecs.mp3_available(), reason="libmpg123 missing")
class TestMp3:
    def test_roundtrip_and_seek(self, tmp_path, signal):
        sig, sr = signal
        p = tmp_path / "a.mp3"
        assert codecs.write_mp3(p, sig, sr)
        got, gsr = codecs.read_mp3(p)
        assert gsr == sr and got.shape[1] == 2
        # lossy + codec delay: align by cross-correlation, then demand
        # near-perfect correlation on a sine mixture
        a, b = sig[:, 0], got[:, 0]
        lag = int(np.argmax(np.correlate(b[:20000], a[:4000], "valid")))
        n = 30000
        corr = np.corrcoef(a[:n], b[lag:lag + n])[0, 1]
        assert corr > 0.99
        part, _ = codecs.read_mp3(p, start=10000, frames=500)
        np.testing.assert_array_equal(part, got[10000:10500])

    def test_load_audio_dispatch(self, tmp_path, signal):
        from ml_audio_restoration_tpu.audio import load_audio

        sig, sr = signal
        p = tmp_path / "a.mp3"
        codecs.write_mp3(p, sig, sr)
        audio, gsr = load_audio(p, sample_rate=sr, mono=True)
        assert gsr == sr and audio.shape[0] == 1
        assert np.isfinite(audio).all() and np.abs(audio).max() > 0.05


@pytest.mark.skipif(not codecs.ogg_available(), reason="libvorbisfile missing")
class TestOgg:
    def test_roundtrip_and_seek(self, tmp_path, signal):
        sig, sr = signal
        p = tmp_path / "a.ogg"
        assert codecs.write_ogg(p, sig, sr)
        got, gsr = codecs.read_ogg(p)
        assert gsr == sr and got.shape[1] == 2
        n = min(got.shape[0], sig.shape[0])
        corr = np.corrcoef(sig[:n, 0], got[:n, 0])[0, 1]
        assert corr > 0.99
        part, _ = codecs.read_ogg(p, start=10000, frames=500)
        np.testing.assert_allclose(part, got[10000:10500], atol=1e-6)

    def test_load_audio_dispatch(self, tmp_path, signal):
        from ml_audio_restoration_tpu.audio import load_audio

        sig, sr = signal
        p = tmp_path / "a.ogg"
        codecs.write_ogg(p, sig, sr)
        audio, gsr = load_audio(p, sample_rate=22050, mono=True)
        assert gsr == 22050 and audio.shape[0] == 1
        assert np.isfinite(audio).all()


class TestGracefulAbsence:
    def test_read_returns_none_without_libs(self, tmp_path, monkeypatch):
        monkeypatch.setattr(codecs, "_load_mpg123", lambda: None)
        monkeypatch.setattr(codecs, "_load_vorbisfile", lambda: None)
        (tmp_path / "x.mp3").write_bytes(b"\xff\xfb\x00\x00")
        assert codecs.read(tmp_path / "x.mp3") is None

    def test_load_audio_raises_clear_error(self, tmp_path, monkeypatch):
        from ml_audio_restoration_tpu.audio import load_audio

        monkeypatch.setattr(codecs, "read", lambda *a, **k: None)
        (tmp_path / "x.ogg").write_bytes(b"OggS")
        with pytest.raises(ValueError, match="libmpg123/libvorbisfile"):
            load_audio(tmp_path / "x.ogg")


def test_encode_wav_riff_size_includes_pad_byte():
    """Odd-length payloads (PCM_24 mono, odd frame count) get a word-
    alignment pad byte; the RIFF container size must include it or strict
    parsers see a 1-byte-short container."""
    import struct

    from ml_audio_restoration_tpu.audio.wav import encode_wav, decode_wav

    x = (np.sin(np.arange(1001) / 50.0) * 0.5).astype(np.float32)[:, None]
    buf = encode_wav(x, 22050, subtype="PCM_24")
    riff_size = struct.unpack("<I", buf[4:8])[0]
    assert len(buf) % 2 == 0  # padded
    assert riff_size == len(buf) - 8  # container size covers the pad
    got, rate = decode_wav(buf)
    assert rate == 22050 and got.shape == (1001, 1)


def test_wav_header_odd_fmt_chunk_and_corrupt_fields():
    """An odd-sized fmt chunk is word-aligned like every other RIFF chunk
    (else every later chunk parses desynced); zero channels/bits and
    nonstandard float widths raise WAV-format errors, not
    ZeroDivisionError / numpy dtype errors."""
    import io
    import struct

    from ml_audio_restoration_tpu.audio.wav import _parse_header, decode_wav

    def wav_bytes(fmt_payload, data=b"\x00\x00"):
        fmt_chunk = struct.pack("<4sI", b"fmt ", len(fmt_payload)) + \
            fmt_payload + (b"\x00" if len(fmt_payload) & 1 else b"")
        data_chunk = struct.pack("<4sI", b"data", len(data)) + data
        body = fmt_chunk + data_chunk
        return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body

    # 17-byte fmt chunk (odd): parser must skip the pad and find data
    base = struct.pack("<HHIIHH", 1, 1, 22050, 44100, 2, 16)
    info = _parse_header(io.BytesIO(wav_bytes(base + b"\x00")))
    assert info.frames == 1 and info.channels == 1

    # channels=0 -> format error, not ZeroDivisionError
    bad = struct.pack("<HHIIHH", 1, 0, 22050, 0, 0, 16)
    with pytest.raises(ValueError, match="invalid WAV fmt"):
        _parse_header(io.BytesIO(wav_bytes(bad)))

    # IEEE float with bits=16 -> unsupported format, not a float16 decode
    f16 = struct.pack("<HHIIHH", 3, 1, 22050, 44100, 2, 16)
    with pytest.raises(ValueError, match="unsupported WAV format"):
        decode_wav(wav_bytes(f16))


def test_save_audio_never_mislabels_containers(tmp_path):
    """save_audio('x.mp3'/'x.ogg') must either produce a real mp3/ogg that
    load_audio reads back, or raise — never write RIFF bytes under a lossy
    extension."""
    from ml_audio_restoration_tpu.audio import load_audio, save_audio

    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(22050) / 22050)
         ).astype(np.float32)[None]
    for ext in ("mp3", "ogg"):
        path = tmp_path / f"out.{ext}"
        try:
            save_audio(path, x, 22050)
        except ValueError:
            assert not path.exists() or path.stat().st_size == 0
            continue
        magic = path.read_bytes()[:4]
        assert magic != b"RIFF", f"{ext}: WAV bytes under a lossy extension"
        got, sr = load_audio(path, sample_rate=22050)
        assert sr == 22050 and got.shape[0] == 1
        # lossy codecs pad/delay; just require substantial overlap
        assert got.shape[1] > 20000


def test_load_audio_chunk_randomizes_window_for_full_decodes(tmp_path):
    """Formats without a cheap frame-count probe (mp3/ogg) decode whole
    and must then take a RANDOM window — cropping at the start would
    train on the first chunk of every file, every epoch."""
    from ml_audio_restoration_tpu.audio import save_audio
    from ml_audio_restoration_tpu.audio.io import load_audio_chunk

    if not codecs.ogg_available():
        pytest.skip("libvorbis missing")
    # a 5-s ramp makes window position recoverable from sample values
    sr = 22050
    ramp = (np.linspace(-0.9, 0.9, 5 * sr)).astype(np.float32)[None]
    path = tmp_path / "ramp.ogg"
    try:
        save_audio(path, ramp, sr)
    except ValueError:
        pytest.skip("no ogg encoder")

    chunks = [load_audio_chunk(path, 2048, np.random.default_rng(seed), sr)
              for seed in (1, 2, 3, 4)]
    assert all(c.shape == (1, 2048) for c in chunks)
    starts = {round(float(c[0, 0]), 3) for c in chunks}
    assert len(starts) > 1, "every seed returned the same (start) window"
