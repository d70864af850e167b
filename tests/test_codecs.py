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
