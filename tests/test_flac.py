"""FLAC codec tests: Python encoder/decoder round-trips over every bitstream
feature, C++ decoder bit-identity to the Python reference, seek reads,
integrity checks, and the dataset/data-loader paths on .flac inputs
(capability parity with the reference's soundfile-based FLAC decode,
/root/reference/src/utils/audio_processing.py:23-30 and the flac glob at
preprocessing.py:121-130)."""
import hashlib

import numpy as np
import pytest

from ml_audio_restoration_tpu.audio import native
from ml_audio_restoration_tpu.audio.flac import (
    flac_info, read_flac, write_flac)


@pytest.fixture(scope="module")
def stereo_signal():
    rng = np.random.default_rng(7)
    sr = 22050
    t = np.arange(int(sr * 0.6)) / sr
    sig = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.04 * rng.normal(size=t.size),
        0.4 * np.sin(2 * np.pi * 660 * t) + 0.04 * rng.normal(size=t.size),
    ], axis=1).astype(np.float32)
    return sig, sr


def _quantized(sig, bits):
    lim = 1 << (bits - 1)
    return np.clip(np.round(sig * lim), -lim, lim - 1) / lim


class TestPythonCodec:
    @pytest.mark.parametrize("mode", ["independent", "left_side",
                                      "right_side", "mid_side", "auto"])
    def test_stereo_modes_roundtrip(self, tmp_path, stereo_signal, mode):
        sig, sr = stereo_signal
        p = tmp_path / f"{mode}.flac"
        write_flac(p, sig, sr, stereo_mode=mode)
        got, gsr = read_flac(p)
        assert gsr == sr
        np.testing.assert_array_equal(got, _quantized(sig, 16))

    @pytest.mark.parametrize(
        "bits", [8, 16, 24,
                 pytest.param(32, marks=pytest.mark.slow)])
    def test_bit_depths_roundtrip(self, tmp_path, stereo_signal, bits):
        sig, sr = stereo_signal
        p = tmp_path / f"b{bits}.flac"
        write_flac(p, sig[:9000], sr, bits=bits)
        got, _ = read_flac(p)
        np.testing.assert_array_equal(got, _quantized(sig[:9000], bits))
        assert flac_info(p).bits == bits

    @pytest.mark.parametrize("kw", [dict(lpc_order=8),
                                    dict(force_verbatim=True),
                                    dict(use_escape=True),
                                    dict(partition_order=0),
                                    dict(block_size=1024)])
    def test_bitstream_features_roundtrip(self, tmp_path, stereo_signal, kw):
        sig, sr = stereo_signal
        p = tmp_path / "f.flac"
        write_flac(p, sig[:9000, :1], sr, **kw)
        got, _ = read_flac(p)
        np.testing.assert_array_equal(got, _quantized(sig[:9000, :1], 16))

    def test_constant_and_wasted_bits(self, tmp_path):
        p = tmp_path / "sil.flac"
        write_flac(p, np.zeros((5000, 2), np.float32), 22050)
        got, _ = read_flac(p)
        assert got.shape == (5000, 2) and np.abs(got).max() == 0

        rng = np.random.default_rng(0)
        w = (rng.integers(-100, 100, size=(5000, 1)) * 64).astype(np.int32)
        p2 = tmp_path / "wasted.flac"
        write_flac(p2, w, 22050, bits=16)  # 6 wasted bits per sample
        got, _ = read_flac(p2, dtype=None)
        np.testing.assert_array_equal(got, w)

    def test_seek_read_with_and_without_seektable(self, tmp_path,
                                                  stereo_signal):
        sig, sr = stereo_signal
        for every, name in [(2, "st.flac"), (0, "nost.flac")]:
            p = tmp_path / name
            write_flac(p, sig, sr, seektable_every=every)
            info = flac_info(p)
            assert bool(info.seektable) == (every > 0)
            full, _ = read_flac(p)
            part, _ = read_flac(p, start=7000, frames=900)
            np.testing.assert_array_equal(part, full[7000:7900])

    def test_streaminfo_md5_matches_decode(self, tmp_path, stereo_signal):
        sig, sr = stereo_signal
        p = tmp_path / "md5.flac"
        write_flac(p, sig, sr)
        ints, _ = read_flac(p, dtype=None)
        md5 = hashlib.md5(ints.astype("<i2").tobytes()).digest()
        assert md5 == flac_info(p).md5

    def test_corrupt_frame_rejected(self, tmp_path, stereo_signal):
        sig, sr = stereo_signal
        p = tmp_path / "ok.flac"
        write_flac(p, sig, sr)
        raw = bytearray(p.read_bytes())
        info = flac_info(p)
        raw[info.first_frame_offset + 40] ^= 0xFF  # flip a payload byte
        bad = tmp_path / "bad.flac"
        bad.write_bytes(bytes(raw))
        with pytest.raises(ValueError):
            read_flac(bad, verify=True)

    def test_mutation_fuzz_never_crashes(self, tmp_path, stereo_signal):
        """Scraper downloads are untrusted: random single-byte mutations
        anywhere in the file must either decode or raise ValueError —
        never hang, segfault, or leak another exception type."""
        sig, sr = stereo_signal
        p = tmp_path / "ok.flac"
        write_flac(p, sig, sr)
        raw = p.read_bytes()
        rng = np.random.default_rng(7)
        bad = tmp_path / "fuzz.flac"
        for _ in range(60):
            m = bytearray(raw)
            pos = int(rng.integers(0, len(m)))
            m[pos] ^= int(rng.integers(1, 256))
            bad.write_bytes(bytes(m))
            try:
                read_flac(bad, verify=True)
            except ValueError:
                pass

    def test_odd_length_tail_frame(self, tmp_path):
        sr = 22050
        sig = (0.3 * np.sin(2 * np.pi * 330 * np.arange(10001) / sr)
               ).astype(np.float32)[:, None]
        p = tmp_path / "odd.flac"
        write_flac(p, sig, sr, block_size=4096)
        got, _ = read_flac(p)
        assert got.shape[0] == 10001
        np.testing.assert_array_equal(got, _quantized(sig, 16))


@pytest.mark.skipif(not native.available(), reason="native lib not built")
class TestNativeDecoder:
    @pytest.mark.parametrize("kw", [dict(stereo_mode="independent"),
                                    dict(stereo_mode="left_side"),
                                    dict(stereo_mode="right_side"),
                                    dict(stereo_mode="mid_side"),
                                    dict(bits=24), dict(bits=8),
                                    # 32-bit is the slow outlier (~87 s:
                                    # widest residuals, escape-heavy) —
                                    # full lane only
                                    pytest.param(dict(bits=32),
                                                 marks=pytest.mark.slow),
                                    dict(lpc_order=8),
                                    dict(force_verbatim=True),
                                    dict(use_escape=True)])
    def test_bit_identical_to_python(self, tmp_path, stereo_signal, kw):
        sig, sr = stereo_signal
        p = tmp_path / "n.flac"
        write_flac(p, sig[:9000], sr, **kw)
        want, wsr = read_flac(p)
        got, gsr = native.read(p)
        assert gsr == wsr
        np.testing.assert_array_equal(got, want.astype(np.float32))

    def test_info_and_partial_mono_reads(self, tmp_path, stereo_signal):
        sig, sr = stereo_signal
        p = tmp_path / "n2.flac"
        write_flac(p, sig, sr)
        meta = native.info(p)
        info = flac_info(p)
        assert (meta["sample_rate"], meta["channels"], meta["frames"],
                meta["bits"]) == (sr, 2, info.frames, 16)
        full, _ = read_flac(p)
        part, _ = native.read(p, start=6000, frames=800)
        np.testing.assert_array_equal(part, full[6000:6800].astype(np.float32))
        mono, _ = native.read(p, mono=True)
        np.testing.assert_allclose(mono, full.mean(axis=1), atol=1e-7)

    def test_corrupt_frame_returns_none(self, tmp_path, stereo_signal):
        sig, sr = stereo_signal
        p = tmp_path / "ok.flac"
        write_flac(p, sig, sr)
        raw = bytearray(p.read_bytes())
        raw[flac_info(p).first_frame_offset + 40] ^= 0xFF
        bad = tmp_path / "bad.flac"
        bad.write_bytes(bytes(raw))
        assert native.read(bad) is None


class TestFrameworkPaths:
    def test_load_save_audio_flac(self, tmp_path, stereo_signal):
        from ml_audio_restoration_tpu.audio import load_audio, save_audio

        sig, sr = stereo_signal
        p = tmp_path / "a.flac"
        save_audio(p, sig.T, sr)
        got, gsr = load_audio(p, sample_rate=sr, mono=False)
        assert gsr == sr
        np.testing.assert_allclose(got, _quantized(sig, 16).T, atol=1e-7)

    def test_load_audio_chunk_seek_path(self, tmp_path, stereo_signal):
        from ml_audio_restoration_tpu.audio import load_audio_chunk

        sig, sr = stereo_signal
        p = tmp_path / "a.flac"
        write_flac(p, sig, sr)
        rng = np.random.default_rng(3)
        chunk = load_audio_chunk(p, 4000, rng, sr, mono=True)
        assert chunk.shape == (1, 4000)
        # the chunk must appear verbatim in the full mono mixdown
        full = _quantized(sig, 16).mean(axis=1)
        err = np.abs(np.lib.stride_tricks.sliding_window_view(full, 4000)
                     - chunk[0]).max(axis=1)
        assert err.min() < 1e-7

    def test_stereo_dataset_on_flac(self, tmp_path, stereo_signal):
        from ml_audio_restoration_tpu.data import StereoDataset

        sig, sr = stereo_signal
        for i in range(3):
            write_flac(tmp_path / f"s{i}.flac", sig, sr)
        ds = StereoDataset(tmp_path, sample_rate=sr, chunk_duration=0.25)
        assert len(ds) == 3
        item = ds[0]
        assert item["stereo"].shape == (2, int(0.25 * sr))
        assert np.isfinite(item["stereo"]).all()

    @pytest.mark.skipif(not native.available(), reason="native lib not built")
    def test_restoration_dataset_batch_path_on_flac(self, tmp_path,
                                                    stereo_signal):
        from ml_audio_restoration_tpu.data import RestorationDataset

        sig, sr = stereo_signal
        for i in range(4):
            write_flac(tmp_path / f"m{i}.flac", sig[:, :1], sr)
        ds = RestorationDataset(tmp_path, sample_rate=sr, chunk_duration=0.2)
        batch = ds.getitems([0, 1, 2, 3])
        assert len(batch) == 4
        for item in batch:
            assert item["clean"].shape == (1, int(0.2 * sr))
            assert np.isfinite(item["clean"]).all()

    def test_acquire_eligibility_accepts_flac(self):
        from ml_audio_restoration_tpu.acquire import AudioFile, BaseScraper

        s = BaseScraper()
        f = AudioFile(id="1", name="x.flac", download_url="u", duration=60,
                      sample_rate=44100, channels=2, format="flac")
        assert s.is_eligible(f)


class TestValidationHardening:
    def test_unknown_length_streaminfo_raises(self, tmp_path, stereo_signal):
        """STREAMINFO total_samples == 0 means UNKNOWN length per spec,
        not an empty file: both decoders must refuse rather than silently
        return zero samples into the data loader."""
        sig, sr = stereo_signal
        p = tmp_path / "x.flac"
        write_flac(p, sig[:8192, :1], sr)
        raw = bytearray(p.read_bytes())
        # sample_rate(20)+channels(3)+bits(5)+total(36) = bytes 18..25;
        # zero the low 36 bits (total_samples), keep the top 28
        v = int.from_bytes(raw[18:26], "big")
        raw[18:26] = (v & ~((1 << 36) - 1)).to_bytes(8, "big")
        p2 = tmp_path / "unknown_len.flac"
        p2.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="unknown length"):
            read_flac(p2)
        assert native.read(str(p2)) is None  # native bails, never 0 samples
        assert native.info(str(p2)) is None

    def test_write_flac_rejects_out_of_range_ints(self, tmp_path):
        """Integer input wider than `bits` would wrap modulo 2^bits in the
        bitstream AND the MD5 — must raise, not write spec-valid garbage."""
        bad = np.array([[40000], [-40000]], np.int32)  # outside int16
        with pytest.raises(ValueError, match="exceed 16-bit"):
            write_flac(tmp_path / "bad.flac", bad, 22050, bits=16)
        ok = np.array([[32767], [-32768]], np.int16)  # boundary is fine
        write_flac(tmp_path / "ok.flac", ok, 22050, bits=16)

    def test_corrupt_fixed_order_rejected(self, tmp_path, stereo_signal):
        """A frame whose subframe order exceeds its block size must be
        rejected by BOTH decoders (C++: heap-overflow guard), surfacing
        as a decode error, not a crash."""
        sig, sr = stereo_signal
        p = tmp_path / "x.flac"
        write_flac(p, sig[:4096, :1], sr)
        raw = bytearray(p.read_bytes())
        # brute-mutate the first frame's bytes; the decode must never
        # crash the process (ValueError / error-code rejection only)
        from ml_audio_restoration_tpu.audio.flac import _parse_metadata
        info = _parse_metadata(bytes(raw))
        base = info.first_frame_offset
        for delta in range(64):
            mut = bytearray(raw)
            mut[base + (delta % 16)] ^= 1 << (delta // 16 % 8)
            pm = tmp_path / "mut.flac"
            pm.write_bytes(bytes(mut))
            try:
                read_flac(pm)
            except ValueError:
                pass
            native.read(str(pm))  # None or data; must not crash
