"""Unit tests for ops/ primitives against torch/scipy semantics."""
import numpy as np
import pytest
import jax.numpy as jnp

import ml_audio_restoration_tpu.ops as ops

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _np(x):
    return np.asarray(x)


class TestConv:
    def test_conv1d_matches_torch(self, rng):
        x = rng.normal(size=(2, 64, 3)).astype(np.float32)
        w = rng.normal(size=(5, 3, 7)).astype(np.float32)
        b = rng.normal(size=(7,)).astype(np.float32)
        ours = ops.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                          padding=2)
        theirs = F.conv1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w.transpose(2, 1, 0)),
            torch.from_numpy(b),
            padding=2,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(_np(ours), theirs, atol=1e-5)

    @pytest.mark.parametrize("dilation", [1, 2, 4, 8])
    def test_conv1d_dilated(self, rng, dilation):
        x = rng.normal(size=(1, 128, 4)).astype(np.float32)
        w = rng.normal(size=(3, 4, 4)).astype(np.float32)
        ours = ops.conv1d(jnp.asarray(x), jnp.asarray(w), padding=dilation,
                          dilation=dilation)
        theirs = F.conv1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w.transpose(2, 1, 0)),
            padding=dilation,
            dilation=dilation,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(_np(ours), theirs, atol=1e-5)

    @pytest.mark.parametrize("k,stride,padding", [(2, 2, 0), (4, 2, 1)])
    def test_conv_transpose1d_matches_torch(self, rng, k, stride, padding):
        x = rng.normal(size=(2, 50, 6)).astype(np.float32)
        w = rng.normal(size=(k, 6, 4)).astype(np.float32)  # [k, in, out]
        b = rng.normal(size=(4,)).astype(np.float32)
        ours = ops.conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), stride=stride,
                                    padding=padding)
        theirs = F.conv_transpose1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w.transpose(1, 2, 0)),  # [in, out, k]
            torch.from_numpy(b),
            stride=stride,
            padding=padding,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(_np(ours), theirs, atol=1e-5)

    def test_max_pool(self, rng):
        x = rng.normal(size=(2, 64, 3)).astype(np.float32)
        ours = ops.max_pool1d(jnp.asarray(x))
        theirs = F.max_pool1d(torch.from_numpy(x.transpose(0, 2, 1)), 2, 2)
        np.testing.assert_allclose(
            _np(ours), theirs.numpy().transpose(0, 2, 1), atol=1e-6)

    def test_batch_norm_eval(self, rng):
        x = rng.normal(size=(2, 32, 8)).astype(np.float32)
        scale = rng.normal(size=(8,)).astype(np.float32)
        bias = rng.normal(size=(8,)).astype(np.float32)
        mean = rng.normal(size=(8,)).astype(np.float32)
        var = rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32)
        ours = ops.batch_norm(jnp.asarray(x), scale, bias, mean, var)
        theirs = F.batch_norm(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(scale), torch.from_numpy(bias),
            training=False, eps=1e-5,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(_np(ours), theirs, atol=1e-5)

    def test_batch_norm_train_matches_torch(self, rng):
        x = rng.normal(size=(4, 32, 8)).astype(np.float32)
        scale = np.ones(8, np.float32)
        bias = np.zeros(8, np.float32)
        rmean = np.zeros(8, np.float32)
        rvar = np.ones(8, np.float32)
        y, nm, nv = ops.batch_norm_train(
            jnp.asarray(x), scale, bias, rmean, rvar)

        bn = torch.nn.BatchNorm1d(8)
        with torch.no_grad():
            ty = bn(torch.from_numpy(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            _np(y), ty.numpy().transpose(0, 2, 1), atol=1e-4)
        np.testing.assert_allclose(_np(nm), bn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(_np(nv), bn.running_var.numpy(), atol=1e-4)


class TestInterp:
    @pytest.mark.parametrize("t_in,t_out", [(100, 200), (100, 50), (101, 202)])
    def test_linear_interp_matches_torch(self, rng, t_in, t_out):
        x = rng.normal(size=(2, t_in, 3)).astype(np.float32)
        ours = ops.interp_linear(jnp.asarray(x), t_out)
        theirs = F.interpolate(
            torch.from_numpy(x.transpose(0, 2, 1)), size=t_out,
            mode="linear", align_corners=False,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(_np(ours), theirs, atol=1e-5)


class TestSTFT:
    @pytest.mark.parametrize("n_fft", [512, 1024, 2048])
    def test_stft_matches_torch(self, rng, n_fft):
        t = 8192
        hop = n_fft // 4
        x = rng.normal(size=(2, t)).astype(np.float32)
        ours = ops.stft(jnp.asarray(x), n_fft, hop)  # [B, frames, bins]
        theirs = torch.stft(
            torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
            window=torch.hann_window(n_fft), return_complex=True,
        ).numpy()  # [B, bins, frames]
        np.testing.assert_allclose(
            np.abs(_np(ours)), np.abs(theirs).transpose(0, 2, 1),
            atol=2e-3, rtol=1e-4)

    def test_istft_roundtrip(self, rng):
        t = 8192
        x = rng.normal(size=(1, t)).astype(np.float32)
        spec = ops.stft(jnp.asarray(x), 512, 128)
        rec = ops.istft(spec, 512, 128, length=t)
        np.testing.assert_allclose(_np(rec)[:, 256:-256],
                                   x[:, 256:-256], atol=1e-3)


class TestLSTM:
    def test_lstm_matches_torch(self, rng):
        b, t, c, h = 3, 64, 16, 8
        x = rng.normal(size=(b, t, c)).astype(np.float32)
        tl = torch.nn.LSTM(c, h, batch_first=True)
        params = {
            "w_ih": jnp.asarray(tl.weight_ih_l0.detach().numpy().T),
            "w_hh": jnp.asarray(tl.weight_hh_l0.detach().numpy().T),
            "b_ih": jnp.asarray(tl.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(tl.bias_hh_l0.detach().numpy()),
        }
        ours = ops.lstm(jnp.asarray(x), params)
        with torch.no_grad():
            theirs, _ = tl(torch.from_numpy(x))
        np.testing.assert_allclose(_np(ours), theirs.numpy(), atol=1e-5)


class TestFilters:
    def test_lfilter_matches_scipy(self, rng):
        from scipy import signal as sig

        b, a = sig.butter(4, 0.2, btype="high")
        x = rng.normal(size=(2, 500)).astype(np.float32)
        ours = ops.lfilter(jnp.asarray(b, dtype=jnp.float32),
                           jnp.asarray(a, dtype=jnp.float32), jnp.asarray(x))
        theirs = sig.lfilter(b, a, x, axis=-1)
        np.testing.assert_allclose(_np(ours), theirs, atol=1e-4)

    @pytest.mark.parametrize("btype,cutoff,order", [
        ("high", 2500.0, 4), ("low", 100.0, 4), ("low", 7000.0, 3)])
    def test_sosfiltfilt_matches_scipy(self, rng, btype, cutoff, order):
        from scipy import signal as sig

        sr = 22050
        x = rng.normal(size=(1, 4000)).astype(np.float32)
        ours = ops.butter_filtfilt(jnp.asarray(x), order, cutoff, sr, btype)
        sos = sig.butter(order, cutoff / (sr / 2), btype=btype, output="sos")
        theirs = sig.sosfiltfilt(sos, x, axis=-1)
        np.testing.assert_allclose(_np(ours), theirs, atol=2e-3)

    def test_sosfilt_matches_scipy(self, rng):
        from scipy import signal as sig

        sos = sig.butter(4, 0.2, btype="high", output="sos")
        x = rng.normal(size=(2, 500)).astype(np.float32)
        ours = ops.sosfilt(jnp.asarray(sos, dtype=jnp.float32), jnp.asarray(x))
        theirs = sig.sosfilt(sos, x, axis=-1)
        np.testing.assert_allclose(_np(ours), theirs, atol=1e-4)

    def test_lfilter_zi_matches_scipy(self):
        from scipy import signal as sig

        b, a = sig.butter(4, 0.3, btype="low")
        from ml_audio_restoration_tpu.ops.filters import _lfilter_zi_jnp

        ours = _lfilter_zi_jnp(jnp.asarray(b), jnp.asarray(a))
        np.testing.assert_allclose(_np(ours), sig.lfilter_zi(b, a), atol=1e-5)


class TestChunking:
    def test_roundtrip_no_overlap(self, rng):
        x = rng.normal(size=(1, 10000)).astype(np.float32)
        chunks, length = ops.chunk_signal(jnp.asarray(x), 4096, 4096)
        rec = ops.overlap_add(chunks, 4096, length, overlap=0)
        np.testing.assert_allclose(_np(rec), x, atol=1e-6)

    def test_roundtrip_with_overlap(self, rng):
        x = rng.normal(size=(2, 44100)).astype(np.float32)
        chunk, overlap = 8192, 1024
        hop = chunk - overlap
        chunks, length = ops.chunk_signal(jnp.asarray(x), chunk, hop)
        rec = ops.overlap_add(chunks, hop, length, overlap=overlap)
        np.testing.assert_allclose(_np(rec), x, atol=1e-5)

    def test_short_signal(self, rng):
        x = rng.normal(size=(1, 100)).astype(np.float32)
        chunks, length = ops.chunk_signal(jnp.asarray(x), 4096, 4096)
        assert chunks.shape == (1, 1, 4096)
        rec = ops.overlap_add(chunks, 4096, length, overlap=0)
        np.testing.assert_allclose(_np(rec), x, atol=1e-6)

    @pytest.mark.parametrize("overlap", [0, 200])
    def test_valid_masks_padding_chunks(self, rng, overlap):
        """Bucketing padding chunks (index >= valid) must contribute zero
        output AND zero crossfade weight: the result over the real region is
        bit-equal to overlap-adding only the real chunks. Padding chunks are
        filled with garbage to prove they are fully masked."""
        chunk = 1000
        hop = chunk - overlap
        n_real, n = 5, 8
        length = (n_real - 1) * hop + chunk
        real = rng.normal(size=(n_real, 2, chunk)).astype(np.float32)
        garbage = 1e6 * rng.normal(size=(n - n_real, 2, chunk)).astype(
            np.float32)
        padded = jnp.concatenate([jnp.asarray(real), jnp.asarray(garbage)])
        want = ops.overlap_add(jnp.asarray(real), hop, length,
                               overlap=overlap)
        got = ops.overlap_add(padded, hop, length, overlap=overlap, valid=5)
        np.testing.assert_array_equal(_np(got), _np(want))


class TestFrameStructured:
    @pytest.mark.parametrize("overlap", [0, 512, 1024])
    def test_matches_gather_framing(self, rng, overlap):
        chunk = 2048
        hop = chunk - overlap
        n = 7
        total = (n - 1) * hop + chunk
        x = rng.normal(size=(2, total)).astype(np.float32)
        want, _ = ops.chunk_signal(jnp.asarray(x), chunk, hop)  # [N, C, chunk]
        got = ops.frame_structured(jnp.asarray(x), n, chunk, hop)
        np.testing.assert_array_equal(
            _np(got), _np(want).transpose(0, 2, 1))


class TestPallasLSTM:
    def test_interpret_matches_scan(self, rng):
        import jax
        from ml_audio_restoration_tpu.ops.lstm import lstm_recurrence_scan
        from ml_audio_restoration_tpu.ops.pallas.lstm import (
            lstm_recurrence_pallas)

        gates = jnp.asarray(
            rng.normal(size=(3, 300, 32)).astype(np.float32) * 0.3)
        w_hh = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32) * 0.2)
        want, (wh, wc) = lstm_recurrence_scan(gates, w_hh, return_carry=True)
        got, (gh, gc) = lstm_recurrence_pallas(gates, w_hh, block_t=64,
                                               interpret=True)
        np.testing.assert_allclose(_np(got), _np(want), atol=1e-6)
        # the final carry is captured at the TRUE step 299, not the padded
        # step 319 (zero-gate padding keeps advancing the recurrence)
        np.testing.assert_allclose(_np(gh), _np(wh), atol=1e-6)
        np.testing.assert_allclose(_np(gc), _np(wc), atol=1e-6)

    def test_carry_io_block_continuity(self, rng):
        """Feeding a sequence in two halves with threaded carry must equal
        the single-shot run — the streaming engine's exactness contract
        (pipeline/streaming.py) under the kernel impl."""
        from ml_audio_restoration_tpu.ops.lstm import lstm_recurrence_scan
        from ml_audio_restoration_tpu.ops.pallas.lstm import (
            lstm_recurrence_pallas)

        gates = jnp.asarray(
            rng.normal(size=(2, 200, 32)).astype(np.float32) * 0.3)
        w_hh = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32) * 0.2)
        want = lstm_recurrence_scan(gates, w_hh)
        a, ca = lstm_recurrence_pallas(gates[:, :90], w_hh, block_t=64,
                                       interpret=True)
        b, _ = lstm_recurrence_pallas(gates[:, 90:], w_hh, ca, block_t=64,
                                      interpret=True)
        got = jnp.concatenate([a, b], axis=1)
        np.testing.assert_allclose(_np(got), _np(want), atol=1e-6)

    def test_bf16_gates_time_major_matches_scan(self, rng):
        """The serve-path regime (round 4): bf16 gates streamed at their
        own dtype, time-major input straight off the projection, bf16
        output, f32 state/carry. Values must track the f32 scan within
        bf16 rounding, and the carry stays f32-accurate."""
        from ml_audio_restoration_tpu.ops.lstm import lstm_recurrence_scan
        from ml_audio_restoration_tpu.ops.pallas.lstm import (
            lstm_recurrence_pallas)

        gates = jnp.asarray(
            rng.normal(size=(3, 150, 32)).astype(np.float32) * 0.3)
        w_hh = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32) * 0.2)
        want, (wh, wc) = lstm_recurrence_scan(gates, w_hh, return_carry=True)
        got, (gh, gc) = lstm_recurrence_pallas(
            gates.astype(jnp.bfloat16).transpose(1, 0, 2),
            w_hh.astype(jnp.bfloat16), time_major=True, interpret=True)
        assert got.dtype == jnp.bfloat16
        assert gh.dtype == jnp.float32
        np.testing.assert_allclose(
            _np(got).astype(np.float32), _np(want), atol=0.05)
        np.testing.assert_allclose(_np(gh), _np(wh), atol=0.05)
        np.testing.assert_allclose(_np(gc), _np(wc), atol=0.05)

    def test_auto_block_t_fits_vmem_budget(self):
        """Auto block sizing: the streaming shape keeps the measured
        block_t=64 config; the batch-640 serve shape (which VMEM-OOMed at
        fixed 64) shrinks until the double-buffered working set fits."""
        from ml_audio_restoration_tpu.ops.pallas.lstm import _auto_block_t

        assert _auto_block_t(16, 256, 64, 4) == 64       # streaming, f32
        bt = _auto_block_t(640, 256, 64, 2)              # serve, bf16
        assert bt < 64
        assert 2 * bt * 640 * (256 + 64) * 2 <= 8 * 1024 * 1024
        # the f32 batch-640 sub-chunked shape that OOMed at block_t=8
        # (16.25 MB scoped vs the 16 MB limit) must now size below 8
        assert _auto_block_t(640, 256, 64, 4) <= 4
        assert _auto_block_t(4096, 512, 128, 4) == 1     # floor

    def test_train_kernels_match_scan_vjp(self, rng):
        """The fused forward+backward training kernels (round 4) must
        reproduce the scan's VJP exactly: dgates, dW_hh, dh0, dc0 under
        arbitrary output AND carry cotangents, on a padded length (T not
        a block multiple) and a padded batch (B not a multiple of 8)."""
        import jax
        from ml_audio_restoration_tpu.ops.lstm import lstm_recurrence_scan
        from ml_audio_restoration_tpu.ops.pallas.lstm import (
            lstm_recurrence_pallas_bwd, lstm_recurrence_pallas_train)

        b, t, h = 3, 150, 8
        gates = jnp.asarray(
            rng.normal(size=(b, t, 4 * h)).astype(np.float32) * 0.3)
        w_hh = jnp.asarray(
            rng.normal(size=(h, 4 * h)).astype(np.float32) * 0.2)
        h0 = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32) * 0.1)
        c0 = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32) * 0.1)

        def scan_fn(gx, w, hh, cc):
            out, (hf, cf) = lstm_recurrence_scan(gx, w, carry=(hh, cc),
                                                 return_carry=True)
            return out, hf, cf

        primal, vjp = jax.vjp(scan_fn, gates, w_hh, h0, c0)
        dout = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))
        dhf = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
        dcf = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
        want_dg, want_dw, want_dh0, want_dc0 = vjp((dout, dhf, dcf))

        (out, (hf, cf)), res = lstm_recurrence_pallas_train(
            gates, w_hh, (h0, c0), block_t=64, interpret=True)
        np.testing.assert_allclose(_np(out), _np(primal[0]), atol=1e-6)
        np.testing.assert_allclose(_np(hf), _np(primal[1]), atol=1e-6)
        np.testing.assert_allclose(_np(cf), _np(primal[2]), atol=1e-6)

        dg, dw, dh0, dc0 = lstm_recurrence_pallas_bwd(
            res, w_hh, dout, (dhf, dcf), interpret=True)
        np.testing.assert_allclose(_np(dg), _np(want_dg), atol=2e-5)
        np.testing.assert_allclose(_np(dw), _np(want_dw), atol=2e-5)
        np.testing.assert_allclose(_np(dh0), _np(want_dh0), atol=2e-5)
        np.testing.assert_allclose(_np(dc0), _np(want_dc0), atol=2e-5)

    def test_pallas_train_impl_grads_match_scan(self, rng):
        """End-to-end through lstm(impl=...): grads of a scalar loss wrt
        params and input must match between the scan and the
        custom-VJP'd training kernels (interpret mode on CPU)."""
        import jax
        from ml_audio_restoration_tpu import ops
        from ml_audio_restoration_tpu.ops.pallas import lstm as plstm

        # interpret-mode shim: the production path calls the kernels with
        # interpret=False, which cannot run on CPU
        orig_t, orig_b = (plstm.lstm_recurrence_pallas_train,
                          plstm.lstm_recurrence_pallas_bwd)
        plstm.lstm_recurrence_pallas_train = lambda *a, **k: orig_t(
            *a, **{**k, "interpret": True})
        plstm.lstm_recurrence_pallas_bwd = lambda *a, **k: orig_b(
            *a, **{**k, "interpret": True})
        try:
            p = ops.lstm_init(jax.random.PRNGKey(0), 8, 4)
            x = jnp.asarray(
                rng.normal(size=(2, 100, 8)).astype(np.float32) * 0.3)

            def loss(params, impl):
                return jnp.sum(ops.lstm(x, params, impl=impl) ** 2)

            want = jax.grad(lambda p_: loss(p_, "scan"))(p)
            got = jax.grad(lambda p_: loss(p_, "pallas_train"))(p)
            for k in want:
                np.testing.assert_allclose(_np(got[k]), _np(want[k]),
                                           atol=2e-5, err_msg=k)
        finally:
            plstm.lstm_recurrence_pallas_train = orig_t
            plstm.lstm_recurrence_pallas_bwd = orig_b

    def test_pallas_inference_impl_grads_bf16(self, rng):
        """Regression (ADVICE r04): grad through a bf16 impl='pallas' LSTM
        used to fail with a cotangent dtype ValueError — the Pallas primal
        outputs at the gates dtype (bf16) while _fast_bwd's scan recompute
        returned f32. The recompute now casts to the primal's dtype
        contract; grads must flow and match the scan's within bf16 noise."""
        import jax
        from ml_audio_restoration_tpu import ops
        from ml_audio_restoration_tpu.ops.pallas import lstm as plstm

        orig = plstm.lstm_recurrence_pallas
        plstm.lstm_recurrence_pallas = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        try:
            p = ops.lstm_init(jax.random.PRNGKey(0), 8, 4)
            p16 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), p)
            x = jnp.asarray(
                rng.normal(size=(2, 60, 8)) * 0.3).astype(jnp.bfloat16)

            def loss(params, impl):
                return jnp.sum(
                    ops.lstm(x, params, impl=impl).astype(jnp.float32) ** 2)

            got = jax.grad(lambda p_: loss(p_, "pallas"))(p16)
            want = jax.grad(lambda p_: loss(p_, "scan"))(p16)
            for k in want:
                np.testing.assert_allclose(
                    _np(got[k]).astype(np.float32),
                    _np(want[k]).astype(np.float32),
                    atol=0.15, rtol=0.1, err_msg=k)
        finally:
            plstm.lstm_recurrence_pallas = orig

    def test_scan_impl_grads_flow(self, rng):
        import jax
        from ml_audio_restoration_tpu import ops

        p = ops.lstm_init(jax.random.PRNGKey(0), 8, 4)
        x = jnp.asarray(rng.normal(size=(2, 50, 8)).astype(np.float32))

        def loss(p):
            return jnp.sum(ops.lstm(x, p, impl="scan") ** 2)

        g = jax.grad(loss)(p)
        assert all(np.isfinite(_np(v)).all()
                   for v in jax.tree_util.tree_leaves(g))


def test_filtfilt_rejects_short_input():
    """scipy parity: inputs not longer than padlen raise instead of
    silently returning truncated/empty output."""
    import pytest as _pytest
    from ml_audio_restoration_tpu import ops

    x = jnp.ones((1, 10), jnp.float32)
    sos, zi = ops.butter_sos(4, 2500.0, 22050.0, "highpass")
    with _pytest.raises(ValueError, match="padlen"):
        ops.sosfiltfilt(jnp.asarray(sos), x, zi=jnp.asarray(zi))
    b, a, _ = ops.butter_coeffs(4, 100.0, 22050.0, "lowpass")
    with _pytest.raises(ValueError, match="padlen"):
        ops.filtfilt(jnp.asarray(b), jnp.asarray(a), x)


def test_read_wav_truncated_file_decodes_whole_frames(tmp_path):
    """A WAV whose data chunk is cut off mid-frame (truncated copy) decodes
    its complete frames like the native codec, instead of raising numpy
    buffer/reshape errors."""
    from ml_audio_restoration_tpu.audio import read_wav, write_wav

    x = np.linspace(-0.5, 0.5, 400, dtype=np.float32).reshape(200, 2)
    p = tmp_path / "t.wav"
    write_wav(p, x, 22050, subtype="PCM_24")
    blob = p.read_bytes()
    # cut mid-frame: drop the last 4 bytes (frame = 6 bytes at 24-bit stereo)
    trunc = tmp_path / "trunc.wav"
    trunc.write_bytes(blob[:-4])
    got, sr = read_wav(trunc)
    assert sr == 22050 and got.shape == (199, 2)
    np.testing.assert_allclose(got, x[:199], atol=2e-7)
