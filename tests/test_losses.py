"""Loss parity vs the reference implementations (torch, CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import has_reference, REFERENCE_PATH
import ml_audio_restoration_tpu.losses as L

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")


def _ref_trainer_cls():
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from src.training.trainer import Trainer  # imports torch + stereo_losses

    return Trainer


class _Shim:
    """Carries the attributes the reference Trainer loss methods read."""
    fft_sizes = [512, 1024, 2048]
    l1_criterion = staticmethod(torch.nn.functional.l1_loss)


def _pair(rng, b=2, c=1, t=8192, scale=0.3):
    out = (rng.normal(size=(b, c, t)) * scale).astype(np.float32)
    tgt = (rng.normal(size=(b, c, t)) * scale).astype(np.float32)
    return out, tgt


def _j(x):
    return jnp.asarray(x.transpose(0, 2, 1))  # NCW -> NWC


def test_multiscale_spectral_loss_parity(rng):
    Trainer = _ref_trainer_cls()
    out, tgt = _pair(rng)
    want = Trainer._spectral_loss(_Shim(), torch.from_numpy(out),
                                  torch.from_numpy(tgt)).item()
    got = float(L.multiscale_spectral_loss(_j(out), _j(tgt)))
    assert abs(got - want) < 1e-3 * max(1.0, abs(want))


def test_multiscale_spectral_loss_parity_stereo(rng):
    Trainer = _ref_trainer_cls()
    out, tgt = _pair(rng, c=2)
    want = Trainer._spectral_loss(_Shim(), torch.from_numpy(out),
                                  torch.from_numpy(tgt)).item()
    got = float(L.multiscale_spectral_loss(_j(out), _j(tgt)))
    assert abs(got - want) < 1e-3 * max(1.0, abs(want))


def test_impulse_loss_parity(rng):
    Trainer = _ref_trainer_cls()
    out, tgt = _pair(rng)
    want = Trainer._impulse_loss(_Shim(), torch.from_numpy(out),
                                 torch.from_numpy(tgt)).item()
    got = float(L.impulse_loss(_j(out), _j(tgt)))
    assert abs(got - want) < 1e-5 * max(1.0, abs(want)) + 1e-6


def test_spectral_clustering_loss_parity(rng):
    import sys

    sys.path.insert(0, REFERENCE_PATH)
    from src.training import stereo_losses as ref

    out, _ = _pair(rng, c=2)
    want = ref.spectral_clustering_loss(torch.from_numpy(out)).item()
    got = float(L.spectral_clustering_loss(_j(out)))
    assert abs(got - want) < 2e-4 * max(1.0, abs(want))


def test_temporal_consistency_loss_parity(rng):
    import sys

    sys.path.insert(0, REFERENCE_PATH)
    from src.training import stereo_losses as ref

    out, _ = _pair(rng, c=2)
    want = ref.temporal_consistency_loss(torch.from_numpy(out)).item()
    got = float(L.temporal_consistency_loss(_j(out)))
    assert abs(got - want) < 1e-5 * max(1.0, abs(want)) + 1e-7


def test_stereo_balance_loss_parity(rng):
    Trainer = _ref_trainer_cls()
    out, tgt = _pair(rng, c=2)
    # the reference method only reads self-independent tensors
    want = Trainer._stereo_balance_loss(None, torch.from_numpy(out),
                                        torch.from_numpy(tgt)).item()
    got = float(L.stereo_balance_loss(_j(out), _j(tgt)))
    assert abs(got - want) < 1e-5 + 1e-4 * abs(want)


def test_decorrelation_loss_parity(rng):
    Trainer = _ref_trainer_cls()
    out, _ = _pair(rng, c=2)
    want = Trainer._decorrelation_loss(None, torch.from_numpy(out)).item()
    got = float(L.decorrelation_loss(_j(out)))
    assert abs(got - want) < 1e-5 + 1e-4 * abs(want)


def test_low_frequency_centering_parity(rng):
    Trainer = _ref_trainer_cls()
    out, _ = _pair(rng, c=2)
    shim = _Shim()
    want = Trainer._low_frequency_centering_loss(shim,
                                                 torch.from_numpy(out)).item()
    got = float(L.low_frequency_centering_loss(_j(out)))
    assert abs(got - want) < 2e-4 * max(1.0, abs(want))


def test_stereo_stats_match_loss(rng):
    # no reference counterpart (our extension): semantic checks instead of
    # parity. Zero when output == target; positive and direction-sensitive
    # when the output is mono-collapsed vs a panned target.
    _, tgt = _pair(rng, c=2)
    assert float(L.stereo_stats_match_loss(_j(tgt), _j(tgt))) < 1e-10
    # _pair returns torch [B, C, T]; _j transposes to channels-last
    mono = np.repeat(tgt.mean(axis=1, keepdims=True), 2, axis=1)
    panned = tgt.copy()
    panned[:, 0, :] *= 1.6
    loss_mono = float(L.stereo_stats_match_loss(_j(mono), _j(panned)))
    assert loss_mono > 1e-3
    # wired into restoration_loss behind the weight
    t0, p0 = L.restoration_loss(_j(mono), _j(panned))
    t1, p1 = L.restoration_loss(_j(mono), _j(panned), stats_match_weight=1.0)
    assert "stats_match" not in p0 and "stats_match" in p1
    assert abs(float(t1) - float(t0) - float(p1["stats_match"])) < 1e-5


def test_stereo_metrics_parity(rng):
    Trainer = _ref_trainer_cls()
    out, _ = _pair(rng, c=2)
    want = Trainer._compute_stereo_metrics(None, torch.from_numpy(out))
    got = L.stereo_metrics(_j(out))
    assert abs(float(got["correlation"]) - want["correlation"]) < 1e-4
    assert abs(float(got["width"]) - want["width"]) < 1e-4


def test_semi_supervised_consistency_parity(rng):
    import sys

    sys.path.insert(0, REFERENCE_PATH)
    from src.training.semi_supervised import SemiSupervisedLoss

    out, inp = _pair(rng, b=4)
    ref = SemiSupervisedLoss()
    want = ref.consistency_loss(torch.from_numpy(out),
                                torch.from_numpy(inp)).item()
    got = float(L.consistency_loss(_j(out), _j(inp)))
    # eps differs slightly (1e-8 both); fft path identical
    assert abs(got - want) < 1e-3 * max(1.0, abs(want))


def test_semi_supervised_masked_matches_indexed(rng):
    """Our static-shape masked means must equal the reference's boolean
    indexing for the supervised term."""
    import sys

    sys.path.insert(0, REFERENCE_PATH)
    from src.training.semi_supervised import SemiSupervisedLoss

    out, tgt = _pair(rng, b=4)
    mask = np.array([1, 0, 1, 1], np.float32)
    ref = SemiSupervisedLoss()
    tmask = torch.from_numpy(mask).bool()
    want = ref.supervised_loss(torch.from_numpy(out)[tmask],
                               torch.from_numpy(tgt)[tmask]).item()
    got = float(L.supervised_loss(_j(out), _j(tgt), jnp.asarray(mask)))
    assert abs(got - want) < 1e-6


def test_restoration_loss_dispatch(rng):
    out, tgt = _pair(rng, c=1, t=4096)
    total, parts = L.restoration_loss(_j(out), _j(tgt))
    assert "impulse" in parts and "clustering" not in parts
    out2, tgt2 = _pair(rng, c=2, t=4096)
    total2, parts2 = L.restoration_loss(_j(out2), _j(tgt2))
    assert "clustering" in parts2 and "impulse" not in parts2
    assert np.isfinite(float(total)) and np.isfinite(float(total2))


def test_transient_spectral_loss_finite(rng):
    """The standalone SpectralLoss crashes upstream (shape bug,
    super_resolution.py:138-190); ours must run and be finite."""
    out, tgt = _pair(rng, t=4096)
    val = float(L.transient_spectral_loss(_j(out), _j(tgt)))
    assert np.isfinite(val)


def test_quality_metrics(rng):
    """snr/si_sdr/lsd sanity: perfect estimate -> high scores, noisier ->
    monotonically worse."""
    t = rng.normal(size=(2, 8192)).astype(np.float32)
    clean = jnp.asarray(t)
    assert float(L.snr(clean, clean).min()) > 60
    assert float(L.si_sdr(clean, clean).min()) > 60
    assert float(L.lsd(clean, clean)) < 1e-3

    light = clean + 0.01 * jnp.asarray(rng.normal(size=t.shape), jnp.float32)
    heavy = clean + 0.2 * jnp.asarray(rng.normal(size=t.shape), jnp.float32)
    assert float(L.snr(light, clean).mean()) > float(L.snr(heavy, clean).mean())
    assert float(L.lsd(light, clean)) < float(L.lsd(heavy, clean))
    # si_sdr is gain-invariant
    assert abs(float(L.si_sdr(2.0 * clean + 0.01 * light, clean).mean())
               - float(L.si_sdr(clean + 0.005 * light, clean).mean())) < 25
