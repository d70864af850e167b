"""Golden parity: our models + converted weights vs the PyTorch reference.

The upstream models are imported read-only from /root/reference (no code is
copied); random-initialized torch weights are converted with
compat.torch_loader and outputs compared in eval mode. BASELINE.json's bar is
<=1e-3 max waveform deviation end-to-end; per-model we hold a tighter 1e-4.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import has_reference, reference_models
from ml_audio_restoration_tpu import models
from ml_audio_restoration_tpu.compat import torch_loader

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")


def _state_dict_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def ref():
    den, sr, st = reference_models()
    return {"denoiser": den, "super_resolution": sr, "stereo_separator": st}


def test_denoiser_parity(ref, rng):
    torch.manual_seed(0)
    tmodel = ref["denoiser"].AudioDenoiser()
    tmodel.eval()
    params, state = torch_loader.convert_denoiser(_state_dict_np(tmodel))

    x = rng.normal(size=(2, 1, 4096)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    got, _ = models.denoiser.apply(params, state,
                                   jnp.asarray(x.transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)
    assert np.max(np.abs(got - want)) < 1e-4


def test_denoiser_param_count():
    import jax

    params, _ = models.denoiser.init(jax.random.PRNGKey(0))
    # 676,242 parameters — train_denoiser.py:20 "676K param U-Net"
    assert models.count_params(params) == 676_242


def test_super_resolution_parity(ref, rng):
    torch.manual_seed(0)
    tmodel = ref["super_resolution"].AudioSuperResolution(
        upscale_factor=2, base_channels=32, num_residual_blocks=4)
    tmodel.eval()
    params, state = torch_loader.convert_super_resolution(
        _state_dict_np(tmodel))

    x = rng.normal(size=(2, 1, 4096)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    got, _ = models.super_resolution.apply(params, state,
                                           jnp.asarray(x.transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == want.shape  # x2 upsampled
    assert np.max(np.abs(got - want)) < 1e-4


def test_super_resolution_param_count():
    import jax

    params, _ = models.super_resolution.init(jax.random.PRNGKey(0))
    assert models.count_params(params) == 38_273


def test_stereo_separator_parity(ref, rng):
    torch.manual_seed(0)
    tmodel = ref["stereo_separator"].StereoSeparator(
        base_channels=32, lstm_hidden=64)
    tmodel.eval()
    params, state = torch_loader.convert_stereo_separator(
        _state_dict_np(tmodel))

    x = rng.normal(size=(1, 1, 4096)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    got, _ = models.stereo_separator.apply(params, state,
                                           jnp.asarray(x.transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == want.shape  # [1, 2, T]
    assert np.max(np.abs(got - want)) < 1e-4


def test_stereo_separator_param_count():
    import jax

    params, _ = models.stereo_separator.init(jax.random.PRNGKey(0))
    # 494,786 parameters — stereo_separator.py:8 "~500K"
    assert models.count_params(params) == 494_786


def test_pth_checkpoint_roundtrip(ref, tmp_path):
    """Full .pth route: torch.save(trainer-format dict) -> load_model."""
    torch.manual_seed(1)
    tmodel = ref["denoiser"].AudioDenoiser()
    path = tmp_path / "best_model.pth"
    torch.save({"epoch": 3, "model_state_dict": tmodel.state_dict()}, path)

    params, state = torch_loader.load_model(path, "denoiser")
    x = np.random.default_rng(1).normal(size=(1, 1, 2048)).astype(np.float32)
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got, _ = models.denoiser.apply(params, state,
                                   jnp.asarray(x.transpose(0, 2, 1)))
    assert np.max(np.abs(np.asarray(got).transpose(0, 2, 1) - want)) < 1e-4


@pytest.mark.parametrize("model_name,ref_key", [
    ("denoiser", "denoiser"),
    ("super_resolution", "super_resolution"),
    ("stereo_separator", "stereo_separator"),
])
def test_pth_export_roundtrip(ref, tmp_path, rng, model_name, ref_key):
    """Export our weights to .pth, load into the reference torch module, and
    check the outputs match — the reverse interop direction."""
    import jax

    from ml_audio_restoration_tpu.compat import save_pth

    module = getattr(models, model_name)
    params, state = module.init(jax.random.PRNGKey(3))
    path = tmp_path / f"{model_name}.pth"
    save_pth(path, model_name, params, state)

    ref_mod = ref[ref_key]
    cls = {"denoiser": "AudioDenoiser",
           "super_resolution": "AudioSuperResolution",
           "stereo_separator": "StereoSeparator"}[model_name]
    tmodel = getattr(ref_mod, cls)()
    sd = torch.load(path, weights_only=False)["model_state_dict"]
    tmodel.load_state_dict(sd)  # raises on any key/shape mismatch
    tmodel.eval()

    x = rng.normal(size=(1, 1, 4096)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got, _ = module.apply(params, state, jnp.asarray(x.transpose(0, 2, 1)))
    assert np.max(np.abs(np.asarray(got).transpose(0, 2, 1) - want)) < 1e-4


def test_stereo_two_layer_lstm_parity(ref, rng):
    torch.manual_seed(2)
    tmodel = ref["stereo_separator"].StereoSeparator(num_lstm_layers=2)
    tmodel.eval()
    params, state = torch_loader.convert_stereo_separator(
        _state_dict_np(tmodel))
    assert len(params["lstm"]) == 2

    x = rng.normal(size=(1, 1, 2048)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got, _ = models.stereo_separator.apply(params, state,
                                           jnp.asarray(x.transpose(0, 2, 1)))
    assert np.max(np.abs(np.asarray(got).transpose(0, 2, 1) - want)) < 1e-4


def test_super_resolution_x4_parity(ref, rng):
    torch.manual_seed(3)
    tmodel = ref["super_resolution"].AudioSuperResolution(upscale_factor=4)
    tmodel.eval()
    params, state = torch_loader.convert_super_resolution(
        _state_dict_np(tmodel))
    assert len(params["upsample"]) == 2

    x = rng.normal(size=(1, 1, 2048)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got, _ = models.super_resolution.apply(params, state,
                                           jnp.asarray(x.transpose(0, 2, 1)))
    assert got.shape[1] == 4 * 2048
    assert np.max(np.abs(np.asarray(got).transpose(0, 2, 1) - want)) < 1e-4


def test_denoiser_odd_length_parity(ref, rng):
    """Odd input length exercises the decoder size-mismatch pad path
    (denoiser.py:121-122): pooling floors T/2 so upsampled tensors come back
    one sample short of the skip."""
    torch.manual_seed(0)
    tmodel = ref["denoiser"].AudioDenoiser()
    tmodel.eval()
    params, state = torch_loader.convert_denoiser(_state_dict_np(tmodel))

    x = rng.normal(size=(1, 1, 4097)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got, _ = models.denoiser.apply(params, state,
                                   jnp.asarray(x.transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == want.shape == (1, 1, 4097)
    assert np.max(np.abs(got - want)) < 1e-4
