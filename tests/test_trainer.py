"""Training-runtime tests: all pairings step, loss decreases, checkpoint
resume, plateau scheduler, data-parallel mesh equivalence."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ml_audio_restoration_tpu.config import TrainConfig, ArtifactConfig
from ml_audio_restoration_tpu.data.loader import DataLoader
from ml_audio_restoration_tpu.models import (
    denoiser, super_resolution, stereo_separator)
from ml_audio_restoration_tpu.train.trainer import Trainer

SR = 22050
CHUNK = 2048


def _sine(i, n=CHUNK, ch=1):
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * (220 + 17 * i) * t)
    out = np.stack([x * (1.0 if c == 0 else 0.6) for c in range(ch)])
    return out.astype(np.float32)


class ToyDataset:
    pairing = "degrade"

    def __init__(self, n=8, key="clean", ch=1, chunk=CHUNK):
        self.n, self.key, self.ch, self.chunk = n, key, ch, chunk

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {self.key: _sine(i, self.chunk, self.ch)}


def _quiet_artifacts():
    # mild artifacts keep toy losses stable
    return ArtifactConfig(impulse_rate=4.0, add_rumble=False)


def _make_trainer(model_name, module, dataset, *, dp=1, lr=1e-3, **init_kw):
    params, state = module.init(jax.random.PRNGKey(0), **init_kw)
    loader = DataLoader(dataset, batch_size=4, num_workers=1, seed=0)
    cfg = TrainConfig(model=model_name, learning_rate=lr, data_parallel=dp,
                      num_epochs=2)
    return Trainer(model_name, params, state, loader, None, config=cfg,
                   artifact_config=_quiet_artifacts())


def test_denoiser_degrade_training_reduces_loss(tmp_path):
    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=8))
    tr.checkpoint_dir = tmp_path
    first = tr.train_epoch(jax.random.PRNGKey(1))
    for e in range(3):
        last = tr.train_epoch(jax.random.PRNGKey(2 + e))
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first


def test_stereo_pairing_steps(tmp_path):
    ds = ToyDataset(n=4, key="stereo", ch=2)
    ds.pairing = "mono_target_stereo"
    tr = _make_trainer("stereo_separator", stereo_separator, ds)
    loss = tr.train_epoch(jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_super_resolution_pairing_steps(tmp_path):
    ds = ToyDataset(n=4, key="high", chunk=4096)
    ds.pairing = "downsample"
    tr = _make_trainer("super_resolution", super_resolution, ds)
    loss = tr.train_epoch(jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_mixed_pairing_semi_supervised(tmp_path):
    class MixedToy(ToyDataset):
        pairing = "mixed"

        def __getitem__(self, i):
            return {"audio": _sine(i),
                    "is_synthetic": np.float32(1.0 if i % 2 == 0 else 0.0)}

    tr = _make_trainer("denoiser", denoiser, MixedToy(n=8))
    loss = tr.train_epoch(jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_adaptive_pairing_steps(tmp_path):
    class AdaptiveToy(ToyDataset):
        pairing = "degrade_adaptive"

        def __getitem__(self, i):
            return {"clean": _sine(i),
                    "impulse_rate": np.float32(12.0),
                    "impulse_amplitude_max": np.float32(0.4),
                    "noise_level": np.float32(0.02)}

    tr = _make_trainer("denoiser", denoiser, AdaptiveToy(n=4))
    loss = tr.train_epoch(jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_checkpoint_save_resume_roundtrip(tmp_path):
    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.train_epoch(jax.random.PRNGKey(0))
    tr.epoch = 3
    tr.best_val_loss = 0.123
    tr.history["train_loss"] = [1.0, 0.5, 0.3]
    tr.save_checkpoint("checkpoint_epoch_3.msgpack")

    tr2 = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr2.checkpoint_dir = tmp_path
    assert tr2.maybe_resume()
    assert tr2.epoch == 3
    assert abs(tr2.best_val_loss - 0.123) < 1e-9
    assert list(tr2.history["train_loss"]) == [1.0, 0.5, 0.3]
    p1 = jax.tree_util.tree_leaves(tr.state["params"])
    p2 = jax.tree_util.tree_leaves(tr2.state["params"])
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    loss = tr2.train_epoch(jax.random.PRNGKey(1))
    assert np.isfinite(loss)


def test_checkpoint_retention(tmp_path):
    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.save_checkpoint("checkpoint_epoch_1.msgpack")
    tr.save_checkpoint("best_model.msgpack")
    tr.save_checkpoint("checkpoint_epoch_2.msgpack")
    names = sorted(p.name for p in tmp_path.glob("*.msgpack"))
    assert names == ["best_model.msgpack", "checkpoint_epoch_2.msgpack"]


def test_plateau_scheduler_halves_lr():
    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4), lr=1e-3)
    tr.best_val_loss = 1.0
    for _ in range(tr.cfg.plateau_patience + 1):
        tr._plateau_step(2.0)  # no improvement
    assert abs(tr.lr - 5e-4) < 1e-12
    lr_in_opt = float(tr.state["opt_state"].hyperparams["learning_rate"])
    assert abs(lr_in_opt - 5e-4) < 1e-9


def test_data_parallel_matches_single_device():
    """One dp=4 sharded step must match dp=1 (same global batch): identical
    degradation keys, global-batch BN stats, all-reduced grads. Tolerance
    covers cross-shard reduction-order float noise only."""
    ds = ToyDataset(n=4)  # one batch per epoch -> exactly one step
    tr1 = _make_trainer("denoiser", denoiser, ds)
    tr4 = _make_trainer("denoiser", denoiser, ds, dp=4)
    l1 = tr1.train_epoch(jax.random.PRNGKey(5))
    l4 = tr4.train_epoch(jax.random.PRNGKey(5))
    assert abs(l1 - l4) < 1e-4 * max(1.0, abs(l1))
    for a, b in zip(jax.tree_util.tree_leaves(tr1.state["params"]),
                    jax.tree_util.tree_leaves(tr4.state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_optional_stereo_losses_enabled(tmp_path):
    """balance/decorrelation/LF-centering (unwired in the reference) train
    when their weights are configured >0."""
    ds = ToyDataset(n=4, key="stereo", ch=2)
    ds.pairing = "mono_target_stereo"
    params, state = stereo_separator.init(jax.random.PRNGKey(0))
    loader = DataLoader(ds, batch_size=4, num_workers=1, seed=0)
    cfg = TrainConfig(model="stereo_separator", balance_weight=0.1,
                      decorrelation_weight=0.05, lf_centering_weight=0.05)
    tr = Trainer("stereo_separator", params, state, loader, None, config=cfg,
                 artifact_config=_quiet_artifacts())
    loss = tr.train_epoch(jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_packed_train_forward_matches_plain():
    """apply_train_packed (round 5: the lane-padding fix for the train
    step, 2.2x on the C=32/64 stages) must reproduce apply(train=True):
    outputs and BN running-stat updates to float tolerance; weight/BN
    grads within the calibrated reassociation band (2e-2 worst-case rel
    through the full U-Net depth; the isolated-stage probe measures 1e-6
    — scripts/pack_train_probe.py). Conv-bias-before-BN grads are
    excluded: their true gradient is zero (BN subtracts the mean), so
    relative deviation there is noise over noise."""
    import jax.numpy as jnp

    params, state = denoiser.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096, 1)) * 0.3

    ya, sa = denoiser.apply(params, state, x, train=True)
    yb, sb = denoiser.apply_train_packed(params, state, x)
    assert float(jnp.abs(ya - yb).max()) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(sa),
                    jax.tree_util.tree_leaves(sb)):
        assert float(jnp.abs(a - b).max()) < 1e-5

    def loss(p, fn, **kw):
        y, _ = fn(p, state, x, **kw)
        return jnp.sum(jnp.square(y))

    ga = jax.grad(lambda p: loss(p, denoiser.apply, train=True))(params)
    gb = jax.grad(lambda p: loss(p, denoiser.apply_train_packed))(params)
    flat = lambda g: sorted(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g))
    for (ka, a), (kb, b) in zip(flat(ga), flat(gb)):
        assert ka == kb
        if "']['b']" in ka and "bn" not in ka:
            continue  # bias before BN: true grad is zero
        d = float(jnp.abs(a - b).max())
        ref = float(jnp.abs(a).max()) + 1e-9
        assert d / ref < 5e-2, (ka, d / ref)

    # the apply() router: packed only takes effect for qualifying TRAIN
    # forwards — eval and odd lengths fall back to the plain path
    ye, se = denoiser.apply(params, state, x, train=False, packed=True)
    yp, _ = denoiser.apply(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(ye), np.asarray(yp))


def test_packed_train_forward_matches_plain_super_resolution():
    """SR is C=32 end-to-end (4x lane padding everywhere); its packed
    train forward is a linear mirror of the serving path and measures
    essentially exact (out 3e-7, worst grad rel 1e-4 — no pooling/concat
    depth to amplify reassociation). Covers x2 and x4 upscale stacks."""
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2048, 1)) * 0.3
    for factor in (2, 4):
        params, state = super_resolution.init(jax.random.PRNGKey(factor),
                                              upscale_factor=factor)
        ya, sa = super_resolution.apply(params, state, x, train=True)
        yb, sb = super_resolution.apply_train_packed(params, state, x)
        assert ya.shape == yb.shape == (2, 2048 * factor, 1)
        assert float(jnp.abs(ya - yb).max()) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(sa),
                        jax.tree_util.tree_leaves(sb)):
            assert float(jnp.abs(a - b).max()) < 1e-5

    def loss(p):
        y, _ = super_resolution.apply_train_packed(p, state, x)
        return jnp.sum(jnp.square(y))

    def loss_plain(p):
        y, _ = super_resolution.apply(p, state, x, train=True)
        return jnp.sum(jnp.square(y))

    ga = jax.grad(loss_plain)(params)
    gb = jax.grad(loss)(params)
    for (ka, a), (kb, b) in zip(
            sorted((jax.tree_util.keystr(k), v) for k, v in
                   jax.tree_util.tree_leaves_with_path(ga)),
            sorted((jax.tree_util.keystr(k), v) for k, v in
                   jax.tree_util.tree_leaves_with_path(gb))):
        assert ka == kb
        if ("']['b']" in ka and "bn" not in ka and "upsample" not in ka
                and "initial" not in ka and "hf" not in ka
                and "recon" not in ka):
            continue  # conv-bias before BN: true grad is zero
        d = float(jnp.abs(a - b).max())
        assert d / (float(jnp.abs(a).max()) + 1e-9) < 1e-2, ka


def test_packed_train_forward_matches_plain_stereo():
    """Stereo apply_train_packed (round 5: the last remaining lane-padded
    train path — stem/block-0 at r=4, dual decoders at r=2, every rate
    change fused into a boundary conv) must reproduce apply(train=True):
    outputs and BN running-stat updates to float tolerance; weight/BN
    grads within the reassociation band (measured worst 0.8% rel on the
    block-0 pointwise BN bias). Conv-bias-before-BN grads excluded (true
    grad is zero); the LSTM and C>=128 stages are the same code path so
    their grads agree to float noise."""
    params, state = stereo_separator.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096, 1)) * 0.3

    ya, sa = stereo_separator.apply(params, state, x, train=True)
    yb, sb = stereo_separator.apply_train_packed(params, state, x)
    assert ya.shape == yb.shape == (2, 4096, 2)
    assert float(jnp.abs(ya - yb).max()) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(sa),
                    jax.tree_util.tree_leaves(sb)):
        assert float(jnp.abs(a - b).max()) < 1e-5

    def loss(p, fn, **kw):
        y, _ = fn(p, state, x, **kw)
        return jnp.sum(jnp.square(y))

    ga = jax.grad(lambda p: loss(p, stereo_separator.apply, train=True))(
        params)
    gb = jax.grad(lambda p: loss(p, stereo_separator.apply_train_packed))(
        params)
    flat = lambda g: sorted(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g))
    for (ka, a), (kb, b) in zip(flat(ga), flat(gb)):
        assert ka == kb
        if "']['b']" in ka and "bn" not in ka and "lstm" not in ka:
            continue  # conv-bias before BN: true grad is zero
        d = float(jnp.abs(a - b).max())
        assert d / (float(jnp.abs(a).max()) + 1e-9) < 5e-2, ka

    # router: packed only takes effect for qualifying TRAIN forwards
    ye, _ = stereo_separator.apply(params, state, x, train=False, packed=True)
    yp, _ = stereo_separator.apply(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(ye), np.asarray(yp))


def test_stereo_trainer_routes_packed_with_train_kernel():
    """The stereo Trainer composes packed convs with the fused-VJP
    recurrence: packed_convs=True adds packed=True alongside lstm_impl
    in the differentiated step's kwargs (auto keeps CPU plain)."""
    ds = ToyDataset(n=4, key="stereo", ch=2)
    ds.pairing = "mono_target_stereo"
    params, state = stereo_separator.init(jax.random.PRNGKey(0))
    loader = DataLoader(ds, batch_size=4, num_workers=1, seed=0)
    cfg = TrainConfig(model="stereo_separator", packed_convs=True)
    tr = Trainer("stereo_separator", params, state, loader, None, config=cfg,
                 artifact_config=_quiet_artifacts())
    assert tr._apply_kwargs == {"lstm_impl": "auto", "packed": True}
    loss = tr.train_epoch(jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_explicit_pallas_impl_maps_to_train_kernel():
    """Regression (ADVICE r04): TrainConfig.lstm_impl='pallas' is the
    INFERENCE kernel — under grad it recomputes the scan forward (double
    cost) and rejects bf16 cotangents. The Trainer must route an explicit
    'pallas' to the fused train kernel for the differentiated step while
    keeping it for the no-grad render/eval forwards."""
    ds = ToyDataset(n=4, key="stereo", ch=2)
    ds.pairing = "mono_target_stereo"
    params, state = stereo_separator.init(jax.random.PRNGKey(0))
    loader = DataLoader(ds, batch_size=4, num_workers=1, seed=0)
    cfg = TrainConfig(model="stereo_separator", lstm_impl="pallas")
    tr = Trainer("stereo_separator", params, state, loader, None, config=cfg,
                 artifact_config=_quiet_artifacts())
    assert tr._apply_kwargs == {"lstm_impl": "pallas_train"}
    assert tr._eval_apply_kwargs == {"lstm_impl": "pallas"}


@pytest.mark.slow
def test_pallas_train_loss_trajectory_tracks_scan():
    """VERDICT r04 item 2: pallas_train became the stereo training default
    on a 6-step trajectory; this pins a 52-step trajectory (real Trainer,
    interpret-mode kernels) against the scan under stated bounds.

    Calibrated 2026-08-21 (CHUNK=512, batch 4, lr 1e-3, stats-match loss):
    step-1 losses IDENTICAL (exact gradients at init), step-2 rel diff
    2e-5, then chaotic Adam amplification of ~1e-5 f32 reassociation noise
    peaks at 13.7% (step 30) and ends ~9% — the trajectories are
    different-but-equivalent optimization paths, which is why final
    QUALITY equivalence is certified separately at full budget
    (scripts/pallas_train_cert.py, docs/RESULTS.md). A kernel-gradient
    BUG shows up here as step-1/2 divergence or a non-learning arm."""
    from ml_audio_restoration_tpu.ops.pallas import lstm as plstm

    chunk = 512
    steps = 52

    def sine(i, n):
        t = np.arange(n) / 22050
        x = (0.3 * np.sin(2 * np.pi * (150 + 9 * i) * t)).astype(np.float32)
        return np.stack([x, 0.5 * x])

    class DS:
        pairing = "mono_target_stereo"

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"stereo": sine(i, chunk)}

    shims = {}
    for fn in ("lstm_recurrence_pallas_train", "lstm_recurrence_pallas_bwd",
               "lstm_recurrence_pallas"):
        shims[fn] = getattr(plstm, fn)
        setattr(plstm, fn,
                (lambda o: lambda *a, **k: o(*a, **{**k, "interpret": True})
                 )(shims[fn]))
    try:
        def run(impl):
            params, state = stereo_separator.init(jax.random.PRNGKey(0))
            loader = DataLoader(DS(), batch_size=4, num_workers=1, seed=0)
            cfg = TrainConfig(model="stereo_separator", learning_rate=1e-3,
                              lstm_impl=impl, stats_match_weight=1.0)
            tr = Trainer("stereo_separator", params, state, loader, None,
                         config=cfg, artifact_config=_quiet_artifacts(),
                         sample_rate=22050)
            losses = []
            key = jax.random.PRNGKey(7)
            step = 0
            while step < steps:
                for b in tr.train_loader:
                    tr.state, m = tr._train_step(
                        tr.state, b, jax.random.fold_in(key, step))
                    losses.append(float(m["loss"]))
                    step += 1
                    if step >= steps:
                        break
            return np.array(losses)

        scan = run("scan")
        pallas = run("pallas_train")
    finally:
        for fn, orig in shims.items():
            setattr(plstm, fn, orig)

    rel = np.abs(pallas - scan) / np.maximum(np.abs(scan), 1e-6)
    # exact gradients at init: the first update must match to float noise
    assert rel[0] < 1e-6, f"step-1 loss diverged: {scan[0]} vs {pallas[0]}"
    assert rel[1] < 1e-3, f"step-2 loss diverged: {scan[1]} vs {pallas[1]}"
    # chaotic-but-bounded thereafter (calibrated max 0.137)
    assert rel.max() < 0.25, (
        f"trajectory divergence {rel.max():.3f} at step {rel.argmax()} "
        "exceeds the calibrated chaotic band")
    assert rel[-1] < 0.2, f"final-step divergence {rel[-1]:.3f}"
    # both arms must actually learn
    assert scan[-5:].mean() < 0.6 * scan[0]
    assert pallas[-5:].mean() < 0.6 * pallas[0]


def test_log_audio_samples(tmp_path):
    """Regression: audio logging must be jitted (eager apply stalls) and
    fold_in keys must be non-negative (epoch-10 crash)."""
    from ml_audio_restoration_tpu.train.metrics import MetricsLogger

    ds = ToyDataset(n=4)
    params, state = denoiser.init(jax.random.PRNGKey(0))
    loader = DataLoader(ds, batch_size=4, num_workers=1, seed=0)
    logger = MetricsLogger(tmp_path, "t")
    tr = Trainer("denoiser", params, state, loader, loader,
                 config=TrainConfig(model="denoiser"),
                 artifact_config=_quiet_artifacts(), logger=logger)
    tr.epoch = 10
    tr.log_audio_samples(jax.random.fold_in(jax.random.PRNGKey(0),
                                            1_000_000 + tr.epoch))
    logger.close()
    wavs = list((tmp_path / "audio").glob("*.wav"))
    assert len(wavs) == 3  # degraded / clean / restored


def test_bf16_compute_training_step():
    """compute_dtype='bfloat16' (the TPU AMP analogue) must train with f32
    params/optimizer and finite loss."""
    ds = ToyDataset(n=4)
    params, state = denoiser.init(jax.random.PRNGKey(0))
    loader = DataLoader(ds, batch_size=4, num_workers=1, seed=0)
    cfg = TrainConfig(model="denoiser", compute_dtype="bfloat16")
    tr = Trainer("denoiser", params, state, loader, None, config=cfg,
                 artifact_config=_quiet_artifacts())
    loss = tr.train_epoch(jax.random.PRNGKey(0))
    assert np.isfinite(loss)
    # params stay f32
    leaf = jax.tree_util.tree_leaves(tr.state["params"])[0]
    assert leaf.dtype == jnp.float32


@pytest.mark.parametrize("model_name,module,ds", [
    ("denoiser", denoiser, lambda: ToyDataset(n=8)),
    ("stereo_separator", stereo_separator,
     lambda: ToyDataset(n=8, key="stereo", ch=2, chunk=1024)),
])
def test_bf16_validation_runs(model_name, module, ds):
    """Regression (round 4): compute_dtype='bfloat16' WITH a val_loader.
    The eval path folds BN into the conv weights (fold_conv_bn); with
    bf16-cast params against f32 BN running stats the fold silently
    promoted the folded weights to f32 and the conv crashed on mixed
    dtypes — bf16 training with validation (e.g. the stereo fast-train
    preset on real data) was unusable. fold_conv_bn now computes in f32
    and emits at the conv weight's dtype."""
    dataset = ds()
    if model_name == "stereo_separator":
        dataset.pairing = "mono_target_stereo"
    params, state = module.init(jax.random.PRNGKey(0))
    cfg = TrainConfig(model=model_name, compute_dtype="bfloat16")
    tr = Trainer(model_name, params, state,
                 DataLoader(dataset, batch_size=4, num_workers=1, seed=0),
                 DataLoader(dataset, batch_size=4, num_workers=1, seed=1),
                 config=cfg, artifact_config=_quiet_artifacts())
    assert np.isfinite(tr.train_epoch(jax.random.PRNGKey(1)))
    assert np.isfinite(tr.validate(jax.random.PRNGKey(2)))


# ------------------------------------------------------------- multi-host
# Multi-host correctness is simulated by injecting process index/count:
# the real jax.distributed path differs only in where those numbers come
# from (parallel/distributed.py wrappers).

def test_process_index_sharding_disjoint_and_complete():
    from ml_audio_restoration_tpu.parallel import shard_indices_by_process

    idx = np.random.default_rng(0).permutation(101)
    shards = [shard_indices_by_process(idx, index=k, count=4)
              for k in range(4)]
    # equal step counts on every host (no collective deadlock)
    assert len({len(s) for s in shards}) == 1
    assert len(shards[0]) == 101 // 4
    flat = np.concatenate(shards)
    # disjoint: no file is read by two hosts
    assert len(np.unique(flat)) == len(flat)
    assert set(flat) <= set(idx)


def test_local_batch_size():
    from ml_audio_restoration_tpu.parallel import local_batch_size

    assert local_batch_size(16, count=4) == 4
    assert local_batch_size(16, count=1) == 16
    with pytest.raises(ValueError):
        local_batch_size(10, count=4)


def test_only_primary_writes_checkpoints(tmp_path, monkeypatch):
    """Simulated rank 1 must not write checkpoints; rank 0 must."""
    from ml_audio_restoration_tpu.parallel import distributed as dist_mod

    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.train_epoch(jax.random.PRNGKey(0))

    monkeypatch.setattr(dist_mod, "process_index", lambda: 1)
    tr.save_checkpoint("best_model.msgpack")
    assert not (tmp_path / "best_model.msgpack").exists()

    monkeypatch.setattr(dist_mod, "process_index", lambda: 0)
    tr.save_checkpoint("best_model.msgpack")
    assert (tmp_path / "best_model.msgpack").exists()


def test_train_from_config_shards_loader_and_gates_writers(
        tmp_path, monkeypatch):
    """Two simulated hosts: disjoint train file indices, identical val
    indices (val drives the plateau scheduler host-side — it must be
    bit-identical across hosts), and only rank 0 constructs a logger."""
    from ml_audio_restoration_tpu.audio import save_audio
    from ml_audio_restoration_tpu.config import load_config
    from ml_audio_restoration_tpu.parallel import distributed as dist_mod
    import ml_audio_restoration_tpu.train.trainer as trainer_mod

    data_dir = tmp_path / "raw"
    data_dir.mkdir()
    for i in range(40):  # val split 0.1 -> 4 val files >= local batch 2
        save_audio(data_dir / f"f{i}.wav", _sine(i, CHUNK), SR)

    seen = {}

    real_init = trainer_mod.Trainer.__init__

    def capture_init(self, *a, **kw):
        real_init(self, *a, **kw)
        rank = dist_mod.process_index()
        seen[rank] = {
            "train_idx": set(self.train_loader.indices.tolist()),
            "val_idx": (None if self.val_loader is None
                        else tuple(self.val_loader.indices.tolist())),
            "batch": self.train_loader.batch_size,
            "logger": self.logger is not None,
        }
        raise RuntimeError("stop-before-train")  # config path only

    monkeypatch.setattr(trainer_mod.Trainer, "__init__", capture_init)
    cfg = load_config(None, {
        "train": {"model": "denoiser", "batch_size": 4, "num_epochs": 1,
                  "checkpoint_dir": str(tmp_path / "ck"),
                  "log_dir": str(tmp_path / "runs")},
        "data": {"data_dir": str(data_dir), "chunk_duration": CHUNK / SR},
    })
    for rank in (0, 1):
        monkeypatch.setattr(dist_mod, "process_index", lambda r=rank: r)
        monkeypatch.setattr(dist_mod, "process_count", lambda: 2)
        with pytest.raises(RuntimeError, match="stop-before-train"):
            trainer_mod.train_from_config(cfg)

    assert seen[0]["train_idx"].isdisjoint(seen[1]["train_idx"])
    assert len(seen[0]["train_idx"]) == len(seen[1]["train_idx"])
    assert seen[0]["val_idx"] == seen[1]["val_idx"]
    assert seen[0]["batch"] == seen[1]["batch"] == 2  # 4 global / 2 hosts
    assert seen[0]["logger"] and not seen[1]["logger"]


def test_contrastive_path_trains(tmp_path):
    """Nonzero contrastive weight consumes the dataset's contrastive pairs
    (a capability the reference leaves as a TODO stub,
    semi_supervised.py:85-108,200-203) and trains finitely."""
    from ml_audio_restoration_tpu.parallel import shard_batch

    class ContrastiveToy(ToyDataset):
        pairing = "mixed"

        def __getitem__(self, i):
            syn = 1.0 if i % 2 == 0 else 0.0
            return {"audio": _sine(i),
                    "is_synthetic": np.float32(syn),
                    "contrastive_pair": _sine(i + 17),
                    "contrastive_pair_is_synthetic": np.float32(1.0 - syn),
                    "contrastive_label": np.float32(0.0)}

    ds = ContrastiveToy(n=8)
    params, state = denoiser.init(jax.random.PRNGKey(0))
    loader = DataLoader(ds, batch_size=4, num_workers=1, seed=0)
    cfg = TrainConfig(model="denoiser", learning_rate=1e-3,
                      contrastive_weight=0.1)
    tr = Trainer("denoiser", params, state, loader, None, config=cfg,
                 artifact_config=_quiet_artifacts())

    batch = shard_batch(tr.mesh, next(iter(loader)))
    tr.state, metrics = tr._train_step(tr.state, batch,
                                       jax.random.PRNGKey(1))
    assert "contrastive" in metrics
    assert np.isfinite(float(metrics["contrastive"]))
    assert np.isfinite(float(metrics["loss"]))

    # weight 0 (parity default): the pair is ignored, no component logged
    # (fresh init: the first trainer's donated step consumed its buffers)
    params0, state0 = denoiser.init(jax.random.PRNGKey(0))
    cfg0 = TrainConfig(model="denoiser", learning_rate=1e-3)
    tr0 = Trainer("denoiser", params0, state0, loader, None, config=cfg0,
                  artifact_config=_quiet_artifacts())
    _, metrics0 = tr0._train_step(tr0.state, batch, jax.random.PRNGKey(1))
    assert "contrastive" not in metrics0


def test_resume_falls_back_past_corrupt_checkpoint(tmp_path):
    """A checkpoint corrupted AT REST (saves themselves are atomic) must
    not kill the restart: maybe_resume warns and falls back to the newest
    readable one."""
    import warnings as _warnings

    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.epoch = 1
    tr.save_checkpoint("best_model.msgpack")  # the retention-kept fallback
    tr.epoch = 2
    tr.save_checkpoint("checkpoint_epoch_2.msgpack")
    # corrupt the newest (truncate to half)
    p2 = tmp_path / "checkpoint_epoch_2.msgpack"
    p2.write_bytes(p2.read_bytes()[: p2.stat().st_size // 2])

    tr2 = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr2.checkpoint_dir = tmp_path
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        assert tr2.maybe_resume()
    assert any("unreadable checkpoint" in str(x.message) for x in w)
    assert tr2.epoch == 1  # resumed from the readable epoch-1 file


def test_rejected_checkpoint_leaves_trainer_untouched(tmp_path):
    """A checkpoint that PARSES but lacks a payload key (older/foreign
    writer) must not half-load the trainer: load_checkpoint reads every
    key before mutating self, so a failed maybe_resume really does start
    fresh instead of silently training from the rejected params."""
    import warnings as _warnings

    from ml_audio_restoration_tpu.train import checkpoints as ckpt

    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.epoch = 7
    tr.save_checkpoint("best_model.msgpack")
    # strip a trailing payload key, as an older writer would
    path = tmp_path / "best_model.msgpack"
    payload = ckpt.load_checkpoint(path)
    del payload["history"]
    ckpt.save_checkpoint(path, payload)

    tr2 = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr2.checkpoint_dir = tmp_path
    before = jax.tree_util.tree_leaves(tr2.state["params"])[0].copy()
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        assert not tr2.maybe_resume()
    assert any("unreadable checkpoint" in str(x.message) for x in w)
    assert tr2.epoch == 0  # untouched — not the rejected file's 7
    after = jax.tree_util.tree_leaves(tr2.state["params"])[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_async_checkpoint_failure_surfaces_and_retention_waits(tmp_path):
    """A background checkpoint-write failure must be re-raised at the next
    wait()/save(), and retention cleanup must only run after the new file's
    atomic rename lands (never deleting old checkpoints while the write is
    in flight / failed)."""
    from ml_audio_restoration_tpu.train.checkpoints import (
        AsyncCheckpointer, all_checkpoints)

    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.epoch = 1
    tr.save_checkpoint("checkpoint_epoch_1.msgpack")
    tr.epoch = 2
    tr.save_checkpoint("checkpoint_epoch_2.msgpack", async_=True)
    tr._async_ckpt.wait()
    names = [p.name for p in all_checkpoints(tmp_path)]
    assert "checkpoint_epoch_2.msgpack" in names  # async write landed
    assert "checkpoint_epoch_1.msgpack" not in names  # then retention ran

    ac = AsyncCheckpointer()
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("")  # parent 'directory' is a file -> write fails
    ac.save(blocker / "x" / "ckpt.msgpack", {"a": np.zeros(3)})
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ac.wait()
    ac.wait()  # error is consumed, not re-raised forever


def test_abandoned_loader_iterator_releases_worker(tmp_path):
    """Breaking out of a DataLoader mid-epoch (SIGINT path) or taking one
    batch via next(iter(...)) must not leak the prefetch worker blocked in
    q.put forever."""
    import gc
    import threading
    import time as _time

    from ml_audio_restoration_tpu.data.loader import DataLoader

    before = threading.active_count()
    for _ in range(3):
        it = iter(DataLoader(ToyDataset(n=64), 2, num_workers=1,
                             prefetch=1, shuffle=False))
        next(it)
        del it  # abandoned: generator finally sets stop on GC
    gc.collect()
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_maybe_resume_multi_host_agreement(tmp_path, monkeypatch):
    """Multi-host resume: non-primary ranks load exactly the checkpoint
    rank 0 broadcast — and raise (no silent divergence) when they can't."""
    from ml_audio_restoration_tpu.parallel import distributed as dist

    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.epoch = 5
    tr.save_checkpoint("checkpoint_epoch_5.msgpack")

    sent = {}
    monkeypatch.setattr(dist, "process_count", lambda: 2)
    # primary: walks the list, broadcasts its choice
    monkeypatch.setattr(dist, "is_primary", lambda: True)
    monkeypatch.setattr(dist, "broadcast_from_primary",
                        lambda s: sent.setdefault("name", s))
    tr2 = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr2.checkpoint_dir = tmp_path
    assert tr2.maybe_resume() and tr2.epoch == 5
    assert sent["name"] == "checkpoint_epoch_5.msgpack"

    # non-primary: loads the broadcast name, ignoring its own walk
    monkeypatch.setattr(dist, "is_primary", lambda: False)
    monkeypatch.setattr(dist, "broadcast_from_primary",
                        lambda s: "checkpoint_epoch_5.msgpack")
    tr3 = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr3.checkpoint_dir = tmp_path
    assert tr3.maybe_resume() and tr3.epoch == 5

    # non-primary that cannot read the agreed file must raise, not diverge
    monkeypatch.setattr(dist, "broadcast_from_primary",
                        lambda s: "checkpoint_epoch_99.msgpack")
    tr4 = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr4.checkpoint_dir = tmp_path
    with pytest.raises(Exception):
        tr4.maybe_resume()


def test_checkpoint_rejects_wrong_model_family(tmp_path):
    """A checkpoint self-describes its model family; loading a denoiser
    checkpoint into an SR trainer must raise (opt_state is rebuilt from
    the payload's own params, so every structural check is
    self-consistent and the mismatch would otherwise 'load')."""
    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.save_checkpoint("checkpoint_epoch_1.msgpack")

    tr2 = _make_trainer("super_resolution", super_resolution,
                        ToyDataset(n=4), upscale_factor=2)
    tr2.checkpoint_dir = tmp_path
    before = jax.tree_util.tree_leaves(tr2.state["params"])
    with pytest.raises(ValueError, match="is for model"):
        tr2.load_checkpoint("checkpoint_epoch_1.msgpack")
    # the trainer is untouched: params unchanged, epoch still fresh
    assert tr2.epoch == 0
    after = jax.tree_util.tree_leaves(tr2.state["params"])
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plateau_wait_survives_resume(tmp_path):
    """The plateau patience counter is scheduler state: a crash/resume
    mid-plateau must not restart the count (that defers the LR cut by up
    to plateau_patience extra epochs vs ReduceLROnPlateau semantics)."""
    tr = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr.checkpoint_dir = tmp_path
    tr.best_val_loss = 1.0
    for _ in range(2):
        tr._plateau_step(2.0)  # no improvement: wait = 2
    assert tr._plateau_wait == 2
    tr.save_checkpoint("checkpoint_epoch_1.msgpack")

    tr2 = _make_trainer("denoiser", denoiser, ToyDataset(n=4))
    tr2.checkpoint_dir = tmp_path
    assert tr2.maybe_resume()
    assert tr2._plateau_wait == 2


def test_retention_failure_warns_not_fails(tmp_path):
    """A retention failure after a successful async write must surface as
    a warning, not abort training claiming the checkpoint is missing."""
    import warnings
    from ml_audio_restoration_tpu.train.checkpoints import AsyncCheckpointer

    ac = AsyncCheckpointer()

    def bad_retention():
        raise PermissionError("cleanup denied")

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ac.save(tmp_path / "ck.msgpack", {"params": np.zeros(3)},
                on_done=bad_retention)
        ac.wait()  # must NOT raise: the checkpoint is on disk
    assert (tmp_path / "ck.msgpack").exists()
    assert any("retention" in str(w.message) for w in caught)


def test_val_batch_rounded_to_shard_granularity(tmp_path, monkeypatch):
    """train_from_config must round the clamped validation batch down to
    the mesh 'data' granularity — otherwise validate()'s shard_batch
    raises after a full epoch of training (data_parallel=4, val split of
    6 items, train batch 8: the old clamp picked val_bs=6, which a 4-way
    'data' axis cannot shard)."""
    from ml_audio_restoration_tpu.audio import save_audio
    from ml_audio_restoration_tpu.config import load_config
    import ml_audio_restoration_tpu.train.trainer as trainer_mod

    files_dir = tmp_path / "data"
    files_dir.mkdir()
    for i in range(60):  # val split 0.1 -> 6 items
        save_audio(files_dir / f"f{i}.wav", _sine(i, CHUNK), SR)

    seen = {}
    real_init = trainer_mod.Trainer.__init__

    def capture_init(self, *a, **kw):
        real_init(self, *a, **kw)
        seen["val_bs"] = (None if self.val_loader is None
                          else self.val_loader.batch_size)
        raise RuntimeError("stop-before-train")

    monkeypatch.setattr(trainer_mod.Trainer, "__init__", capture_init)
    cfg = load_config(None, {
        "train": {"model": "denoiser", "batch_size": 8, "num_epochs": 1,
                  "data_parallel": 4,
                  "checkpoint_dir": str(tmp_path / "ck"),
                  "log_dir": str(tmp_path / "runs")},
        "data": {"data_dir": str(files_dir), "chunk_duration": CHUNK / SR},
    })
    with pytest.raises(RuntimeError, match="stop-before-train"):
        trainer_mod.train_from_config(cfg)
    assert seen["val_bs"] == 4  # 6 clamped down to the 4-way granularity


def test_ema_tracks_weights_and_drives_eval(tmp_path):
    """ema_decay > 0: the train step maintains an exact exponential moving
    average of the params, validation/rendering use it (eval_state), the
    checkpoint round-trips it, and a pre-EMA checkpoint re-seeds the
    average from the loaded params."""
    params, state = denoiser.init(jax.random.PRNGKey(0))
    loader = DataLoader(ToyDataset(n=4), batch_size=4, num_workers=1, seed=0)
    cfg = TrainConfig(model="denoiser", learning_rate=1e-3, num_epochs=1,
                      ema_decay=0.9, checkpoint_dir=str(tmp_path))
    tr = Trainer("denoiser", params, state, loader, None, config=cfg,
                 artifact_config=_quiet_artifacts())

    # manual replay: ema_{t+1} = d*ema_t + (1-d)*params_{t+1}
    want_ema = jax.tree_util.tree_map(np.asarray, tr.state["params"])
    for i, batch in enumerate(DataLoader(ToyDataset(n=4), batch_size=4,
                                         num_workers=1, seed=0)):
        from ml_audio_restoration_tpu.parallel import shard_batch

        b = shard_batch(tr.mesh, batch)
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)
        tr.state, _ = tr._train_step(tr.state, b, key)
        want_ema = jax.tree_util.tree_map(
            lambda e, p: 0.9 * e + 0.1 * np.asarray(p),
            want_ema, tr.state["params"])

    got = jax.tree_util.tree_map(np.asarray, tr.state["ema_params"])
    flat_g = jax.tree_util.tree_leaves(got)
    flat_w = jax.tree_util.tree_leaves(want_ema)
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(g, w, atol=1e-6)
    # ema differs from the live params and eval_state serves it
    p0 = jax.tree_util.tree_leaves(tr.state["params"])[0]
    e0 = jax.tree_util.tree_leaves(tr.state["ema_params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))
    es = tr.eval_state()
    assert es["params"] is tr.state["ema_params"]

    # checkpoint round-trip preserves the average (fresh init per trainer:
    # the donated train step consumed the first trainer's input buffers)
    tr.save_checkpoint("best_model.msgpack")
    params2, state2 = denoiser.init(jax.random.PRNGKey(7))
    tr2 = Trainer("denoiser", params2, state2, loader, None, config=cfg,
                  artifact_config=_quiet_artifacts())
    tr2.load_checkpoint("best_model.msgpack")
    for g, w in zip(jax.tree_util.tree_leaves(tr2.state["ema_params"]),
                    flat_g):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-7)

    # pre-EMA checkpoint (ema off at save time) re-seeds ema = params
    cfg_off = TrainConfig(model="denoiser", num_epochs=1,
                          checkpoint_dir=str(tmp_path / "off"))
    params3, state3 = denoiser.init(jax.random.PRNGKey(8))
    tr3 = Trainer("denoiser", params3, state3, loader, None, config=cfg_off,
                  artifact_config=_quiet_artifacts())
    assert "ema_params" not in tr3.state
    tr3.save_checkpoint("best_model.msgpack")
    params4, state4 = denoiser.init(jax.random.PRNGKey(9))
    tr4 = Trainer("denoiser", params4, state4, loader, None,
                  config=TrainConfig(model="denoiser", num_epochs=1,
                                     ema_decay=0.9,
                                     checkpoint_dir=str(tmp_path / "off")),
                  artifact_config=_quiet_artifacts())
    tr4.load_checkpoint("best_model.msgpack")
    for e, p in zip(jax.tree_util.tree_leaves(tr4.state["ema_params"]),
                    jax.tree_util.tree_leaves(tr4.state["params"])):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))


def test_max_grad_norm_clips_and_huge_bound_is_identity(tmp_path):
    """max_grad_norm: a tiny bound changes the first update; a bound that
    never triggers matches the unclipped trainer to float rounding (optax
    scales by max/maximum(norm, max), so the no-op is a *1.0-epsilon
    multiply, not an exact identity), and the plateau scheduler's
    hyperparam path still works through the chained optimizer."""
    from ml_audio_restoration_tpu.parallel import shard_batch

    def one_step(max_norm):
        params, state = denoiser.init(jax.random.PRNGKey(0))
        loader = DataLoader(ToyDataset(n=4), batch_size=4, num_workers=1,
                            seed=0)
        cfg = TrainConfig(model="denoiser", learning_rate=1e-3, num_epochs=1,
                          max_grad_norm=max_norm,
                          checkpoint_dir=str(tmp_path))
        tr = Trainer("denoiser", params, state, loader, None, config=cfg,
                     artifact_config=_quiet_artifacts())
        batch = shard_batch(tr.mesh, next(iter(loader)))
        tr.state, _ = tr._train_step(tr.state, batch, jax.random.PRNGKey(1))
        return tr

    base = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, one_step(0.0).state["params"]))
    huge = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, one_step(1e9).state["params"]))
    tiny_tr = one_step(1e-4)
    tiny = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tiny_tr.state["params"]))
    for b, h in zip(base, huge):
        np.testing.assert_allclose(b, h, rtol=1e-4, atol=1e-8)
    assert any(not np.allclose(b, t) for b, t in zip(base, tiny))
    # plateau LR mutation path works on the chained opt state
    tiny_tr.best_val_loss = 0.0
    for _ in range(tiny_tr.cfg.plateau_patience + 1):
        tiny_tr._plateau_step(1.0)
    assert tiny_tr.lr < 1e-3
    got = float(np.asarray(
        tiny_tr.state["opt_state"].hyperparams["learning_rate"]))
    assert abs(got - tiny_tr.lr) < 1e-9  # f32 storage of the hyperparam
