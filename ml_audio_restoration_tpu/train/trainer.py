"""Training runtime.

Capability parity with the reference Trainer
(/root/reference/src/training/trainer.py:15-761) — Adam, ReduceLROnPlateau
(patience 5, factor 0.5), combined time+spectral loss with per-model auxiliary
losses, checkpoint/resume with best+latest retention, metrics every 50 steps,
periodic test-audio rendering — rebuilt TPU-first:

- ONE jitted train step containing the whole batch pipeline: on-device 78rpm
  degradation (data/artifacts.py), forward, loss, backward, Adam update.
  The reference's host-side scipy degradation + num_workers=0 loader is
  replaced by device synthesis + a prefetching host loader that only reads
  files.
- Data parallelism by sharding: the step is compiled over a ('data','model')
  mesh with the batch sharded on 'data' and params replicated. XLA's SPMD
  partitioner inserts the gradient all-reduce; batch-norm batch statistics
  are global-batch statistics automatically (sync-BN for free). The reference
  has no multi-device training at all (SURVEY.md §2.7).
- The plateau scheduler mutates optax's injected learning_rate hyperparam
  between epochs on the host — no recompile.
- AMP equivalence: compute_dtype='bfloat16' runs forward/backward in bf16
  with f32 params/optimizer (the TPU-native analogue of the reference's
  GradScaler AMP, which it disables on Jetson anyway, trainer.py:89-96).
- SIGINT: finish the current step, checkpoint, then exit cleanly (the
  reference hard-exits with os._exit(0), trainer.py:113-119).
"""
from __future__ import annotations

import signal
import time
from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import Config, TrainConfig, ArtifactConfig
from ..models import denoiser, super_resolution, stereo_separator, count_params
from ..losses import (
    restoration_loss,
    semi_supervised_loss,
    contrastive_loss,
    stereo_metrics,
)
from ..ops import interp_linear
from ..data.artifacts import simulate_batch, simulate_vinyl_artifacts
from ..parallel import make_mesh, shard_batch, replicate
from ..parallel import distributed as dist
from . import checkpoints as ckpt
from .metrics import MetricsLogger

MODEL_MODULES = {
    "denoiser": denoiser,
    "super_resolution": super_resolution,
    "stereo_separator": stereo_separator,
}


def _nwc(x):
    """[B, C, T] host layout -> [B, T, C] device layout."""
    return jnp.transpose(x, (0, 2, 1))


class Trainer:
    def __init__(self, model_name: str, model_params, model_state,
                 train_loader, val_loader=None, *,
                 config: Optional[TrainConfig] = None,
                 artifact_config: Optional[ArtifactConfig] = None,
                 sample_rate: int = 22050,
                 pairing: Optional[str] = None,
                 logger: Optional[MetricsLogger] = None):
        self.cfg = config or TrainConfig(model=model_name)
        self.artifact_cfg = artifact_config or ArtifactConfig()
        self.model_name = model_name
        self.module = MODEL_MODULES[model_name]
        self.sample_rate = sample_rate
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.pairing = pairing or getattr(train_loader.dataset, "pairing",
                                          "degrade")
        self.compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        # stereo recurrence impl (TrainConfig.lstm_impl): the fused Pallas
        # forward+backward VJP on TPU (285 -> 124 ms/step measured, exact
        # grads vs the scan — ops/lstm.py::lstm_recurrence_train), the
        # scan on CPU / for the conv-only families (their apply() takes no
        # impl kwarg)
        self._apply_kwargs = {}
        self._eval_apply_kwargs = {}
        if model_name in ("denoiser", "super_resolution"):
            # packed (space-to-depth) train forward for the lane-padded
            # low-C stages (TrainConfig.packed_convs: None = auto on TPU).
            # apply() itself falls back to the plain path for eval
            # forwards and non-qualifying shapes (t % 4, channels).
            on_tpu = jax.devices()[0].platform == "tpu"
            if (self.cfg.packed_convs
                    if self.cfg.packed_convs is not None else on_tpu):
                self._apply_kwargs = {"packed": True}
        if model_name == "stereo_separator":
            on_tpu = jax.devices()[0].platform == "tpu"
            impl = self.cfg.lstm_impl or (
                "pallas_train" if on_tpu else "auto")
            if impl == "pallas":
                # the INFERENCE kernel under grad recomputes the scan
                # forward in its VJP (paying both kernels) and rejects
                # bf16 cotangents outright — an explicit 'pallas' means
                # "the Pallas recurrence", which for the differentiated
                # step is the fused train kernel
                impl = "pallas_train"
            self._apply_kwargs = {"lstm_impl": impl}
            # packed (space-to-depth) conv stages compose with the fused
            # recurrence: the LSTM runs plain either way, only the
            # lane-padded conv stages change formulation
            if (self.cfg.packed_convs
                    if self.cfg.packed_convs is not None else on_tpu):
                self._apply_kwargs["packed"] = True
            # no-grad render/eval forwards take the inference kernel (no
            # residual writes); an explicit config choice applies to both
            self._eval_apply_kwargs = {"lstm_impl": self.cfg.lstm_impl or (
                "pallas" if on_tpu else "auto")}
        # SR training derives the low-rate input from the high-rate target;
        # the factor comes from the model itself (2 per transpose-conv stage)
        self._sr_factor = (2 ** len(model_params["upsample"])
                           if model_name == "super_resolution" else 2)

        self.mesh = make_mesh(data_parallel=self.cfg.data_parallel)
        self.logger = logger

        # optimizer with a host-mutable learning rate (plateau scheduling).
        # Optional global-norm clipping is chained INSIDE the injected
        # factory so opt_state.hyperparams["learning_rate"] stays at the
        # top level either way (the plateau scheduler mutates it there).
        if self.cfg.max_grad_norm > 0:
            clip = self.cfg.max_grad_norm

            def _base(learning_rate):
                return optax.chain(optax.clip_by_global_norm(clip),
                                   optax.adam(learning_rate))
        else:
            _base = optax.adam
        self.tx = optax.inject_hyperparams(_base)(
            learning_rate=self.cfg.learning_rate)
        opt_state = self.tx.init(model_params)

        state = {
            "params": model_params,
            "model_state": model_state,
            "opt_state": opt_state,
        }
        if self.cfg.ema_decay > 0:
            # distinct host copies so params/ema never alias one device
            # buffer (the train step donates `state`; an aliased buffer
            # appearing as two donated leaves is an XLA error)
            state["ema_params"] = jax.tree_util.tree_map(
                lambda x: np.array(x), model_params)
        self.state = replicate(self.mesh, state)

        # host-side progress
        self.epoch = 0
        self.global_step = 0
        self.best_val_loss = float("inf")
        self.lr = self.cfg.learning_rate
        self._plateau_wait = 0
        self.history = {"train_loss": [], "val_loss": [], "learning_rate": []}
        self.checkpoint_dir = Path(self.cfg.checkpoint_dir)

        self._train_step = jax.jit(
            partial(self._step, train=True),
            static_argnames=(), donate_argnames=("state",))
        self._eval_step = jax.jit(partial(self._step, train=False))
        self._render_step = jax.jit(self._render)

        # SIGINT -> checkpoint + clean exit; the handler is installed only
        # for the duration of train() (and restored after), so Ctrl-C
        # outside the train loop keeps its normal KeyboardInterrupt meaning
        self.interrupted = False

    # ------------------------------------------------------------ stepping
    def _on_sigint(self, sig, frame):
        print("\ninterrupt: finishing step, checkpointing, then exiting...")
        self.interrupted = True

    def _derive(self, batch, key):
        """Build (inputs, targets) on-device from a host batch — the
        dataset-pairing contract (data/datasets.py docstrings)."""
        p = self.pairing
        if p == "degrade":
            clean = batch["clean"]
            degraded = simulate_batch(key, clean, self.sample_rate,
                                      self.artifact_cfg)
            return _nwc(degraded), _nwc(clean)
        if p == "degrade_adaptive":
            clean = batch["clean"]
            keys = jax.random.split(key, clean.shape[0])
            degraded = jax.vmap(
                lambda k, x, r, a, n: simulate_vinyl_artifacts(
                    k, x, self.sample_rate, self.artifact_cfg,
                    overrides={"impulse_rate": r,
                               "impulse_amplitude_max": a,
                               "noise_level": n}))(
                keys, clean, batch["impulse_rate"],
                batch["impulse_amplitude_max"], batch["noise_level"])
            return _nwc(degraded), _nwc(clean)
        if p == "identity":
            x = _nwc(batch["clean"])
            return x, x
        if p == "mono_target_stereo":
            stereo = _nwc(batch["stereo"])  # [B, T, 2]
            mono = jnp.mean(stereo, axis=-1, keepdims=True)
            return mono, stereo
        if p == "downsample":
            high = _nwc(batch["high"])  # [B, T_hi, 1]
            low = interp_linear(high, high.shape[1] // self._sr_factor)
            return low, high
        if p == "mixed":
            audio = batch["audio"]  # [B, 1, T]; clean if synthetic else real
            syn = batch["is_synthetic"][:, None, None]
            degraded = simulate_batch(key, audio, self.sample_rate,
                                      self.artifact_cfg)
            inputs = jnp.where(syn > 0, degraded, audio)
            return _nwc(inputs), _nwc(audio)
        raise ValueError(f"unknown pairing {self.pairing!r}")

    def _loss(self, params, model_state, inputs, targets, batch, key,
              train: bool):
        dtype = self.compute_dtype
        out, new_state = self.module.apply(
            jax.tree_util.tree_map(lambda x: x.astype(dtype), params),
            model_state, inputs.astype(dtype), train=train,
            **self._apply_kwargs)
        out = out.astype(jnp.float32)
        if self.pairing == "mixed":
            k_cycle, k_pair = jax.random.split(key)
            # one cast, shared by the cycle-consistency re-inference and the
            # contrastive encoder below: both run full extra forwards, so
            # leaving either in f32 forfeits the bf16 speedup the primary
            # forward pays for (the loss math itself stays f32)
            cast_params = jax.tree_util.tree_map(
                lambda x: x.astype(dtype), params)

            def model_fn(x):
                y, _ = self.module.apply(cast_params, model_state,
                                         x.astype(dtype), train=False,
                                         **self._apply_kwargs)
                return y.astype(jnp.float32)

            def redegrade(x):
                deg = simulate_batch(k_cycle, jnp.transpose(x, (0, 2, 1)),
                                     self.sample_rate, self.artifact_cfg)
                return jnp.transpose(deg, (0, 2, 1))

            total, parts = semi_supervised_loss(
                out, inputs, targets, batch["is_synthetic"],
                model_fn=model_fn, redegrade_fn=redegrade)
            if (self.cfg.contrastive_weight > 0
                    and "contrastive_pair" in batch):
                # Opposite-type pair per item (data/datasets.py:200-213;
                # reference pairs: mixed_dataset.py:143-157, loss stub:
                # semi_supervised.py:85-108 wired as TODO at :200-203).
                # Synthetic-type pair audio arrives CLEAN and is degraded
                # on-device, mirroring how the main input was derived.
                pair = batch["contrastive_pair"]  # [B, 1, T]
                pair_syn = batch["contrastive_pair_is_synthetic"]
                degraded = simulate_batch(k_pair, pair, self.sample_rate,
                                          self.artifact_cfg)
                pair_in = _nwc(jnp.where(pair_syn[:, None, None] > 0,
                                         degraded, pair))
                # embeddings: time-pooled bottleneck features of the two
                # same-network inputs, run in the configured compute dtype
                # like the primary forward pass (f32 encoder passes would
                # shrink the measured bf16 train-step speedup)
                emb_a = jnp.mean(self.module.encode(
                    cast_params, model_state, inputs.astype(dtype)),
                    axis=1).astype(jnp.float32)
                emb_b = jnp.mean(self.module.encode(
                    cast_params, model_state, pair_in.astype(dtype)),
                    axis=1).astype(jnp.float32)
                contr = contrastive_loss(emb_a, emb_b,
                                         batch["contrastive_label"])
                parts["contrastive"] = contr
                total = total + self.cfg.contrastive_weight * contr
                parts["total"] = total
        else:
            c = self.cfg
            total, parts = restoration_loss(
                out, targets,
                time_weight=c.time_weight,
                si_sdr_weight=c.si_sdr_weight,
                spectral_weight=c.spectral_weight,
                impulse_weight=c.impulse_weight,
                clustering_weight=c.clustering_weight,
                consistency_weight=c.consistency_weight,
                balance_weight=c.balance_weight,
                decorrelation_weight=c.decorrelation_weight,
                lf_centering_weight=c.lf_centering_weight,
                stats_match_weight=c.stats_match_weight)
        return total, (parts, new_state, out)

    def _step(self, state, batch, key, train: bool):
        k_data, k_loss = jax.random.split(key)
        inputs, targets = self._derive(batch, k_data)
        if train:
            grad_fn = jax.value_and_grad(self._loss, has_aux=True)
            (loss, (parts, new_model_state, out)), grads = grad_fn(
                state["params"], state["model_state"], inputs, targets,
                batch, k_loss, True)
            updates, new_opt = self.tx.update(grads, state["opt_state"],
                                              state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {"params": new_params,
                         "model_state": new_model_state,
                         "opt_state": new_opt}
            if "ema_params" in state:
                d = jnp.float32(self.cfg.ema_decay)
                new_state["ema_params"] = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state["ema_params"], new_params)
        else:
            loss, (parts, _, out) = self._loss(
                state["params"], state["model_state"], inputs, targets,
                batch, k_loss, False)
            new_state = state
        metrics = {k: v for k, v in parts.items()}
        metrics["loss"] = loss
        if out.shape[-1] == 2:
            metrics.update(stereo_metrics(out))
        return new_state, metrics

    # ------------------------------------------------------------- epochs
    def train_epoch(self, key) -> float:
        # No per-step host sync: float(loss) every step costs one ~25 ms
        # dispatch round trip against 59-285 ms device steps (VERDICT r02).
        # The loss is accumulated as a lazy device scalar (async tiny add per
        # step) and read back only at the logging cadence and at epoch end,
        # so the host runs ahead and steps pipeline back-to-back on device.
        total = jnp.zeros((), jnp.float32)
        n = 0
        # multi-host: a rank-local break (SIGINT delivered to one host)
        # would strand the other ranks in the step's cross-host all-reduce
        # forever — the break decision is AGREED at the 50-step host-sync
        # cadence (one tiny DCN collective, bounded staleness). Single-host
        # keeps the immediate per-step check.
        multi = dist.process_count() > 1
        agreed_stop = False
        for i, batch in enumerate(self.train_loader):
            if multi:
                if i % 50 == 0:
                    agreed_stop = dist.agree_flag(self.interrupted)
                if agreed_stop:
                    self.interrupted = True  # converge the local flag
                    break
            elif self.interrupted:
                break
            batch = shard_batch(self.mesh, batch)
            step_key = jax.random.fold_in(key, i)
            self.state, metrics = self._train_step(self.state, batch,
                                                   step_key)
            total = total + metrics["loss"]
            n += 1
            if self.logger and self.global_step % 50 == 0:
                # host sync happens here only (every 50 steps, the
                # reference's own metrics cadence, trainer.py:15-761)
                self.logger.add_scalar("Loss/train_batch",
                                       float(metrics["loss"]),
                                       self.global_step)
                self.logger.add_scalar("Learning_Rate", self.lr,
                                       self.global_step)
                for tag in ("correlation", "width"):
                    if tag in metrics:
                        self.logger.add_scalar(f"Stereo/{tag}",
                                               float(metrics[tag]),
                                               self.global_step)
            self.global_step += 1
        return float(total) / max(n, 1)

    def eval_state(self):
        """State used for validation/rendering/test outputs: the EMA-averaged
        weights when ema_decay > 0 (evaluate-the-averaged-model practice),
        else the live params. Same pytree structure either way, so the
        jitted eval/render programs are shared."""
        if "ema_params" in self.state:
            st = dict(self.state)
            st["params"] = st["ema_params"]
            return st
        return self.state

    def validate(self, key) -> float:
        if self.val_loader is None:
            return 0.0
        total = jnp.zeros((), jnp.float32)
        n = 0
        for i, batch in enumerate(self.val_loader):
            batch = shard_batch(self.mesh, batch)
            _, metrics = self._eval_step(self.eval_state(), batch,
                                         jax.random.fold_in(key, i))
            total = total + metrics["loss"]
            n += 1
        return float(total) / max(n, 1)

    def _plateau_step(self, val_loss: float):
        """ReduceLROnPlateau(min, patience=5, factor=0.5) semantics."""
        if val_loss < self.best_val_loss - 1e-8:
            self._plateau_wait = 0
        else:
            self._plateau_wait += 1
            if self._plateau_wait > self.cfg.plateau_patience:
                self.lr *= self.cfg.plateau_factor
                self._plateau_wait = 0
                self.state["opt_state"].hyperparams["learning_rate"] = (
                    jnp.asarray(self.lr, jnp.float32))
                if self.logger:
                    self.logger.add_text(
                        "lr", f"reduced to {self.lr:.2e}", self.global_step)

    def train(self, num_epochs: Optional[int] = None,
              save_every: Optional[int] = None, test_audio_fn=None):
        num_epochs = num_epochs or self.cfg.num_epochs
        save_every = save_every or self.cfg.save_every
        base_key = jax.random.PRNGKey(self.cfg.seed)
        print(f"training {self.model_name} on mesh {self.mesh.shape} — "
              f"{count_params(self.state['params']):,} params")

        prev_sigint = None
        try:
            prev_sigint = signal.signal(signal.SIGINT, self._on_sigint)
        except ValueError:  # not in main thread (tests)
            pass
        try:
            return self._train_loop(num_epochs, save_every, base_key,
                                    test_audio_fn)
        finally:
            # surface any background checkpoint-write failure and make sure
            # the last async write landed before the process can exit
            if hasattr(self, "_async_ckpt"):
                self._async_ckpt.wait()
            if prev_sigint is not None:
                signal.signal(signal.SIGINT, prev_sigint)

    def _train_loop(self, num_epochs, save_every, base_key, test_audio_fn):
        for epoch in range(self.epoch, num_epochs):
            self.epoch = epoch + 1
            start = time.time()
            train_loss = self.train_epoch(
                jax.random.fold_in(base_key, 2 * self.epoch))
            if self._interrupted_all():
                # checkpoint the partial epoch IMMEDIATELY — a failure in
                # validation/logging/rendering must not lose the progress
                # the interrupt handler promised to persist
                self.save_checkpoint(ckpt.epoch_checkpoint_name(self.epoch))
                break
            val_loss = self.validate(
                jax.random.fold_in(base_key, 2 * self.epoch + 1))
            self._plateau_step(val_loss)
            hook = getattr(self.train_loader.dataset, "on_epoch_end", None)
            if hook is not None:  # AdaptiveArtifactDataset re-analysis
                hook()

            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)
            self.history["learning_rate"].append(self.lr)

            took = time.time() - start
            if self.logger:
                self.logger.add_scalar("Loss/train_epoch", train_loss,
                                       self.epoch)
                if self.val_loader is not None:
                    self.logger.add_scalar("Loss/val_epoch", val_loss,
                                           self.epoch)
                self.logger.add_scalar("Time/epoch_duration", took,
                                       self.epoch)
            # audio samples every 10 epochs (reference trainer.py:508-510).
            # Deliberately OUTSIDE the logger gate: the render is a
            # global-mesh SPMD program, so on multi-host EVERY rank must
            # enter it (only rank 0 has a logger and writes the wavs) —
            # a rank-0-only call would leave the other ranks running the
            # next epoch's train collectives against it and hang the job
            if self.epoch % 10 == 0 and self.val_loader is not None:
                self.log_audio_samples(
                    jax.random.fold_in(base_key, 1_000_000 + self.epoch))
            val_txt = (f"val {val_loss:.6f}"
                       if self.val_loader is not None else "val -")
            print(f"epoch {self.epoch}/{num_epochs} {took:.2f}s "
                  f"train {train_loss:.6f} {val_txt}")

            if self.epoch % save_every == 0:
                self.save_checkpoint(ckpt.epoch_checkpoint_name(self.epoch))
                if test_audio_fn:
                    test_audio_fn(self, f"epoch_{self.epoch}")
            if self.val_loader is not None and val_loss < self.best_val_loss:
                self.best_val_loss = val_loss
                self.save_checkpoint("best_model.msgpack")
                if test_audio_fn:
                    test_audio_fn(self, "best")
            if self._interrupted_all():  # SIGINT during validate/logging
                self.save_checkpoint(ckpt.epoch_checkpoint_name(self.epoch))
                break
        return self.history

    def _interrupted_all(self) -> bool:
        """Rank-agreed interrupt state (identity single-host). Call sites
        must be reached the same number of times on every rank — the
        agreement is a collective."""
        if dist.process_count() > 1:
            self.interrupted = dist.agree_flag(self.interrupted)
        return self.interrupted

    def _render(self, state, batch, key):
        """(inputs, targets, restored) for audio logging — jit-compiled."""
        inputs, targets = self._derive(batch, key)
        out, _ = self.module.apply(state["params"], state["model_state"],
                                   inputs, train=False,
                                   **self._eval_apply_kwargs)
        return inputs, targets, out

    def log_audio_samples(self, key):
        """Render one validation item and log degraded/clean/restored audio
        (reference log_audio_samples, trainer.py:542-580; stereo channels
        are written as separate tracks by MetricsLogger's wav sink).

        Rank discipline: the render itself runs on EVERY rank (it is a
        jit over the global mesh — see the call site in train()); only a
        rank with a logger writes files. The val loader is unsharded and
        seeded, so all ranks feed the same batch."""
        if self.val_loader is None:
            return
        batch = next(iter(self.val_loader), None)
        if batch is None:
            return
        batch = shard_batch(self.mesh, batch)
        inputs, targets, out = self._render_step(self.eval_state(), batch,
                                                 key)
        if self.logger is None:
            return
        for tag, arr in (("degraded", inputs), ("clean", targets),
                         ("restored", out)):
            if arr.is_fully_addressable:
                row = np.asarray(arr[0])
            else:
                # multi-host: this rank sees only its shard of the
                # data-sharded output; log its first local item
                row = np.asarray(arr.addressable_data(0))[0]
            self.logger.add_audio(f"Audio/{tag}", row.T, self.sample_rate,
                                  self.epoch)

    # --------------------------------------------------------- checkpoints
    def save_checkpoint(self, filename: str, async_: bool = False):
        # multi-host: params/opt state are replicated, so only rank 0 writes
        # (every process writing the same path on shared storage is the
        # corruption race the reference never had to think about)
        if not dist.is_primary():
            return
        path = self.checkpoint_dir / filename
        payload = {
            "params": self.state["params"],
            "model_state": self.state["model_state"],
            "opt_state": _opt_state_to_tree(self.state["opt_state"]),
            "epoch": np.asarray(self.epoch),
            "global_step": np.asarray(self.global_step),
            "best_val_loss": np.asarray(self.best_val_loss),
            "lr": np.asarray(self.lr),
            "history": {k: np.asarray(v, np.float64)
                        for k, v in self.history.items()},
            "model_name": self.model_name,
            # plateau-scheduler patience counter: without it a resume mid-
            # plateau restarts the count and defers the LR cut by up to
            # plateau_patience extra epochs vs ReduceLROnPlateau semantics
            "plateau_wait": np.asarray(self._plateau_wait),
        }
        if "ema_params" in self.state:
            payload["ema_params"] = self.state["ema_params"]
        def retain():
            # retention must run only AFTER the new checkpoint's atomic
            # rename lands: deleting the older epoch checkpoints while the
            # write is still in flight leaves zero epoch checkpoints if the
            # process dies (or the write fails) before it completes
            if filename.startswith("checkpoint_epoch_"):
                ckpt.cleanup_old_epochs(self.checkpoint_dir, path)

        if async_:
            if not hasattr(self, "_async_ckpt"):
                self._async_ckpt = ckpt.AsyncCheckpointer()
            self._async_ckpt.save(path, payload, on_done=retain)
            print(f"checkpoint saving (async): {path}")
        else:
            ckpt.save_checkpoint(path, payload)
            retain()
            print(f"checkpoint saved: {path}")

    def load_checkpoint(self, filename_or_path):
        path = Path(filename_or_path)
        if not path.exists():
            path = self.checkpoint_dir / filename_or_path
        payload = ckpt.load_checkpoint(path)
        # read EVERY payload key before mutating the trainer: a checkpoint
        # that parses but lacks a key (older/foreign writer) must raise
        # while self.* is still untouched, so maybe_resume's fallback walk
        # can't leave a half-loaded trainer that then "starts fresh" from
        # the rejected checkpoint's params
        saved_name = payload["model_name"]
        if isinstance(saved_name, bytes):
            saved_name = saved_name.decode()
        if str(saved_name) != self.model_name:
            # a wrong-family checkpoint would otherwise load "successfully"
            # (opt_state is rebuilt from the payload's own params, so every
            # structural check is self-consistent) and die mid-step — or
            # silently train the wrong weights. Common via the shared
            # default checkpoint_dir.
            raise ValueError(
                f"checkpoint {path} is for model {saved_name!r}; this "
                f"trainer trains {self.model_name!r}")
        opt_state = _tree_to_opt_state(
            payload["opt_state"],
            self.tx.init(payload["params"]))
        state = {
            "params": payload["params"],
            "model_state": payload["model_state"],
            "opt_state": opt_state,
        }
        if self.cfg.ema_decay > 0:
            # resume from a pre-EMA checkpoint re-seeds the average from the
            # loaded params (a checkpoint's ema_params are ignored when the
            # feature is off — the state structure must match the config)
            state["ema_params"] = jax.tree_util.tree_map(
                lambda x: np.array(x),
                payload.get("ema_params", payload["params"]))
        epoch = int(payload["epoch"])
        global_step = int(payload["global_step"])
        best_val_loss = float(payload["best_val_loss"])
        lr = float(payload["lr"])
        # .get: checkpoints written before the key existed resume with a
        # reset patience counter (the old behavior), not a rejection
        plateau_wait = int(payload.get("plateau_wait", 0))
        history = {k: list(np.asarray(v))
                   for k, v in payload["history"].items()}
        self.state = replicate(self.mesh, state)
        self.epoch = epoch
        self.global_step = global_step
        self.best_val_loss = best_val_loss
        self.lr = lr
        self._plateau_wait = plateau_wait
        self.history = history
        print(f"checkpoint loaded: {path} (epoch {self.epoch})")

    def maybe_resume(self):
        """Auto-resume from the newest readable checkpoint. Saves are atomic
        (os.replace), so a crash mid-write cannot tear a file — but a
        checkpoint corrupted at rest (disk fault, partial copy from a
        remote sync) must not kill the restart: fall back through older
        epoch checkpoints, then best_model, warning per skipped file.

        Multi-host: rank 0 walks the fallback list and every other rank
        loads exactly the file rank 0 chose — per-rank independent
        fallback (one rank hits a transient read error, loads an older
        epoch or starts fresh) would silently desynchronize the replicated
        params/epoch/step and hang or corrupt the collectives. A
        non-primary rank that cannot read the agreed file raises instead
        of diverging."""
        if dist.process_count() > 1:
            chosen = ""
            if dist.is_primary():
                chosen = self._resume_from_first_readable() or ""
            chosen = dist.broadcast_from_primary(chosen)
            if not chosen:
                return False
            if not dist.is_primary():
                self.load_checkpoint(self.checkpoint_dir / chosen)
            return True
        return self._resume_from_first_readable() is not None

    def _resume_from_first_readable(self):
        """Walk the retention list; return the loaded filename or None."""
        for path in ckpt.all_checkpoints(self.checkpoint_dir):
            try:
                self.load_checkpoint(path)
                return path.name
            except Exception as e:  # corrupt/unreadable — try the next one
                import warnings

                warnings.warn(f"skipping unreadable checkpoint {path}: {e}")
        return None


def _opt_state_to_tree(opt_state):
    """optax state (NamedTuples) -> plain dict for msgpack."""
    flat, _ = jax.tree_util.tree_flatten(opt_state)
    return {"leaves": list(map(np.asarray, flat))}


def _tree_to_opt_state(tree, template):
    _, treedef = jax.tree_util.tree_flatten(template)
    return jax.tree_util.tree_unflatten(treedef, tree["leaves"])


# -------------------------------------------------------------- test audio
def render_test_outputs(trainer: Trainer, suffix: str,
                        test_audio_dir, test_output_dir,
                        sample_rate: int = 22050, max_seconds: int = 30,
                        chunk_seconds: float = 2.0):
    """Render restored test files every save interval
    (reference generate_test_output, trainer.py:582-721): mono-mix, resample
    to 22.05 kHz, truncate to 30 s, chunked inference, write
    _original/_degraded/_restored WAVs, keep only the newest epoch outputs."""
    from ..audio import find_audio_files, load_audio, save_audio
    from ..pipeline import RestorationPipeline
    from ..config import PipelineConfig

    test_dir = Path(test_audio_dir)
    out_dir = Path(test_output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = find_audio_files(test_dir, recursive=False)
    if not files:
        print(f"  no test audio in {test_dir}")
        return

    pipe = RestorationPipeline(config=PipelineConfig(
        sample_rate=sample_rate, chunk_seconds=chunk_seconds,
        overlap_seconds=0.0))
    # host-local copy: trainer.state lives on the trainer's (possibly
    # multi-host) mesh, and this function runs on rank 0 only — feeding
    # mesh-committed params into the pipeline would compile a multi-process
    # SPMD program that only rank 0 enters (deadlock). device_get works
    # per-process because params/state are replicated.
    eval_state = trainer.eval_state()
    stage = jax.device_get((eval_state["params"],
                            eval_state["model_state"]))
    if trainer.model_name == "denoiser":
        pipe.denoiser = stage
    elif trainer.model_name == "super_resolution":
        pipe.super_resolution = stage
    else:
        pipe.stereo = stage

    for f in files:
        file_id = f.stem
        audio, _ = load_audio(f, sample_rate, mono=True)
        audio = audio[:, :sample_rate * max_seconds]

        original = out_dir / f"{file_id}_original.wav"
        if not original.exists():
            save_audio(original, audio, sample_rate)

        restored, out_rate = pipe.restore(audio, sample_rate)
        save_audio(out_dir / f"{file_id}_degraded_{suffix}.wav", audio,
                   sample_rate)
        save_audio(out_dir / f"{file_id}_restored_{suffix}.wav",
                   np.asarray(restored), out_rate)

        if suffix.startswith("epoch_"):
            current = int(suffix.split("_")[1])
            for old in out_dir.glob(f"{file_id}_*_epoch_*.wav"):
                try:
                    if int(old.stem.rsplit("_epoch_", 1)[1]) != current:
                        old.unlink()
                except (ValueError, IndexError):
                    pass
    print(f"  test outputs -> {out_dir}")


# ---------------------------------------------------------------- frontend
def train_from_config(cfg: Config, steps_per_epoch: Optional[int] = None,
                      dataset_kind: str = "standard"):
    """Config-driven entry replacing the reference's three train_*.py scripts.

    dataset_kind: 'standard' | 'mixed' (semi-supervised synthetic+real) |
    'adaptive' (artifact statistics fitted to real recordings).
    """
    import dataclasses

    from ..data import (
        RestorationDataset,
        StereoDataset,
        SuperResolutionDataset,
        MixedRestorationDataset,
        AdaptiveArtifactDataset,
        DataLoader,
        train_val_split,
    )

    name = cfg.train.model
    d = cfg.data
    if name == "denoiser":
        if dataset_kind == "mixed":
            dataset = MixedRestorationDataset(
                d.data_dir, d.degraded_dir, d.sample_rate, d.chunk_duration,
                synthetic_ratio=d.synthetic_ratio,
                resample_chunks=d.resample_chunks)
        elif dataset_kind == "adaptive":
            dataset = AdaptiveArtifactDataset(
                d.data_dir, d.degraded_dir, d.sample_rate, d.chunk_duration,
                resample_chunks=d.resample_chunks)
        else:
            dataset = RestorationDataset(d.data_dir, d.sample_rate,
                                         d.chunk_duration,
                                         resample_chunks=d.resample_chunks)
        model_kwargs = dataclasses.asdict(cfg.denoiser)
    elif name == "super_resolution":
        dataset = SuperResolutionDataset(d.data_dir,
                                         chunk_duration=d.chunk_duration,
                                         resample_chunks=d.resample_chunks)
        model_kwargs = dataclasses.asdict(cfg.super_resolution)
    elif name == "stereo_separator":
        dataset = StereoDataset(d.data_dir, d.sample_rate, d.chunk_duration,
                                resample_chunks=d.resample_chunks)
        model_kwargs = dataclasses.asdict(cfg.stereo_separator)
    else:
        raise ValueError(f"unknown model {name!r}")

    tr_idx, va_idx = train_val_split(dataset, d.val_split, cfg.train.seed)
    if steps_per_epoch:
        tr_idx = tr_idx[:steps_per_epoch * cfg.train.batch_size]
    # Multi-host DP: each host loads a disjoint stride of the train indices
    # and feeds its local slice of the GLOBAL batch (config batch size is
    # global). Validation is deliberately NOT sharded: every host evaluates
    # the identical full val set, so val_loss — which drives the host-side
    # plateau scheduler — is bit-identical across hosts and the learning
    # rates cannot diverge. Val sets here are small; correctness over speed.
    tr_idx = dist.shard_indices_by_process(tr_idx)
    batch_size = dist.local_batch_size(cfg.train.batch_size)
    train_loader = DataLoader(dataset, batch_size, indices=tr_idx,
                              seed=cfg.train.seed + dist.process_index())
    # validation batch is clamped to the split size: at large train batches
    # (e.g. the short-chunk x64 recurrence lever) the val split can be
    # smaller than one train batch, and disabling validation silently would
    # also disable best-model tracking and the plateau scheduler. The clamp
    # must also stay a multiple of this process's share of the mesh 'data'
    # axis — validate()'s shard_batch raises on a non-divisible batch dim,
    # which would kill the run after a full epoch of training
    shard_gran = max(1, (make_mesh(data_parallel=cfg.train.data_parallel)
                         .shape["data"]) // dist.process_count())
    val_bs = (min(batch_size, len(va_idx)) // shard_gran) * shard_gran
    if val_bs == 0 and len(va_idx) > 0:
        print(f"validation disabled: split of {len(va_idx)} items cannot "
              f"fill one {shard_gran}-way sharded batch")
    val_loader = (DataLoader(dataset, val_bs, indices=va_idx,
                             shuffle=False, seed=cfg.train.seed)
                  if val_bs > 0 else None)

    module = MODEL_MODULES[name]
    if name == "denoiser":
        model_kwargs["features"] = tuple(model_kwargs["features"])
    params, state = module.init(jax.random.PRNGKey(cfg.train.seed),
                                **model_kwargs)

    # rank 0 is the only writer of metrics/test renders (checkpoint writes
    # are gated inside Trainer.save_checkpoint itself)
    logger = (MetricsLogger(Path(cfg.train.log_dir) / name, name)
              if dist.is_primary() else None)
    trainer = Trainer(name, params, state, train_loader, val_loader,
                      config=cfg.train, artifact_config=d.artifacts,
                      sample_rate=d.sample_rate, logger=logger)
    trainer.checkpoint_dir = Path(cfg.train.checkpoint_dir) / name
    trainer.maybe_resume()

    test_fn = None
    if cfg.train.test_audio_dir and dist.is_primary():
        out_dir = cfg.train.test_output_dir or f"outputs/{name}_tests"
        test_fn = partial(render_test_outputs,
                          test_audio_dir=cfg.train.test_audio_dir,
                          test_output_dir=out_dir,
                          sample_rate=d.sample_rate,
                          chunk_seconds=d.chunk_duration)

    return trainer.train(test_audio_fn=test_fn)
