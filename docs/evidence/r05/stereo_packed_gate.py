"""Stereo quality gate under PACKED training (round-5 late session).

Re-runs tests/test_quality_gate.py::test_stereo_training_matches_target_
statistics with TrainConfig.packed_convs=True (the TPU default after the
stereo apply_train_packed adoption; CPU auto keeps plain, so the suite's
gate run exercises the plain path) — certifying that stats-match training
through the packed forward still beats the mono-duplicate baseline and
that mid-exact serving stays bit-near-exact on the trained checkpoint.
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import conftest  # noqa: F401  (forces CPU + 8 virtual devices)
import numpy as np, time
import test_quality_gate as q
from ml_audio_restoration_tpu.audio import load_audio, normalize_audio
from ml_audio_restoration_tpu.config import PipelineConfig, ArtifactConfig
from ml_audio_restoration_tpu.evaluate import evaluate_stereo
from ml_audio_restoration_tpu.models import stereo_separator
from ml_audio_restoration_tpu.pipeline import RestorationPipeline

t0 = time.time()
losses, stage = q._train(
    "stereo_separator", stereo_separator, q._StereoCorpus(16, 100),
    epochs=20, lr=5e-4, sr=q.SR, acfg=ArtifactConfig(),
    stats_match_weight=1.0, packed_convs=True)
print("loss", losses[0], "->", losses[-1], "| moved:",
      losses[-1] < 0.8 * losses[0])

held = q._held_out(q._wide_stereo_clip, 2.0, q.SR)
pipe = RestorationPipeline(
    stereo=stage,
    config=PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05,
                          enable_super_resolution=False))
m = evaluate_stereo(pipe, [held], sample_rate=q.SR, seconds=2.0)
dist = (abs(m["correlation_upmix"] - m["correlation_target"])
        + abs(m["width_upmix"] - m["width_target"]))
baseline = abs(1.0 - m["correlation_target"]) + m["width_target"]
print({k: round(v, 3) for k, v in m.items()})
print(f"stats gate: dist {dist:.3f} vs 0.6*baseline {0.6*baseline:.3f} ->",
      dist < 0.6 * baseline)

pipe_me = RestorationPipeline(
    stereo=stage,
    config=PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05,
                          enable_super_resolution=False,
                          stereo_mid_exact=True))
stereo, _ = load_audio(held, q.SR, mono=False)
mono = np.asarray(normalize_audio(stereo)).mean(
    axis=0, keepdims=True)[:, :2 * q.SR]
up, _ = pipe_me.restore(mono, q.SR)
up = np.asarray(up)[:, :mono.shape[1]]
mid = (up[0] + up[1]) / 2
print("mid-exact max dev:", float(np.abs(mid - mono[0]).max()),
      "->", bool(np.abs(mid - mono[0]).max() < 1e-5))
print("total", round(time.time() - t0, 1), "s")
