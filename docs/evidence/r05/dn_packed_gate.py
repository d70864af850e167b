import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import conftest
import numpy as np, jax, time
import test_quality_gate as q
from ml_audio_restoration_tpu.config import PipelineConfig
from ml_audio_restoration_tpu.evaluate import evaluate_denoiser
from ml_audio_restoration_tpu.models import denoiser
from ml_audio_restoration_tpu.pipeline import RestorationPipeline

t0=time.time()
losses, stage = q._train(
    "denoiser", denoiser, q._Corpus(q._tone_clip, 32, 100, "clean", "degrade", q.SR),
    epochs=30, lr=2e-3, sr=q.SR, acfg=q._GATE_ARTIFACTS,
    time_weight=10.0, spectral_weight=0.5, si_sdr_weight=0.05,
    packed_convs=True)
print("loss", losses[0], "->", losses[-1])
pipe = RestorationPipeline(denoiser=stage, config=PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05))
m = evaluate_denoiser(pipe, [q._held_out(q._tone_clip, 2.0, q.SR)], sample_rate=q.SR, seconds=2.0, seed=7, artifact_cfg=q._GATE_ARTIFACTS)
print({k: round(v,3) for k,v in m.items()})
print("sisdr gate:", m["sisdr_restored"] > m["sisdr_degraded"] + 0.3)
print("spec gate:", m["spec_restored"] < 0.95 * m["spec_degraded"])
print("lsd gate:", m["lsd_restored"] < m["lsd_degraded"] - 5.0)
print("total", time.time()-t0)
