import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import conftest
import numpy as np, jax, time
import test_quality_gate as q
from ml_audio_restoration_tpu.config import ArtifactConfig, PipelineConfig
from ml_audio_restoration_tpu.evaluate import evaluate_super_resolution
from ml_audio_restoration_tpu.models import super_resolution
from ml_audio_restoration_tpu.pipeline import RestorationPipeline

t0=time.time()
losses, stage = q._train(
    "super_resolution", super_resolution,
    q._Corpus(q._harm_clip, 32, 100, "high", "downsample", q.HR),
    epochs=90, lr=1.5e-3, sr=q.HR, acfg=ArtifactConfig(), packed_convs=True)
print("loss", losses[0], "->", losses[-1])
pipe = RestorationPipeline(super_resolution=stage,
    config=PipelineConfig(chunk_seconds=1.0, overlap_seconds=0.05))
m = evaluate_super_resolution(pipe, [q._held_out(q._harm_clip, 2.0, q.HR)], high_rate=q.HR, seconds=2.0)
print(m)
print("lsd gate:", m["lsd_model"] < m["lsd_linear"] - 0.5)
print("total", time.time()-t0)
