"""Headline-style A/B timing harness (round-2 tooling).

Usage (from /tmp so only PYTHONPATH picks the tree):
  git archive <ref> | tar -x -C /tmp/tree
  setsid nohup env PYTHONPATH=/tmp/tree:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_akaze_tpu \
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
    python -u tools/ab_headline.py <label> > /tmp/ab.log 2>&1 &

Distinct pre-uploaded inputs per rep, amortized timing, small consumed
outputs — per the verify-skill measurement gotchas.  Round-2 baseline:
~39.5 ms/batch16 (~405 fps) on one v5e chip."""
import os
import sys
import time

import jax
import jax.numpy as jnp

from akaze_tpu.core.config import AkazeConfig, MatchConfig
from akaze_tpu.frontend.pipeline import extract_batch_fn
from akaze_tpu.matching.hamming import match_fn
from akaze_tpu.utils.synthetic import video_sequence

label = sys.argv[1] if len(sys.argv) > 1 else "?"
config, mcfg = AkazeConfig(), MatchConfig()
batch = int(os.environ.get("AB_BATCH", "16"))
frame_sets = [jnp.asarray(video_sequence(batch, 480, 640, seed=s)) for s in range(6)]
jax.block_until_ready(frame_sets)


@jax.jit
def step(imgs):
    feats = extract_batch_fn(imgs, config)
    kp = feats.keypoints
    m = jax.vmap(lambda da, va, db, vb: match_fn(da, va, db, vb, mcfg))(
        feats.descriptors[:-1], kp.valid[:-1],
        feats.descriptors[1:], kp.valid[1:],
    )
    return feats.keypoints.count(), m.count()


t0 = time.perf_counter()
out0 = jax.block_until_ready(step(frame_sets[0]))
print(f"{label} compile {time.perf_counter()-t0:.1f}s "
      f"kps={int(out0[0].sum())} matches={int(out0[1].sum())}", flush=True)
for trial in range(3):
    reps = 6
    t0 = time.perf_counter()
    outs = [step(frame_sets[r]) for r in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label} t{trial} {dt*1e3:7.2f} ms/batch16 ({batch/dt:6.1f} fps)",
          flush=True)
