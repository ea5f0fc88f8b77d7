"""Capture a jax.profiler trace of the headline step and print the device
op-time breakdown (top ops by total duration on the TPU plane).

Usage (detached, like tools/ab_headline.py):
  setsid nohup env PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_akaze_tpu \
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
    python -u tools/trace_headline.py /tmp/trace_out > /tmp/trace.log 2>&1 &

The parser reads the raw .xplane.pb with TF's tsl proto (no TensorBoard UI
needed over the tunnel).
"""
import glob
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_out"

from akaze_tpu.core.config import AkazeConfig, MatchConfig
from akaze_tpu.frontend.pipeline import extract_batch_fn
from akaze_tpu.matching.hamming import match_fn
from akaze_tpu.utils.synthetic import video_sequence

config, mcfg = AkazeConfig(), MatchConfig()
batch = 16
frame_sets = [jnp.asarray(video_sequence(batch, 480, 640, seed=s)) for s in range(3)]
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


jax.block_until_ready(step(frame_sets[0]))  # compile
print("compiled", flush=True)
with jax.profiler.trace(outdir):
    for r in range(3):
        out = step(frame_sets[r])
    jax.block_until_ready(out)
print("traced", flush=True)

# ---- parse ----
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True))
assert paths, f"no xplane.pb under {outdir}"
xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "device" not in plane.name.lower():
        continue
    print(f"\n=== plane: {plane.name} ===")
    emeta = plane.event_metadata
    tot = defaultdict(int)
    cnt = defaultdict(int)
    for line in plane.lines:
        # XLA Ops line carries per-op events
        if line.name not in ("XLA Ops", "XLA Modules", "Steps") and "Ops" not in line.name:
            continue
        for ev in line.events:
            name = emeta[ev.metadata_id].name
            tot[(line.name, name)] += ev.duration_ps
            cnt[(line.name, name)] += 1
    by_line = defaultdict(list)
    for (ln, name), ps in tot.items():
        by_line[ln].append((ps, name))
    for ln, rows in by_line.items():
        rows.sort(reverse=True)
        total_ms = sum(ps for ps, _ in rows) / 1e9
        print(f"\n-- line '{ln}' total {total_ms:.2f} ms over 3 reps --")
        for ps, name in rows[:40]:
            print(f"  {ps/1e9/3:8.3f} ms/rep  x{cnt[(ln, name)]:4d}  {name[:110]}")
