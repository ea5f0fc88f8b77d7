"""Microbench for kernels/describe_fused.py in isolation.

Builds realistic inputs (batch-16 VGA level stacks, ~220 live keypoints per
frame with response-sorted validity prefixes), then times the fused kernel
alone.  AKAZE_FUSED_ABLATE selects ablations compiled into the kernel:
  (unset)  full kernel
  dma      DMA + recenter only; writes the patch mean (no sampling compute)
  noori    descriptor sampling only (angle forced 0)
  nodesc   orientation only (descriptor words = bit pattern of angle)

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site \
      JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_akaze_tpu \
      AKAZE_FUSED_ABLATE=dma python -u tools/bench_describe_fused.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.core.types import Keypoints
from akaze_tpu.frontend.pipeline import _statics
from akaze_tpu.kernels.describe_fused import describe_fused

B, M = 16, 1024
LIVE = int(os.environ.get("AB_LIVE", "220"))
cfg = AkazeConfig()
ss, ds = _statics(640, 480, cfg)
L = ss.num_levels
rng = np.random.default_rng(0)

sets = []
for s in range(4):
    stacks = {
        "Lt": jnp.asarray(rng.standard_normal((L, B, 480, 640), np.float32)),
        "Lx": jnp.asarray(rng.standard_normal((L, B, 480, 640), np.float32)),
        "Ly": jnp.asarray(rng.standard_normal((L, B, 480, 640), np.float32)),
        "level_major": True,
    }
    lvl = rng.integers(0, L, (B, M)).astype(np.int32)
    ratio = ss.ratios[lvl]
    x = rng.uniform(20, 620, (B, M)).astype(np.float32)
    y = rng.uniform(20, 460, (B, M)).astype(np.float32)
    valid = (np.arange(M)[None, :] < LIVE).astype(bool) & np.ones((B, 1), bool)
    if os.environ.get("AB_SORT"):
        # DMA-coherent order like detect() emits since round 5: sort each
        # frame's live prefix by (level, y-block, x-block) so the kernel's
        # fetch dedup sees adjacent sharers.
        for b in range(B):
            yi = (y[b] / ratio[b]).astype(np.int64)
            xi = (x[b] / ratio[b]).astype(np.int64)
            key = (lvl[b].astype(np.int64) << 40) | ((yi >> 6) << 20) | (xi >> 7)
            key[~valid[b]] = 1 << 62
            order = np.argsort(key, kind="stable")
            x[b], y[b], lvl[b] = x[b][order], y[b][order], lvl[b][order]
    z = np.zeros((B, M), np.float32)
    kps = Keypoints(
        x=jnp.asarray(x), y=jnp.asarray(y), response=jnp.asarray(z),
        size=jnp.asarray(z), octave=jnp.asarray(lvl // 4),
        class_id=jnp.asarray(lvl), angle=jnp.asarray(z),
        valid=jnp.asarray(valid),
    )
    sets.append((kps, stacks["Lt"], stacks["Lx"], stacks["Ly"]))
jax.block_until_ready(sets)


@jax.jit
def run(kps, lt, lx, ly):
    stacks = {"Lt": lt, "Lx": lx, "Ly": ly, "level_major": True}
    ang, desc = describe_fused(kps, stacks, ss, ds)
    return ang.sum(), desc.sum()


t0 = time.perf_counter()
out = jax.block_until_ready(run(*sets[0]))
print(f"compile {time.perf_counter()-t0:.1f}s out={out[0]:.3f}", flush=True)
for trial in range(3):
    reps = 10
    t0 = time.perf_counter()
    outs = [run(*sets[r % 4]) for r in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(
        f"ablate={os.environ.get('AKAZE_FUSED_ABLATE','full')} live={LIVE} "
        f"t{trial} {dt:7.3f} ms/call ({dt*1e3/(B*LIVE):6.2f} us/kp)",
        flush=True,
    )
