"""Standalone two-view (config 2) probe on the real TPU: RANSAC-stage
device/wall split + end-to-end pairs/s at a sweep of batch sizes P.

This is the tool BASELINE.md's round-3 two-view row cites (the round-3
builder ran it uncommitted — round-4 verdict missing #2); committed so the
numbers are reproducible.  Protocol matches bench.py: distinct pre-uploaded
inputs, optimization-barrier token chain, one host sync per timed loop
(see BASELINE.md "Measurement integrity" — per-rep syncs cost ~230 ms of
tunnel RPC each and same-input reps can be served from cache).

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site \
      JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_akaze_tpu \
      JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
      python -u tools/bench_twoview.py [P ...]   # default sweep: 8 32
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_akaze_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig, MatchConfig, RansacConfig
from akaze_tpu.frontend.pipeline import extract_batch_fn
from akaze_tpu.geometry.twoview import estimate_relative_pose_fn, normalize_points
from akaze_tpu.matching.hamming import match_fn
from akaze_tpu.utils.synthetic import video_sequence


def bench_p(P: int, reps: int = 4) -> None:
    config = AkazeConfig()
    mcfg = MatchConfig()
    rcfg = RansacConfig(num_iterations=256)
    intr = (640.0, 640.0, 320.0, 240.0)
    keys = jax.random.split(jax.random.PRNGKey(0), P)

    frame_sets = [
        jnp.asarray(video_sequence(2 * P, 480, 640, seed=s)) for s in (1, 2, 3)
    ]
    jax.block_until_ready(frame_sets)

    @jax.jit
    def extract_and_match(imgs, token):
        imgs, token = jax.lax.optimization_barrier((imgs, token))
        feats = extract_batch_fn(imgs, config)
        kp = feats.keypoints
        da, va = feats.descriptors[0::2], kp.valid[0::2]
        db, vb = feats.descriptors[1::2], kp.valid[1::2]
        m = jax.vmap(lambda a, vva, b, vvb: match_fn(a, vva, b, vvb, mcfg))(
            da, va, db, vb
        )
        return (
            (kp.x[0::2], kp.y[0::2], kp.x[1::2], kp.y[1::2], m.idx_b, m.accepted),
            jnp.sum(m.count()).astype(jnp.float32),
        )

    @jax.jit
    def ransac_stage(corr, token):
        corr, token = jax.lax.optimization_barrier((corr, token))
        xa, ya, xb, yb, idx_b, accepted = corr

        def pose_one(xa1, ya1, xb1, yb1, ib, acc, key):
            x1 = normalize_points(xa1, ya1, intr)
            x2 = normalize_points(xb1[ib], yb1[ib], intr)
            return estimate_relative_pose_fn(x1, x2, acc, key, rcfg)

        pose = jax.vmap(pose_one)(xa, ya, xb, yb, idx_b, accepted, keys)
        return pose.num_inliers, jnp.sum(pose.num_inliers).astype(jnp.float32)

    # Two programs total (extract+match, ransac) — a separately-jitted
    # "full" third program doubled the remote compile bill for no
    # information (the two-dispatch chain IS end-to-end: the token threads
    # through both).
    t0 = time.perf_counter()
    token = jnp.float32(0.0)
    corrs = []
    for fs in frame_sets:
        c, token = extract_and_match(fs, token)
        corrs.append(jax.block_until_ready(c))
    print(f"P={P}: extract+match compiled+ran in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(ransac_stage(corrs[0], token))  # compile
    print(f"P={P}: ransac compiled in {time.perf_counter() - t0:.0f}s",
          flush=True)

    # --- RANSAC stage in isolation: correspondences pre-staged on device ---
    t0 = time.perf_counter()
    for r in range(reps):
        _, token = ransac_stage(corrs[r % len(corrs)], token)
    token = float(token)
    ransac_wall = (time.perf_counter() - t0) / reps

    # --- end-to-end config 2: chained extract+match -> ransac dispatches ---
    token = jnp.float32(0.0)
    t0 = time.perf_counter()
    for r in range(reps):
        c, token = extract_and_match(frame_sets[r % len(frame_sets)], token)
        _, token = ransac_stage(c, token)
    token = float(token)
    e2e = (time.perf_counter() - t0) / reps
    print(
        f"P={P}: ransac stage {ransac_wall * 1e3:.1f} ms/dispatch wall "
        f"({ransac_wall * 1e3 / P:.2f} ms/pair), end-to-end "
        f"{e2e * 1e3:.1f} ms/dispatch = {P / e2e:.1f} pairs/s",
        flush=True,
    )


if __name__ == "__main__":
    ps = [int(a) for a in sys.argv[1:]] or [32]
    for p in ps:
        bench_p(p)
