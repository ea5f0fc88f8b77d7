"""A/B the 200 kf loop-closure machinery (round-4 verdict item 3).

Runs the bench_sfm loop scene at a given scale with and without closure
edges and prints kf/s + ATE for each, so the drift-bounding win (PGO + BA
re-polish) is measured, not assumed.  CPU-runnable (slow); the bench runs
the same path on the chip.

Usage: python tools/sfm_loop_eval.py [K] [P] [--no-ab]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_akaze_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

if "--cpu" in sys.argv:
    # JAX_PLATFORMS=cpu alone does NOT select CPU here (the axon
    # sitecustomize force-registers the TPU) — see the verify skill.
    import jax

    jax.config.update("jax_platforms", "cpu")

from akaze_tpu.core.config import RansacConfig, SfmConfig
from akaze_tpu.sfm.incremental import run_incremental
from akaze_tpu.sfm.metrics import ate_rmse, camera_centers
from akaze_tpu.utils.synthetic import sfm_scene


def run(K, P, use_closures):
    poses_gt, observations, closures = sfm_scene(
        K, P, seed=0, loop=True, obs_noise=2e-3, num_closures=5
    )
    scfg = SfmConfig(ba_iterations=8)
    rcfg = RansacConfig(num_iterations=256, inlier_threshold=5e-3)
    t0 = time.perf_counter()
    res = run_incremental(
        observations, K, scfg, rcfg, ba_every=8,
        closures=closures if use_closures else None,
    )
    dt = time.perf_counter() - t0
    ate = ate_rmse(camera_centers(res.poses), camera_centers(poses_gt))
    print(
        f"K={K} P={P} closures={use_closures}: {K / dt:.2f} kf/s "
        f"(cold, incl. compile), ATE {float(ate):.4f}",
        flush=True,
    )
    return float(ate)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    K = int(args[0]) if args else 200
    P = int(args[1]) if len(args) > 1 else 5000
    ab = "--no-ab" not in sys.argv
    ate_with = run(K, P, True)
    if ab:
        ate_without = run(K, P, False)
        print(f"closure win: ATE {ate_without:.4f} -> {ate_with:.4f}")


if __name__ == "__main__":
    main()
