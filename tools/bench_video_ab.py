"""Config-4 video front-end attribution (round-4 verdict item 5): the
988 fps video number trails the 1216 fps headline by ~19%.  A/B the two
obvious suspects in one session:

  - chunk batch 16 vs 64 (the headline runs batch 64; the video scan was
    pinned at 16 since round 2)
  - the per-frame keyframe-selection scan (500 sequential single-pair
    matcher calls; AKAZE_VIDEO_NOKF=1 ablates it at trace time)

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_video_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_akaze_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.utils.synthetic import video_sequence

NUM_FRAMES = 500


def measure(batch, nokf):
    os.environ.pop("AKAZE_VIDEO_NOKF", None)
    if nokf:
        os.environ["AKAZE_VIDEO_NOKF"] = "1"
    # The env var is baked at trace time; clear compile caches keyed on the
    # python-side closure by importing fresh per config.
    import importlib

    from akaze_tpu.matching import video as video_mod

    importlib.reload(video_mod)
    frames = jnp.asarray(video_sequence(NUM_FRAMES, 480, 640, seed=0))
    jax.block_until_ready(frames)
    cfg = AkazeConfig()
    video_mod.process_video(frames, cfg, batch=batch)  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        video_mod.process_video(frames, cfg, batch=batch)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(
        f"batch={batch} nokf={nokf}: {NUM_FRAMES / best:.1f} fps "
        f"({best * 1e3:.1f} ms best-of-3)",
        flush=True,
    )


def main():
    for batch, nokf in [(16, False), (64, False), (64, True), (16, True)]:
        try:
            measure(batch, nokf)
        except Exception as e:
            print(f"batch={batch} nokf={nokf}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
