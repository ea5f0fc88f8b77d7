"""Headline benchmark: AKAZE detect+describe+match, 640x480, frames/s/chip.

Protocol (BASELINE.md config 1+2): batched front-end extraction on B VGA
frames + Hamming matching of consecutive frame pairs, steady-state timed
after compile warmup.  Baseline = 10 frames/s, the canonical single-core CPU
AKAZE order of magnitude (BASELINE.md: the reference publishes no numbers and
the mount was empty; Alcantarilla et al. BMVC 2013 timing tables give
~7-20 fps on VGA single-core).  Target: >= 10x baseline per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 10.0  # reference single-core order of magnitude (BASELINE.md)


def main() -> None:
    from akaze_tpu.core.config import AkazeConfig, MatchConfig
    from akaze_tpu.frontend.pipeline import extract_batch_fn
    from akaze_tpu.matching.hamming import match_fn
    from akaze_tpu.utils.synthetic import video_sequence

    config = AkazeConfig()
    mcfg = MatchConfig()
    batch = 16
    frames = jnp.asarray(video_sequence(batch, 480, 640, seed=0))

    @jax.jit
    def step(imgs):
        feats = extract_batch_fn(imgs, config)
        kp = feats.keypoints
        # Sequential matching of consecutive frames (video front-end shape).
        m = jax.vmap(lambda da, va, db, vb: match_fn(da, va, db, vb, mcfg))(
            feats.descriptors[:-1], kp.valid[:-1],
            feats.descriptors[1:], kp.valid[1:],
        )
        return feats.keypoints.count(), m.count()

    # Warmup / compile.
    counts, mcounts = jax.block_until_ready(step(frames))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = batch * reps / dt

    print(
        json.dumps(
            {
                "metric": "akaze_vga_detect_describe_match_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )
    # Diagnostics on stderr-like secondary lines are avoided: one JSON line only.


if __name__ == "__main__":
    main()
