"""Batched video front-end: extraction, sequential matching, keyframes.

BASELINE.md config 4: process a frame sequence with batched (data-parallel)
extraction, match consecutive frames, and select keyframes when tracking
decays.  TPU-first shape: frames stream through the device in fixed-size
batches (optionally sharded over a `data` mesh); matching of the B-1
consecutive pairs inside a batch is one vmapped call; only the tiny match
counts come back to the host, where the (inherently sequential, O(T))
keyframe decision runs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig, MatchConfig, SfmConfig
from akaze_tpu.core.types import Features
from akaze_tpu.frontend.pipeline import extract_batch_fn
from akaze_tpu.matching.hamming import Matches, match_fn


@dataclasses.dataclass
class VideoResult:
    """Host-side result of a sequence run."""

    features: Features  # (T, K) leaves, device or host
    match_counts: np.ndarray  # (T,) matches to previous frame (0 for t=0)
    keyframes: List[int]  # selected keyframe indices
    matches_prev: Matches  # (T, Ka) per-frame matches to the previous frame


@functools.lru_cache(maxsize=8)
def _compiled_video_step(config: AkazeConfig, mconfig: MatchConfig):
    @jax.jit
    def step(frames, prev_desc, prev_valid):
        """frames (B, H, W); prev_*: features of the frame before this batch.
        Returns features and per-frame Matches against the previous frame."""
        feats = extract_batch_fn(frames, config)
        desc = jnp.concatenate([prev_desc[None], feats.descriptors[:-1]], axis=0)
        val = jnp.concatenate([prev_valid[None], feats.keypoints.valid[:-1]], axis=0)
        matches = jax.vmap(
            lambda da, va, db, vb: match_fn(da, va, db, vb, mconfig)
        )(desc, val, feats.descriptors, feats.keypoints.valid)
        return feats, matches

    return step


def process_video(
    frames,
    config: AkazeConfig | None = None,
    mconfig: MatchConfig | None = None,
    sconfig: SfmConfig | None = None,
    batch: int = 8,
) -> VideoResult:
    """Run the full front-end over a (T, H, W) sequence."""
    config = config or AkazeConfig()
    # Video tracking gates on absolute Hamming distance as well: genuine
    # frame-to-frame matches sit far below 120/486 bits, while ratio+mutual
    # alone lets a trickle of random cross-scene matches through, which
    # would mask scene cuts from the keyframe logic.
    mconfig = mconfig or MatchConfig(max_distance=120)
    sconfig = sconfig or SfmConfig()
    # One host->device transfer up front; per-step chunks are DEVICE slices.
    # (Feeding numpy chunks would re-upload every batch — on a tunneled
    # accelerator that transfer dominates the whole pipeline.)
    frames = jnp.asarray(np.asarray(frames, np.float32))
    T = frames.shape[0]
    step = _compiled_video_step(config, mconfig)

    feats_list, matches_list = [], []
    prev_desc = jnp.zeros((config.max_keypoints, 16), jnp.uint32)
    prev_valid = jnp.zeros((config.max_keypoints,), bool)
    for t0 in range(0, T, batch):
        chunk = frames[t0 : t0 + batch]
        if chunk.shape[0] < batch:  # pad the tail to the compiled batch size
            pad = batch - chunk.shape[0]
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[-1:], pad, axis=0)]
            )
        feats, matches = step(chunk, prev_desc, prev_valid)
        feats_list.append(feats)
        matches_list.append(matches)
        prev_desc = feats.descriptors[min(batch, T - t0) - 1]
        prev_valid = feats.keypoints.valid[min(batch, T - t0) - 1]

    def cat(trees):
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[:T], *trees)

    feats = cat(feats_list)
    matches = cat(matches_list)

    counts = np.array(matches.count())
    counts[0] = 0

    # Keyframe selection (sequential, host): new keyframe when the fraction
    # of the last keyframe's matches still tracked drops below threshold.
    kp_counts = np.asarray(feats.keypoints.count())
    keyframes = [0]
    ref_matches = max(int(counts[1]) if T > 1 else 1, 1)
    for t in range(1, T):
        tracked = counts[t] / max(ref_matches, 1)
        if tracked < sconfig.keyframe_min_tracked:
            keyframes.append(t)
            ref_matches = max(int(counts[t]), 1)
    return VideoResult(
        features=feats,
        match_counts=counts,
        keyframes=keyframes,
        matches_prev=matches,
    )
