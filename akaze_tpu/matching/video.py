"""Batched video front-end: extraction, sequential matching, keyframes.

BASELINE.md config 4: process a frame sequence with batched (data-parallel)
extraction, match consecutive frames, and select keyframes when tracking
decays.  TPU-first shape (SURVEY.md §2 DP row): the WHOLE sequence runs as
ONE jitted device program — a `lax.scan` over fixed-size frame chunks does
batched extraction + consecutive matching (the only carry between chunks is
the previous chunk's last frame), then a per-frame `lax.scan` runs keyframe
selection ON DEVICE by matching each frame against the current keyframe's
descriptors.  Only the final per-frame counts/flags return to the host, so a
tunneled accelerator pays ONE dispatch for the sequence instead of one RPC
round trip per chunk (the round-1 bottleneck: ~740 ms/step RPC vs ~140 ms
device time, BASELINE.md round-1 notes).

Keyframe criterion: a new keyframe is inserted at frame t when the number of
matches between frame t and the LAST KEYFRAME falls below
`keyframe_min_tracked` times the reference count (the keyframe's match count
observed one frame after its insertion) — i.e. tracking is measured against
the keyframe itself, not a consecutive-frame proxy.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

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
    kf_match_counts: np.ndarray  # (T,) matches to the active keyframe


@functools.lru_cache(maxsize=8)
def _compiled_video_program(
    config: AkazeConfig,
    mconfig: MatchConfig,
    sconfig: SfmConfig,
    num_chunks: int,
):
    """One jitted program for the whole (num_chunks, B, H, W) sequence."""

    import os

    _nomatch = bool(os.environ.get("AKAZE_VIDEO_NOMATCH"))  # cost ablation

    @jax.jit
    def run(chunks):
        def chunk_step(carry, frames):
            return carry, extract_batch_fn(frames, config)

        _, feats = jax.lax.scan(chunk_step, 0, chunks)
        # (C, B, ...) -> (C*B, ...)
        feats = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)

        # Consecutive matching as ONE post-scan vmapped call over all T-1
        # pairs (round 5): the scan already stacks every frame's
        # descriptors, and the old per-chunk matcher (a 16-pair vmap + a
        # carried-descriptor concat per scan step) measured 60 ms of the
        # 538 ms sequence — 0.12 ms/pair vs the headline's 0.04 ms/pair
        # batched rate for the SAME work (AKAZE_VIDEO_NOMATCH ablation).
        from akaze_tpu.matching.hamming import Matches

        cap = config.max_keypoints
        if _nomatch:
            T = feats.descriptors.shape[0]
            matches = Matches(
                idx_b=jnp.zeros((T, cap), jnp.int32),
                distance=jnp.zeros((T, cap), jnp.int32),
                accepted=jnp.zeros((T, cap), bool),
            )
        else:
            m = jax.vmap(
                lambda da, va, db, vb: match_fn(da, va, db, vb, mconfig)
            )(
                feats.descriptors[:-1], feats.keypoints.valid[:-1],
                feats.descriptors[1:], feats.keypoints.valid[1:],
            )
            # Frame 0 has no predecessor: prepend an empty row.
            matches = Matches(
                idx_b=jnp.concatenate(
                    [jnp.zeros((1, cap), jnp.int32), m.idx_b]
                ),
                distance=jnp.concatenate(
                    [jnp.zeros((1, cap), jnp.int32), m.distance]
                ),
                accepted=jnp.concatenate(
                    [jnp.zeros((1, cap), bool), m.accepted]
                ),
            )

        # ---- device-side keyframe selection vs the LAST KEYFRAME ----
        # Carry: keyframe descriptors + reference count. `age` counts frames
        # since the keyframe was inserted; the reference count is fixed one
        # frame after insertion (the keyframe's own matchable-feature count).
        def kf_step(carry, frame_feats):
            kf_desc, kf_valid, ref, age = carry
            desc_t, valid_t = frame_feats
            m = match_fn(kf_desc, kf_valid, desc_t, valid_t, mconfig)
            c = m.count()
            ref = jnp.where(age == 1, jnp.maximum(c, 1), ref)
            tracked = c.astype(jnp.float32) / ref.astype(jnp.float32)
            is_kf = (age >= 1) & (tracked < sconfig.keyframe_min_tracked)
            kf_desc = jnp.where(is_kf, desc_t, kf_desc)
            kf_valid = jnp.where(is_kf, valid_t, kf_valid)
            age = jnp.where(is_kf, 0, age) + 1
            return (kf_desc, kf_valid, ref, age), (c, is_kf)

        kf_init = (
            feats.descriptors[0],
            feats.keypoints.valid[0],
            jnp.int32(1),
            jnp.int32(1),
        )
        frame_stream = (feats.descriptors[1:], feats.keypoints.valid[1:])
        import os

        if os.environ.get("AKAZE_VIDEO_NOKF"):  # trace-time cost ablation
            T1 = feats.descriptors.shape[0] - 1
            kf_counts = jnp.zeros((T1,), jnp.int32)
            is_kf = jnp.zeros((T1,), bool)
        else:
            _, (kf_counts, is_kf) = jax.lax.scan(kf_step, kf_init, frame_stream)
        kf_counts = jnp.concatenate([jnp.zeros((1,), kf_counts.dtype), kf_counts])
        is_kf = jnp.concatenate([jnp.zeros((1,), bool), is_kf])
        # All scalar-per-frame reductions happen IN-program: every extra op
        # issued after this call is one more RPC round trip on a tunneled
        # accelerator (the round-1 video bottleneck).
        prev_counts = matches.count()
        return feats, matches, prev_counts, kf_counts, is_kf

    return run


@functools.lru_cache(maxsize=32)
def _compiled_slicer(t: int):
    """One jitted dispatch slicing every padded (C*B, ...) leaf to (T, ...)."""
    return jax.jit(lambda tree: jax.tree.map(lambda x: x[:t], tree))


def process_video(
    frames,
    config: AkazeConfig | None = None,
    mconfig: MatchConfig | None = None,
    sconfig: SfmConfig | None = None,
    batch: int = 8,
) -> VideoResult:
    """Run the full front-end over a (T, H, W) sequence in ONE device call."""
    config = config or AkazeConfig()
    # Video tracking gates on absolute Hamming distance as well: genuine
    # frame-to-frame matches sit far below 120/486 bits, while ratio+mutual
    # alone lets a trickle of random cross-scene matches through, which
    # would mask scene cuts from the keyframe logic.
    mconfig = mconfig or MatchConfig(max_distance=120)
    sconfig = sconfig or SfmConfig()
    # At most ONE host->device transfer (none if `frames` is already a
    # device array — an np.asarray here would silently round-trip it
    # through the host, which dominates everything on a tunneled chip).
    frames = jnp.asarray(frames, jnp.float32)
    T = int(frames.shape[0])
    # Chunk count is a compile-time constant (scan length); bucket it to the
    # next power of two so variable-length sequences reuse executables.  Tail
    # padding repeats the last frame — padded frames track the keyframe
    # perfectly, so they never insert phantom keyframes, and every padded
    # output row is sliced off below.
    num_chunks = max(1, -(-T // batch))
    num_chunks = 1 << (num_chunks - 1).bit_length()
    total = num_chunks * batch
    if total > T:
        frames = jnp.concatenate(
            [frames, jnp.repeat(frames[-1:], total - T, axis=0)]
        )
    chunks = frames.reshape(num_chunks, batch, *frames.shape[1:])
    run = _compiled_video_program(config, mconfig, sconfig, num_chunks)
    feats, matches, prev_counts, kf_counts, is_kf = run(chunks)

    feats, matches = _compiled_slicer(T)((feats, matches))
    counts = np.array(prev_counts)[:T]
    counts[0] = 0
    kf_counts = np.asarray(kf_counts)[:T]
    is_kf = np.asarray(is_kf)[:T]
    keyframes = [0] + [int(t) for t in np.nonzero(is_kf)[0]]
    return VideoResult(
        features=feats,
        match_counts=counts,
        keyframes=keyframes,
        matches_prev=matches,
        kf_match_counts=kf_counts,
    )
