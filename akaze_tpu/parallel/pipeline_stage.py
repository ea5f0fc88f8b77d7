"""Stage pipelining (PP) for streaming video: extract | match across mesh
groups (SURVEY.md §2 parallelism table, "stage pipelining detect->describe->
match across mesh groups for streaming video; optional, low priority").

TPU-native shape: a 2-stage GPipe-style pipeline over a `stage` mesh axis.
Each device runs the SAME SPMD program under `shard_map`; `lax.cond` on
`lax.axis_index("stage")` selects that device's stage work (per-shard
control flow — genuinely different compute per group), and the activation
hand-off between stages is a `lax.ppermute` over ICI:

    step s:  stage 0 extracts features for microbatch s
             ppermute stage0 -> stage1
             stage 1 matches microbatch s-1 against s-2 (received earlier)

With S stages the pipeline runs T + (S-1) steps for T microbatches (the
usual bubble); throughput approaches min(stage times) instead of their sum.
The reference has no counterpart (single-threaded CPU library); the default
video path (matching/video.py) instead fuses stages into one device program
— this module is the multi-chip streaming variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from akaze_tpu.core.config import AkazeConfig, MatchConfig
from akaze_tpu.frontend.pipeline import extract_batch_fn
from akaze_tpu.matching.hamming import match_fn


def make_stage_mesh(devices=None) -> Mesh:
    """1-D `stage` mesh over two devices (extract | match)."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= 2, "stage pipelining needs >= 2 devices"
    return Mesh(np.asarray(devices[:2]), axis_names=("stage",))


@functools.lru_cache(maxsize=8)
def _compiled_pipeline(
    mesh: Mesh, config: AkazeConfig, mconfig: MatchConfig, num_mb: int
):
    cap = config.max_keypoints
    words = config.descriptor_words

    def stage_program(mbs):
        """Runs on every device; mbs (num_mb, B, H, W) replicated."""
        stage = jax.lax.axis_index("stage")

        def flat_feats(feats):
            return (
                feats.descriptors.reshape(-1, words),
                feats.keypoints.valid.reshape(-1),
            )

        zero_feats = (
            jnp.zeros((mbs.shape[1] * cap, words), jnp.uint32),
            jnp.zeros((mbs.shape[1] * cap,), bool),
        )

        def step(carry, mb):
            prev_recv, prev_prev_last = carry

            # ---- stage 0: extract this microbatch ----
            def extract_stage(_):
                feats = extract_batch_fn(mb, config)
                return flat_feats(feats)

            def idle_stage(_):
                return zero_feats

            produced = jax.lax.cond(stage == 0, extract_stage, idle_stage, None)
            # Hand the activation to stage 1 (ICI ppermute ring edge 0->1).
            recv = jax.tree.map(
                lambda x: jax.lax.ppermute(x, "stage", [(0, 1)]), produced
            )

            # ---- stage 1: match the previously received microbatch ----
            def match_stage(_):
                desc = prev_recv[0].reshape(-1, cap, words)
                val = prev_recv[1].reshape(-1, cap)
                prev_d = jnp.concatenate(
                    [prev_prev_last[0][None], desc[:-1]], axis=0
                )
                prev_v = jnp.concatenate(
                    [prev_prev_last[1][None], val[:-1]], axis=0
                )
                m = jax.vmap(
                    lambda da, va, db, vb: match_fn(da, va, db, vb, mconfig)
                )(prev_d, prev_v, desc, val)
                return m.count()

            def idle_match(_):
                return jnp.zeros((mbs.shape[1],), jnp.int32)

            counts = jax.lax.cond(stage == 1, match_stage, idle_match, None)
            last = (
                prev_recv[0].reshape(-1, cap, words)[-1],
                prev_recv[1].reshape(-1, cap)[-1],
            )
            return (recv, last), counts

        init = (
            zero_feats,
            (jnp.zeros((cap, words), jnp.uint32), jnp.zeros((cap,), bool)),
        )
        # One warm-up step (bubble) plus T steps; feed a zero microbatch last.
        padded = jnp.concatenate([mbs, jnp.zeros_like(mbs[:1])], axis=0)
        _, counts = jax.lax.scan(step, init, padded)
        # counts[s] holds stage-1 results for microbatch s-1; drop the bubble.
        return jax.lax.psum(counts[1:], "stage")  # stage 0 rows are zeros

    fn = jax.shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def pipelined_match_counts(
    frames,
    mesh: Mesh,
    config: AkazeConfig | None = None,
    mconfig: MatchConfig | None = None,
    microbatch: int = 2,
) -> np.ndarray:
    """Consecutive-frame match counts for a (T, H, W) sequence, computed by
    the 2-stage pipeline.  Returns (T,) counts (count[0] = 0)."""
    config = config or AkazeConfig()
    mconfig = mconfig or MatchConfig(max_distance=120)
    frames = jnp.asarray(np.asarray(frames, np.float32))
    t = frames.shape[0]
    num_mb = -(-t // microbatch)
    total = num_mb * microbatch
    if total > t:
        frames = jnp.concatenate(
            [frames, jnp.repeat(frames[-1:], total - t, axis=0)]
        )
    mbs = frames.reshape(num_mb, microbatch, *frames.shape[1:])
    run = _compiled_pipeline(mesh, config, mconfig, num_mb)
    counts = np.array(run(mbs)).reshape(-1)[:t]
    counts[0] = 0
    return counts
