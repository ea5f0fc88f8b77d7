"""Stage pipelining (PP) for streaming video over a (stage, data) 2-D mesh
(SURVEY.md §2 parallelism table: "stage pipelining detect->describe->match
across mesh groups for streaming video; optional, low priority").

TPU-native shape: a 3-stage GPipe-style pipeline — the streaming visual-
odometry front-end decomposed along its real data-flow boundaries —
composed with data parallelism WITHIN each stage (round 4; the round-2/3
version was a fixed 2-device extract|match demo):

    stage 0  extract   each data lane extracts its slice of the microbatch
    stage 1  match     lanes all-gather the (tiny) descriptor activations
                       over `data`, then each matches its slice of
                       consecutive-frame pairs
    stage 2  pose      each lane runs RANSAC essential + pose recovery on
                       its slice of matched pairs

Every device runs the SAME SPMD program under `shard_map` over a
`(stage, data)` mesh; `lax.cond` on `lax.axis_index("stage")` selects the
stage work (genuinely different compute per mesh row), activations hand
off stage s -> s+1 with `lax.ppermute` along the `stage` axis (one edge
per data lane, riding ICI), and per-stage outputs combine with `psum`.
With S stages the scan runs T + (S-1) steps for T microbatches (the usual
pipeline bubble).  DESIGN INTENT, not measured behavior: steady-state
throughput should approach the slowest stage instead of the stage sum —
this environment has one real chip, so pipeline *timing* is unmeasurable
here (a virtual CPU mesh shares one socket's cores and proves nothing
about stage overlap; see BASELINE.md "Scaling efficiency report").  What
IS verified: output parity with the sequential path at data widths 1 and 2
(tests/test_pipeline_stage.py).  The reference has no counterpart
(single-threaded CPU library); the default video path (matching/video.py)
instead fuses all stages into one device program — this module is the
multi-chip streaming variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from akaze_tpu.core.config import AkazeConfig, MatchConfig, RansacConfig
from akaze_tpu.frontend.pipeline import extract_batch_fn
from akaze_tpu.geometry.twoview import estimate_relative_pose_fn, normalize_points
from akaze_tpu.matching.hamming import match_fn

NUM_STAGES = 3  # extract | match | pose — the pipeline's real stage count


def make_stage_mesh(devices=None, data: int = 1) -> Mesh:
    """(stage, data) 2-D mesh: NUM_STAGES stage rows x `data` lanes each."""
    devices = devices if devices is not None else jax.devices()
    need = NUM_STAGES * data
    assert len(devices) >= need, (
        f"stage pipelining needs {NUM_STAGES} x {data} = {need} devices, "
        f"got {len(devices)}"
    )
    return Mesh(
        np.asarray(devices[:need]).reshape(NUM_STAGES, data),
        axis_names=("stage", "data"),
    )


@functools.lru_cache(maxsize=8)
def _compiled_pipeline(
    mesh: Mesh,
    config: AkazeConfig,
    mconfig: MatchConfig,
    rconfig: RansacConfig,
    num_mb: int,
    intr: tuple,
):
    cap = config.max_keypoints
    words = config.descriptor_words
    D = mesh.devices.shape[1]

    def stage_program(mbs):
        """Runs on every device; mbs (num_mb, B, H, W) replicated."""
        stage = jax.lax.axis_index("stage")
        lane = jax.lax.axis_index("data")
        B = mbs.shape[1]
        assert B % D == 0, f"microbatch {B} must divide data lanes {D}"
        local_b = B // D

        # Activation pytrees.  Stage 0 -> 1 carries flat per-frame features
        # for the lane's slice; stage 1 -> 2 carries normalized
        # correspondences for the lane's slice of consecutive pairs.
        def flat_feats(feats):
            return (
                feats.descriptors.reshape(-1, words),
                feats.keypoints.valid.reshape(-1),
                feats.keypoints.x.reshape(-1),
                feats.keypoints.y.reshape(-1),
            )

        zero_feats = (
            jnp.zeros((local_b * cap, words), jnp.uint32),
            jnp.zeros((local_b * cap,), bool),
            jnp.zeros((local_b * cap,), jnp.float32),
            jnp.zeros((local_b * cap,), jnp.float32),
        )
        zero_corr = (
            jnp.zeros((local_b, cap, 3), jnp.float32),  # x1 normalized
            jnp.zeros((local_b, cap, 3), jnp.float32),  # x2 normalized
            jnp.zeros((local_b, cap), bool),  # accepted
        )
        zero_last = (
            jnp.zeros((cap, words), jnp.uint32),
            jnp.zeros((cap,), bool),
            jnp.zeros((cap,), jnp.float32),
            jnp.zeros((cap,), jnp.float32),
        )

        def step(carry, xs):
            mb, step_i = xs
            feats_recv, corr_recv, prev_last = carry

            # ---- stage 0: extract this microbatch's lane slice ----
            def extract_stage(_):
                sl = jax.lax.dynamic_slice_in_dim(mb, lane * local_b, local_b)
                return flat_feats(extract_batch_fn(sl, config))

            produced = jax.lax.cond(
                stage == 0, extract_stage, lambda _: zero_feats, None
            )
            feats_next = jax.tree.map(
                lambda x: jax.lax.ppermute(x, "stage", [(0, 1)]), produced
            )

            # ---- stage 1: match the previously received microbatch ----
            def match_stage(_):
                # All-gather the microbatch's features over the data lanes
                # (descriptors are tiny next to frames); every lane then
                # matches its own slice of consecutive pairs — including
                # cross-lane boundary pairs, with no halo special-casing.
                full = jax.tree.map(
                    lambda x: jax.lax.all_gather(x, "data", tiled=True),
                    feats_recv,
                )
                desc = full[0].reshape(B, cap, words)
                val = full[1].reshape(B, cap)
                xs = full[2].reshape(B, cap)
                ys = full[3].reshape(B, cap)
                # Frame f's predecessor: f-1, or the previous microbatch's
                # last frame for f = 0.
                prev_d = jnp.concatenate(
                    [prev_last[0][None], desc[:-1]], axis=0
                )
                prev_v = jnp.concatenate([prev_last[1][None], val[:-1]], axis=0)
                prev_x = jnp.concatenate([prev_last[2][None], xs[:-1]], axis=0)
                prev_y = jnp.concatenate([prev_last[3][None], ys[:-1]], axis=0)
                s0 = lane * local_b
                take = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, local_b)
                m = jax.vmap(
                    lambda da, va, db, vb: match_fn(da, va, db, vb, mconfig)
                )(take(prev_d), take(prev_v), take(desc), take(val))

                def corr_one(px, py, cx, cy, idx_b, acc):
                    x1 = normalize_points(px, py, intr)
                    x2 = normalize_points(cx[idx_b], cy[idx_b], intr)
                    return x1, x2, acc

                x1, x2, acc = jax.vmap(corr_one)(
                    take(prev_x), take(prev_y), take(xs), take(ys),
                    m.idx_b, m.accepted,
                )
                counts = jnp.zeros((B,), jnp.int32)
                counts = jax.lax.dynamic_update_slice_in_dim(
                    counts, m.count(), s0, axis=0
                )
                new_last = jax.tree.map(
                    lambda a: a[-1], (desc, val, xs, ys)
                )
                return (x1, x2, acc), counts, new_last

            def idle_match(_):
                return zero_corr, jnp.zeros((B,), jnp.int32), prev_last

            corr, counts, new_last = jax.lax.cond(
                stage == 1, match_stage, idle_match, None
            )
            counts = jax.lax.psum(counts, ("stage", "data"))
            corr_next = jax.tree.map(
                lambda x: jax.lax.ppermute(x, "stage", [(1, 2)]), corr
            )

            # ---- stage 2: pose on the microbatch received before that ----
            def pose_stage(_):
                x1, x2, acc = corr_recv
                # Key = global frame index of each pair's SECOND frame
                # (pair j of microbatch m covers frames (mB+j-1, mB+j));
                # the corr received at step i belongs to microbatch i-2.
                frame_ids = (step_i - 2) * B + lane * local_b + jnp.arange(
                    local_b
                )
                keys = jax.vmap(jax.random.fold_in, (None, 0))(
                    jax.random.PRNGKey(rconfig.seed), frame_ids
                )
                pose = jax.vmap(
                    lambda a, b, m_, k: estimate_relative_pose_fn(
                        a, b, m_, k, rconfig
                    )
                )(x1, x2, acc, keys)
                inl = jnp.zeros((B,), jnp.int32)
                return jax.lax.dynamic_update_slice_in_dim(
                    inl, pose.num_inliers, lane * local_b, axis=0
                )

            inliers = jax.lax.cond(
                stage == 2, pose_stage, lambda _: jnp.zeros((B,), jnp.int32),
                None,
            )
            inliers = jax.lax.psum(inliers, ("stage", "data"))
            return (feats_next, corr_next, new_last), (counts, inliers)

        init = (zero_feats, zero_corr, zero_last)
        # S-1 = 2 bubble steps: pad with zero microbatches so the last real
        # microbatch drains through match and pose.
        padded = jnp.concatenate(
            [mbs, jnp.zeros_like(mbs[:1]), jnp.zeros_like(mbs[:1])], axis=0
        )
        step_iota = jnp.arange(padded.shape[0], dtype=jnp.int32)
        _, (counts, inliers) = jax.lax.scan(step, init, (padded, step_iota))
        # Row alignment: match output for microbatch s lands at step s+1,
        # pose output at step s+2.
        return counts[1 : 1 + num_mb], inliers[2 : 2 + num_mb]

    fn = jax.shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def pipelined_stream(
    frames,
    mesh: Mesh,
    config: AkazeConfig | None = None,
    mconfig: MatchConfig | None = None,
    rconfig: RansacConfig | None = None,
    microbatch: int = 2,
    intr: tuple | None = None,
):
    """Run the 3-stage (extract | match | pose) pipeline over a (T, H, W)
    sequence on a (stage, data) mesh.  Returns dict with per-frame
    consecutive-match counts and pose inlier counts ((T,) each; frame 0 has
    no predecessor, so its entries are 0)."""
    config = config or AkazeConfig()
    mconfig = mconfig or MatchConfig(max_distance=120)
    rconfig = rconfig or RansacConfig(num_iterations=64)
    frames = jnp.asarray(np.asarray(frames, np.float32))
    t, h, w = frames.shape
    intr = intr or (float(w), float(w), w / 2.0, h / 2.0)
    num_mb = -(-t // microbatch)
    total = num_mb * microbatch
    if total > t:
        frames = jnp.concatenate(
            [frames, jnp.repeat(frames[-1:], total - t, axis=0)]
        )
    mbs = frames.reshape(num_mb, microbatch, *frames.shape[1:])
    run = _compiled_pipeline(mesh, config, mconfig, rconfig, num_mb, intr)
    counts, inliers = run(mbs)
    counts = np.array(counts).reshape(-1)[:t]
    inliers = np.array(inliers).reshape(-1)[:t]
    counts[0] = 0
    inliers[0] = 0
    return {"match_counts": counts, "pose_inliers": inliers}


def pipelined_match_counts(
    frames,
    mesh: Mesh,
    config: AkazeConfig | None = None,
    mconfig: MatchConfig | None = None,
    microbatch: int = 2,
) -> np.ndarray:
    """Consecutive-frame match counts via the pipeline (compat wrapper).

    NOTE (round 4): the pipeline grew from 2 stages to NUM_STAGES = 3, so
    `mesh` now needs >= NUM_STAGES * data devices — round-3 callers on
    2-device meshes fail make_stage_mesh's device-count assert."""
    return pipelined_stream(
        frames, mesh, config, mconfig, microbatch=microbatch
    )["match_counts"]
