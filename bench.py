"""Benchmarks for the BASELINE.md configs.

Default (driver protocol): ONE JSON line — the headline metric, AKAZE
detect+describe+match at 640x480, frames/s on the current accelerator.

Baseline: MEASURED at bench time by running the native single-core CPU
AKAZE pipeline (akaze_tpu/native/akaze_cpu.cpp — the reference's stand-in,
since the Rust reference cannot be built here; parity-tested against the
golden oracle in tests/test_native.py) on the same protocol:
detect+describe+match over a VGA pair, 1 CPU core.  Falls back to the
canonical 10 fps literature order of magnitude only if no C++ toolchain is
available (BASELINE.md; Alcantarilla et al. BMVC 2013: ~7-20 fps VGA).

`python bench.py --all` additionally reports configs 2-5 (two-view pose,
conductivity variants, 500-frame video front-end, mini SfM with BA), one
JSON line each.
"""

from __future__ import annotations

import argparse
import json
import os
import time

# Persistent XLA compile cache: a cold bench run reuses programs compiled by
# earlier runs/tests instead of paying the multi-minute remote Mosaic
# compile over the TPU tunnel (see .claude/skills/verify/SKILL.md gotchas).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_akaze_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

# The axon sitecustomize imports jax at interpreter startup, before the env
# defaults above exist — set the cache config explicitly as well.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_akaze_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

_FALLBACK_BASELINE_FPS = 10.0  # literature order of magnitude (BASELINE.md)
_BASELINE_FPS: float | None = None


def baseline_fps(announce: bool = False) -> float:
    """Measured single-core CPU reference frames/s (cached per process)."""
    global _BASELINE_FPS
    if _BASELINE_FPS is None:
        try:
            from akaze_tpu import native
            from akaze_tpu.utils.synthetic import video_sequence

            pair = video_sequence(2, 480, 640, seed=1)
            sec = native.bench_pipeline_native(pair[0], pair[1], reps=3)
            _BASELINE_FPS = 1.0 / sec
            if announce:  # default driver protocol wants ONE line total
                print(json.dumps({
                    "metric": "baseline_cpu_single_core_fps",
                    "value": round(_BASELINE_FPS, 2), "unit": "frames/s",
                }), flush=True)
        except Exception:
            _BASELINE_FPS = _FALLBACK_BASELINE_FPS
    return _BASELINE_FPS


def _emit(metric, value, unit, vs_baseline=None, **extra):
    rec = {"metric": metric, "value": round(float(value), 2), "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(float(vs_baseline), 2)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def bench_headline() -> None:
    """Config 1+2 core: batched detect+describe + consecutive matching."""
    from akaze_tpu.core.config import AkazeConfig, MatchConfig
    from akaze_tpu.frontend.pipeline import extract_batch_fn
    from akaze_tpu.matching.hamming import match_fn
    from akaze_tpu.utils.synthetic import video_sequence

    config = AkazeConfig()
    mcfg = MatchConfig()
    # Batch 128 (round 5): the round-2 "flattens past 64" reading no
    # longer holds at the ~13 ms/batch16 operating point — per-dispatch
    # fixed costs shrank relative to compute as the pipeline got faster,
    # and 128 measured +5.7% over 64 same-session (1227.7 vs 1161.2).
    # reps = 3 keeps the in-flight bytes at the level 3x-batch-128 chained
    # dispatches just measured safely — the round-3 note says ~6 queued
    # batch-64 dispatches can abort the tunneled backend, and 4x128 would
    # exceed that equivalent depth.
    # DISTINCT pre-uploaded inputs per rep guard against tunnel result
    # reuse (verified identical to same-input in round 2, but the round-3
    # custom-call-free configs measured impossible numbers with one input).
    batch = 128
    reps = 3
    # One UNIQUE buffer per rep: re-executing the same program on the same
    # device buffer can return a cached result through the tunnel (measured
    # 865k "fps").  4 queued batch-64 dispatches measure honestly (57 ms
    # each, consistent with the batch-16 device time); 6 abort the tunneled
    # backend.  Per-rep host syncs are NOT an option here: one tunnel round
    # trip costs ~230 ms and would swamp the 57 ms compute.
    frame_sets = [
        jnp.asarray(video_sequence(batch, 480, 640, seed=s))
        for s in range(reps)
    ]
    jax.block_until_ready(frame_sets)

    @jax.jit
    def step(imgs, token):
        # The token chains rep r+1's INPUT to rep r's OUTPUT (via an
        # optimization barrier so XLA cannot elide it): the final result
        # transitively depends on every dispatch, so one host sync at the
        # end provably waits for all of them.  Without this, the tunneled
        # backend's block_until_ready can return before the queued work
        # finishes (measured 889k "fps" with 4 distinct input buffers).
        imgs, token = jax.lax.optimization_barrier((imgs, token))
        feats = extract_batch_fn(imgs, config)
        kp = feats.keypoints
        m = jax.vmap(lambda da, va, db, vb: match_fn(da, va, db, vb, mcfg))(
            feats.descriptors[:-1], kp.valid[:-1],
            feats.descriptors[1:], kp.valid[1:],
        )
        kc = feats.keypoints.count()
        # Token ACCUMULATES (round 5): with `token + sum` every dispatch's
        # scalar input is distinct across passes too, so no (program,
        # inputs) pair ever repeats — tunnel result reuse cannot serve a
        # later pass from an earlier one.
        return kc, m.count(), token + jnp.sum(kc).astype(jnp.float32)

    token = jnp.float32(0.0)
    jax.block_until_ready(step(frame_sets[0], token))  # compile
    # N independent passes of the chained protocol (round-4 verdict item 1):
    # one pass times ~210-270 ms of wall clock, so a transient load spike on
    # the shared machine/tunnel used to decide the round's number of record
    # (BENCH_r04 printed 933 fps the same day the tree measured 1191-1216).
    # Best-of-N is the right estimator of machine capability when noise is
    # strictly additive (spikes only ever slow a pass down); the per-pass
    # spread and the same-process CPU baseline are recorded in the JSON
    # line so a slow-machine run is self-diagnosing.
    passes = 3
    pass_fps = []
    for _ in range(passes):
        t0 = time.perf_counter()
        counts = []
        for f in frame_sets:
            kc, mc, token = step(f, token)
            counts.append(kc)
        token = jnp.float32(float(token))  # host sync closing this pass's chain
        dt = time.perf_counter() - t0
        # Integrity guard: distinct inputs must give non-identical outputs.
        csums = [int(c.sum()) for c in counts]
        assert len(set(csums)) > 1, "bench outputs identical across inputs"
        pass_fps.append(batch * len(frame_sets) / dt)
    fps = max(pass_fps)
    _emit(
        "akaze_vga_detect_describe_match_fps", fps, "frames/s",
        fps / baseline_fps(),
        passes_fps=[round(f, 1) for f in pass_fps],
        baseline_fps=round(baseline_fps(), 2),
    )


def bench_two_view() -> None:
    """Config 2: full two-view pipeline incl. RANSAC essential pose."""
    from akaze_tpu.core.config import AkazeConfig, MatchConfig, RansacConfig
    from akaze_tpu.frontend.pipeline import extract_batch_fn
    from akaze_tpu.geometry.twoview import estimate_relative_pose_fn, normalize_points
    from akaze_tpu.matching.hamming import match_fn
    from akaze_tpu.utils.synthetic import video_sequence

    config = AkazeConfig()
    mcfg = MatchConfig()
    rcfg = RansacConfig(num_iterations=256)
    # Throughput is measured batched (TPU-first, like the headline): P pairs
    # = 2P frames extracted in one dispatch, match + RANSAC vmapped per pair.
    # DISTINCT pre-uploaded frame sets per rep + a scalar host transfer per
    # rep: with one reused input the round-3 pure-jnp RANSAC measured an
    # impossible 77k pairs/s (tunnel result reuse) — see BASELINE.md.
    # P=32 (64 frames/dispatch, the headline batch): round 3 ran P=8 and
    # was ~87% dispatch overhead (2.7 ms device / 21.8 ms wall per RANSAC
    # stage); batching amortizes it (round-4 verdict item 5).  Measured
    # 500 pairs/s at P=16 and 540 at P=32 (tools/bench_twoview.py).  The
    # P=32 program HUNG the remote compile service twice at the PRE-fix
    # round-4 tree (>40 min, no abort); at the current kernels it compiles
    # in ~5 min (verified twice — tools/repro_compile_abort.py twoview_32
    # and the bench_twoview run), like the other round-3 known-bad shapes.
    P = 32
    frame_sets = [
        jnp.asarray(video_sequence(2 * P, 480, 640, seed=s)) for s in (1, 2, 3)
    ]
    jax.block_until_ready(frame_sets)
    intr = (640.0, 640.0, 320.0, 240.0)
    keys = jax.random.split(jax.random.PRNGKey(0), P)

    @jax.jit
    def step(imgs, token):
        # Token chain: see bench_headline — defeats tunnel early-return.
        imgs, token = jax.lax.optimization_barrier((imgs, token))
        feats = extract_batch_fn(imgs, config)
        kp = feats.keypoints
        da, va = feats.descriptors[0::2], kp.valid[0::2]
        db, vb = feats.descriptors[1::2], kp.valid[1::2]
        m = jax.vmap(lambda a, vva, b, vvb: match_fn(a, vva, b, vvb, mcfg))(
            da, va, db, vb
        )

        def pose_one(xa, ya, xb, yb, idx_b, accepted, key):
            x1 = normalize_points(xa, ya, intr)
            x2 = normalize_points(xb[idx_b], yb[idx_b], intr)
            return estimate_relative_pose_fn(x1, x2, accepted, key, rcfg)

        pose = jax.vmap(pose_one)(
            kp.x[0::2], kp.y[0::2], kp.x[1::2], kp.y[1::2],
            m.idx_b, m.accepted, keys,
        )
        inl = pose.num_inliers
        return inl, jnp.sum(inl).astype(jnp.float32)

    token = jnp.float32(0.0)
    jax.block_until_ready(step(frame_sets[0], token))
    reps = 4
    t0 = time.perf_counter()
    for r in range(reps):
        _, token = step(frame_sets[r % len(frame_sets)], token)
    token = float(token)  # one host sync closing the dependency chain
    pps = P * reps / (time.perf_counter() - t0)
    _emit("two_view_pose_pairs_per_s", pps, "pairs/s")

    # Accuracy vs the recorded reference bound (BASELINE.md round 2:
    # golden-model bound rot <= 1.5 deg / t-dir <= 6 deg on the calibrated
    # multi-plane benchmark).
    from akaze_tpu.matching.hamming import match_features
    from akaze_tpu.utils.synthetic import multi_plane_pair

    img_a, img_b, R_gt, t_gt, intr2 = multi_plane_pair(seed=6)
    feats = extract_batch_fn(jnp.asarray(np.stack([img_a, img_b])), config)
    mm = match_features(
        jax.tree.map(lambda x: x[0], feats), jax.tree.map(lambda x: x[1], feats)
    )
    kp2 = feats.keypoints
    x1b = normalize_points(kp2.x[0], kp2.y[0], intr2)
    x2b = normalize_points(kp2.x[1][mm.idx_b], kp2.y[1][mm.idx_b], intr2)
    pose = estimate_relative_pose_fn(
        x1b, x2b, mm.accepted, jax.random.PRNGKey(0),
        RansacConfig(num_iterations=512, inlier_threshold=2e-3),
    )
    R_est = np.asarray(pose.R)
    t_est = np.asarray(pose.t)
    rot = np.degrees(np.arccos(np.clip((np.trace(R_est @ R_gt.T) - 1) / 2, -1, 1)))
    tdir = np.degrees(np.arccos(np.clip(abs(t_est @ t_gt), -1, 1)))
    _emit("two_view_rot_err_deg", rot, "deg", rot / 1.5)  # bound = 1.5 deg
    _emit("two_view_tdir_err_deg", tdir, "deg", tdir / 6.0)  # bound = 6 deg


def _variant_baseline_fps(diffusivity: str) -> float:
    """Same-variant single-core CPU baseline (g1's exp costs on CPU too);
    falls back to the default-config baseline if the native build is out."""
    try:
        from akaze_tpu import native
        from akaze_tpu.utils.synthetic import video_sequence

        pair = video_sequence(2, 480, 640, seed=1)
        return 1.0 / native.bench_pipeline_native(
            pair[0], pair[1], reps=3, diffusivity=diffusivity
        )
    except Exception:
        return baseline_fps()


def bench_conductivity() -> None:
    """Config 3: g1 / Weickert variants, headline-shaped throughput.

    vs_baseline divides by the SAME-variant CPU baseline (measured live),
    not the default-g2 number — each variant pays its conductivity cost on
    both sides of the ratio."""
    from akaze_tpu.core.config import AkazeConfig, Diffusivity
    from akaze_tpu.frontend.pipeline import extract_batch_fn
    from akaze_tpu.utils.synthetic import video_sequence

    # Batch 64 like the headline (round 4): the round-3 batch-64 variant
    # compile ABORTS are gone at the round-4 kernels (verified with
    # tools/repro_compile_abort.py — g1_64/w_64 both compile), and batch
    # 64 measured g1 860 -> 1237 fps / Weickert 637 -> 1259 fps over the
    # batch-16 pin.  DISTINCT pre-uploaded inputs per rep: one reused
    # input measured an impossible 220k fps (tunnel result reuse).
    batch = 64
    frame_sets = [
        jnp.asarray(video_sequence(batch, 480, 640, seed=s)) for s in (0, 1, 2)
    ]
    jax.block_until_ready(frame_sets)
    for diff in (Diffusivity.PM_G1, Diffusivity.WEICKERT):
        config = AkazeConfig(diffusivity=diff)

        def f_impl(im, token, c=config):
            # Token chain: see bench_headline — defeats tunnel early-return.
            im, token = jax.lax.optimization_barrier((im, token))
            feats = extract_batch_fn(im, c)
            # Descriptor checksum keeps the describe stage live (counts
            # alone would let XLA dead-code-eliminate it).
            kc = feats.keypoints.count()
            # The descriptor term must be non-elidable (0 * x would let XLA
            # DCE the describe stage): use the u32 checksum's parity.
            dsum = (jnp.sum(feats.descriptors) % 2).astype(jnp.float32)
            return kc, jnp.sum(kc).astype(jnp.float32) + dsum

        f = jax.jit(f_impl)
        token = jnp.float32(0.0)
        jax.block_until_ready(f(frame_sets[0], token))
        reps = 4
        t0 = time.perf_counter()
        for r in range(reps):
            _, token = f(frame_sets[r % len(frame_sets)], token)
        token = float(token)
        fps = batch * reps / (time.perf_counter() - t0)
        _emit(
            f"akaze_vga_fps_{diff.value}", fps, "frames/s",
            fps / _variant_baseline_fps(diff.value),
        )


def bench_video(num_frames: int = 500) -> None:
    """Config 4: video front-end with sequential matching + keyframes."""
    from akaze_tpu.core.config import AkazeConfig
    from akaze_tpu.matching.video import process_video
    from akaze_tpu.utils.synthetic import video_sequence

    # Upload once; process_video keeps device arrays device-resident.  The
    # first call compiles the single-dispatch sequence program (its chunk
    # count is a compile-time scan length); the timed second call measures
    # steady-state streaming throughput.
    frames = jnp.asarray(video_sequence(num_frames, 480, 640, seed=0))
    jax.block_until_ready(frames)
    cfg = AkazeConfig()
    process_video(frames, cfg, batch=16)
    t0 = time.perf_counter()
    res = process_video(frames, cfg, batch=16)
    dt = time.perf_counter() - t0
    _emit("video_frontend_fps_500", num_frames / dt, "frames/s",
          num_frames / dt / baseline_fps())


def bench_sfm(num_keyframes: int = 50, num_points: int = 600) -> None:
    """Config 5: incremental SfM with periodic BA.

    50 kf / 600 pts is the BASELINE.json config; 200 kf / 5000 pts is the
    round-3 scale config (the dense 6Kx6K solve hands off to block-Jacobi
    CG past K = 64, and the Schur cross terms assemble via segment-sum).
    The 200 kf trajectory is a closed LOOP with verified closure edges
    (round-4 verdict item 3): the run exercises the full drift-bounding
    machinery — pose-graph optimization over odometry + closure edges and
    a BA re-polish — instead of showcasing open-loop monocular drift the
    repo already has subsystems to correct."""
    from akaze_tpu.core.config import RansacConfig, SfmConfig
    from akaze_tpu.sfm.incremental import run_incremental
    from akaze_tpu.sfm.metrics import ate_rmse, camera_centers
    from akaze_tpu.utils.synthetic import sfm_scene

    loop = num_keyframes > 50
    # Loop scene at 2e-3 normalized obs noise (~1.3 px at VGA focal — a
    # realistic tracker error): open-loop drift is then real (ATE 0.049)
    # and the closure machinery measurably bounds it (0.032); at the
    # near-noiseless 5e-4 the drift is ~1e-4 of the trajectory and
    # closures have nothing to do.  Round-4 code DIVERGED at this noise
    # (ATE 4.8) — fixed by anchor triangulation (BASELINE.md round 5).
    poses, observations, closures = sfm_scene(
        num_keyframes, num_points, seed=0, loop=loop,
        obs_noise=2e-3 if loop else 5e-4,
    )
    scfg = SfmConfig(ba_iterations=8)
    rcfg = RansacConfig(num_iterations=256, inlier_threshold=5e-3)
    kwargs = dict(ba_every=8, closures=closures or None)
    # Warm-up run populates the bucket-keyed executables (PnP/triangulation
    # super-steps + BA sizes); the timed run measures steady-state.
    run_incremental(observations, num_keyframes, scfg, rcfg, **kwargs)
    t0 = time.perf_counter()
    res = run_incremental(observations, num_keyframes, scfg, rcfg, **kwargs)
    dt = time.perf_counter() - t0
    ate = ate_rmse(camera_centers(res.poses), camera_centers(poses))
    tag = f"sfm_{num_keyframes}kf"
    _emit(f"{tag}_keyframes_per_s", num_keyframes / dt, "keyframes/s")
    _emit(f"{tag}_ate", ate, "scene_units")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--all", action="store_true", help="run BASELINE configs 2-5 too")
    p.add_argument(
        "--only",
        help="comma-separated subset of sections: headline,two_view,"
        "conductivity,video,sfm,sfm200 (each self-contained — a"
        " compile-service hang in one section then cannot block the rest)",
    )
    args = p.parse_args()
    sections = {
        "headline": bench_headline,
        "two_view": bench_two_view,
        "conductivity": bench_conductivity,
        "video": bench_video,
        "sfm": bench_sfm,
        "sfm200": lambda: bench_sfm(num_keyframes=200, num_points=5000),
    }
    if args.only:
        baseline_fps(announce=True)
        for name in args.only.split(","):
            sections[name.strip()]()
        return
    if args.all:
        baseline_fps(announce=True)
    bench_headline()
    if args.all:
        bench_two_view()
        bench_conductivity()
        bench_video()
        bench_sfm()
        bench_sfm(num_keyframes=200, num_points=5000)


if __name__ == "__main__":
    main()
