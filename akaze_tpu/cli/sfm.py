"""`akaze-sfm`: incremental SfM over a frame sequence (BASELINE.md config 5):
front-end tracks -> two-view init -> PnP -> triangulation -> BA; writes the
trajectory, sparse map, and a resumable checkpoint."""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np


def main(argv=None) -> int:
    from akaze_tpu.cli.extract import add_config_args, build_config
    from akaze_tpu.cli.sequence import load_frames

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("frames", help="(T,H,W) .npy/.npz or a directory of images")
    p.add_argument("-o", "--output", required=True, help="output .json trajectory")
    add_config_args(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument(
        "--intrinsics", type=float, nargs=4, metavar=("FX", "FY", "CX", "CY"),
        help="camera intrinsics (default fx=fy=W, c=center)",
    )
    p.add_argument("--checkpoint", help="write the SfM map checkpoint here (.npz)")
    p.add_argument("--ba-iterations", type=int, default=10)
    p.add_argument(
        "--mesh", type=int, default=0,
        help="shard BA points over this many devices (0 = single device)",
    )
    p.add_argument(
        "--no-loop-closure", action="store_true",
        help="disable keyframe loop-closure detection + pose-graph optimization",
    )
    p.add_argument("--loop-min-gap", type=int, default=8,
                   help="minimum keyframe separation for closure candidates")
    p.add_argument("--loop-min-matches", type=int, default=60,
                   help="descriptor matches required to verify a candidate")
    p.add_argument("--loop-min-inliers", type=int, default=30,
                   help="RANSAC inliers required to accept a closure")
    args = p.parse_args(argv)

    from akaze_tpu.core.config import RansacConfig, SfmConfig
    from akaze_tpu.matching.video import process_video
    from akaze_tpu.sfm.checkpoint import SfmCheckpoint, save_checkpoint
    from akaze_tpu.sfm.incremental import build_tracks, run_incremental
    from akaze_tpu.utils.profiling import MetricsLogger

    frames = load_frames(args.frames)
    h, w = frames.shape[1:]
    fx, fy, cx, cy = args.intrinsics if args.intrinsics else (
        float(w), float(w), w / 2.0, h / 2.0
    )
    res = process_video(frames, build_config(args), batch=args.batch)

    acc = np.asarray(res.matches_prev.accepted)
    idx = np.asarray(res.matches_prev.idx_b)
    matches = [
        np.stack([np.nonzero(acc[t + 1])[0], idx[t + 1][acc[t + 1]]], axis=1)
        for t in range(len(frames) - 1)
    ]
    tracks = build_tracks(matches, len(frames))

    # Loop closure: match the keyframe database pairwise, verify with RANSAC,
    # merge the closure matches into the track set (revisited points become
    # shared 3D points) and keep the verified edges for pose-graph
    # optimization inside run_incremental.
    closures = []
    if not args.no_loop_closure and len(res.keyframes) >= 2:
        from akaze_tpu.sfm.loop_closure import (
            detect_loop_closures,
            merge_closure_tracks,
        )

        closures = detect_loop_closures(
            res.features, res.keyframes, (fx, fy, cx, cy),
            min_gap=args.loop_min_gap, min_matches=args.loop_min_matches,
            min_inliers=args.loop_min_inliers,
        )
        if closures:
            tracks = merge_closure_tracks(tracks, closures)

    # Track observations in normalized camera coords.
    kx = np.asarray(res.features.keypoints.x)
    ky = np.asarray(res.features.keypoints.y)
    observations = []
    for tr in tracks:
        obs = {
            f: np.array(
                [(kx[f, i] - cx) / fx, (ky[f, i] - cy) / fy], np.float32
            )
            for f, i in tr.items()
        }
        observations.append(obs)

    mesh = None
    if args.mesh:
        from akaze_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)
    sfm = run_incremental(
        observations, len(frames),
        SfmConfig(ba_iterations=args.ba_iterations),
        RansacConfig(), mesh=mesh, closures=closures,
    )

    from akaze_tpu.sfm.metrics import camera_centers

    centers = camera_centers(sfm.poses)
    out = {
        "num_frames": int(len(frames)),
        "num_tracks": len(tracks),
        "num_points": int(len(sfm.points)),
        "num_loop_closures": len(closures),
        "poses": sfm.poses.tolist(),
        "camera_centers": centers.tolist(),
    }
    pathlib.Path(args.output).write_text(json.dumps(out, indent=1))
    if args.checkpoint:
        save_checkpoint(
            args.checkpoint,
            SfmCheckpoint(
                poses=sfm.poses, points=np.asarray(sfm.points),
                track_point=sfm.track_point,
                keyframe_frames=sfm.keyframe_frames,
                next_keyframe=len(frames),
            ),
        )
    MetricsLogger().log(
        "sfm_done", frames=int(len(frames)), tracks=len(tracks),
        points=int(len(sfm.points)),
    )
    print(f"{len(frames)} frames, {len(tracks)} tracks, "
          f"{len(sfm.points)} points -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
