"""`akaze-sequence`: batched video front-end over a frame sequence
(BASELINE.md config 4): extraction + sequential matching + keyframes."""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np


def load_frames(path: str) -> np.ndarray:
    """(T, H, W) float32 frames from .npy/.npz, or a directory of images."""
    from akaze_tpu.cli.imgio import load_gray

    p = pathlib.Path(path)
    if p.is_dir():
        files = sorted(
            f for f in p.iterdir()
            if f.suffix.lower() in (".npy", ".pgm", ".png", ".jpg", ".jpeg")
        )
        return np.stack([load_gray(f) for f in files])
    if p.suffix.lower() == ".npz":
        with np.load(p) as z:
            return np.asarray(z[z.files[0]], np.float32)
    return np.asarray(np.load(p), np.float32)


def main(argv=None) -> int:
    from akaze_tpu.cli.extract import add_config_args, build_config

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("frames", help="(T,H,W) .npy/.npz or a directory of images")
    p.add_argument("-o", "--output", required=True, help="output .json summary")
    add_config_args(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--keyframe-min-tracked", type=float, default=0.6)
    p.add_argument("--features-out", help="optional .npz with all features")
    args = p.parse_args(argv)

    from akaze_tpu.core.config import SfmConfig
    from akaze_tpu.matching.video import process_video
    from akaze_tpu.utils.profiling import MetricsLogger, StageTimer

    frames = load_frames(args.frames)
    timer = StageTimer()
    metrics = MetricsLogger()
    with timer.stage("process_video"):
        res = process_video(
            frames,
            build_config(args),
            sconfig=SfmConfig(keyframe_min_tracked=args.keyframe_min_tracked),
            batch=args.batch,
        )
    t = timer.summary()["process_video"]
    fps = len(frames) / t
    kp_counts = np.asarray(res.features.keypoints.count())
    metrics.log(
        "sequence_done", frames=len(frames), fps=round(fps, 2),
        keyframes=len(res.keyframes),
        mean_keypoints=float(kp_counts.mean()),
        mean_matches=float(res.match_counts[1:].mean() if len(frames) > 1 else 0),
    )
    summary = {
        "num_frames": int(len(frames)),
        "fps": fps,
        "keyframes": res.keyframes,
        "keypoints_per_frame": kp_counts.tolist(),
        "matches_to_prev": res.match_counts.tolist(),
    }
    pathlib.Path(args.output).write_text(json.dumps(summary, indent=1))
    if args.features_out:
        kp = res.features.keypoints
        np.savez_compressed(
            args.features_out,
            x=np.asarray(kp.x), y=np.asarray(kp.y),
            response=np.asarray(kp.response), size=np.asarray(kp.size),
            octave=np.asarray(kp.octave), class_id=np.asarray(kp.class_id),
            angle=np.asarray(kp.angle), valid=np.asarray(kp.valid),
            descriptors=np.asarray(res.features.descriptors),
        )
    print(f"{len(frames)} frames @ {fps:.1f} fps, "
          f"{len(res.keyframes)} keyframes -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
