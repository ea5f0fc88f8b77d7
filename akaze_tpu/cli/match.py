"""`akaze-match`: extract+match two images, optional RANSAC essential pose
(reference match binary + [SPEC] pose extension, SURVEY.md §3.4)."""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    from akaze_tpu.cli.extract import add_config_args, build_config

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image_a")
    p.add_argument("image_b")
    p.add_argument("-o", "--output", help="write matches JSON here (default stdout)")
    add_config_args(p)
    p.add_argument("--ratio", type=float, default=0.8, help="Lowe ratio threshold")
    p.add_argument("--no-mutual", action="store_true")
    p.add_argument(
        "--pose",
        action="store_true",
        help="run RANSAC essential-matrix pose on the matches",
    )
    p.add_argument(
        "--intrinsics",
        type=float,
        nargs=4,
        metavar=("FX", "FY", "CX", "CY"),
        help="camera intrinsics for --pose (default: fx=fy=W, c=center)",
    )
    p.add_argument(
        "--viz", help="write a side-by-side match visualization image (.pgm/.png)"
    )
    args = p.parse_args(argv)

    from akaze_tpu.cli.imgio import load_gray
    from akaze_tpu.core.config import MatchConfig, RansacConfig
    from akaze_tpu.frontend.pipeline import extract
    from akaze_tpu.matching.hamming import match_features

    cfg = build_config(args)
    img_a = load_gray(args.image_a)
    img_b = load_gray(args.image_b)
    fa = extract(img_a, cfg)
    fb = extract(img_b, cfg)
    mcfg = MatchConfig(ratio=args.ratio, mutual=not args.no_mutual)
    res = match_features(fa, fb, mcfg)

    acc = np.asarray(res.accepted)
    ia = np.nonzero(acc)[0]
    ib = np.asarray(res.idx_b)[ia]
    out = {
        "num_keypoints_a": int(fa.keypoints.count()),
        "num_keypoints_b": int(fb.keypoints.count()),
        "num_matches": int(len(ia)),
        "matches": [
            {
                "a": int(i),
                "b": int(j),
                "distance": int(np.asarray(res.distance)[i]),
                "xa": float(np.asarray(fa.keypoints.x)[i]),
                "ya": float(np.asarray(fa.keypoints.y)[i]),
                "xb": float(np.asarray(fb.keypoints.x)[j]),
                "yb": float(np.asarray(fb.keypoints.y)[j]),
            }
            for i, j in zip(ia, ib)
        ],
    }

    if args.pose:
        from akaze_tpu.geometry.twoview import estimate_relative_pose, normalize_points

        h, w = img_a.shape
        intr = tuple(args.intrinsics) if args.intrinsics else (
            float(w), float(w), w / 2.0, h / 2.0
        )
        ka, kb = fa.keypoints, fb.keypoints
        idx_b = np.asarray(res.idx_b)
        x1 = normalize_points(np.asarray(ka.x), np.asarray(ka.y), intr)
        x2 = normalize_points(
            np.asarray(kb.x)[idx_b], np.asarray(kb.y)[idx_b], intr
        )
        pose = estimate_relative_pose(x1, x2, acc, RansacConfig())
        out["pose"] = {
            "R": np.asarray(pose.R).tolist(),
            "t": np.asarray(pose.t).tolist(),
            "E": np.asarray(pose.E).tolist(),
            "num_inliers": int(pose.num_inliers),
        }

    if args.viz:
        from akaze_tpu.cli.viz import render_matches, save_image

        ka, kb = fa.keypoints, fb.keypoints
        va = np.asarray(ka.valid)
        vb = np.asarray(kb.valid)
        # Accepted match indices are SLOT indices; valid slots may have holes
        # (sub-pixel rejects are discarded without backfill, like the
        # reference), so remap slots to compacted positions.
        pos_a = np.cumsum(va) - 1
        pos_b = np.cumsum(vb) - 1
        pairs = (
            np.stack([pos_a[ia], pos_b[ib]], axis=1)
            if len(ia) else np.zeros((0, 2), np.int64)
        )
        canvas = render_matches(
            img_a, img_b,
            np.asarray(ka.x)[va], np.asarray(ka.y)[va], np.asarray(ka.size)[va],
            np.asarray(kb.x)[vb], np.asarray(kb.y)[vb], np.asarray(kb.size)[vb],
            pairs,
        )
        save_image(args.viz, canvas)

    text = json.dumps(out, indent=1)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"{out['num_matches']} matches -> {args.output}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
