"""`akaze-extract`: image in -> serialized keypoints+descriptors out
(reference extract binary, SURVEY.md §3.3)."""

from __future__ import annotations

import argparse
import sys
import time

from akaze_tpu.core.config import AkazeConfig, Diffusivity


def build_config(args) -> AkazeConfig:
    return AkazeConfig(
        num_octaves=args.octaves,
        num_sublevels=args.sublevels,
        detector_threshold=args.threshold,
        diffusivity=Diffusivity(args.diffusivity),
        max_keypoints=args.max_keypoints,
    )


def add_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--octaves", type=int, default=4)
    p.add_argument("--sublevels", type=int, default=4)
    p.add_argument("--threshold", type=float, default=1e-3)
    p.add_argument(
        "--diffusivity",
        choices=[d.value for d in Diffusivity],
        default=Diffusivity.PM_G2.value,
    )
    # Default matches the library default (core/config.py AkazeConfig) so CLI
    # and library extract identical feature sets on the same image.
    p.add_argument(
        "--max-keypoints", type=int, default=AkazeConfig.max_keypoints
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image", help="input image (.npy/.npz/.pgm, or PIL formats)")
    p.add_argument("output", help="feature file (.json or .npz)")
    add_config_args(p)
    p.add_argument("--timing", action="store_true", help="log stage timings")
    args = p.parse_args(argv)

    from akaze_tpu.cli.imgio import load_gray, save_features
    from akaze_tpu.frontend.pipeline import extract

    img = load_gray(args.image)
    t0 = time.perf_counter()
    feats = extract(img, build_config(args))
    n = int(feats.keypoints.count())
    t1 = time.perf_counter()
    save_features(args.output, feats)
    if args.timing:
        print(
            f"extract: {img.shape[1]}x{img.shape[0]} -> {n} keypoints "
            f"in {t1 - t0:.3f}s (incl. compile on first call)",
            file=sys.stderr,
        )
    print(f"{n} keypoints -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
