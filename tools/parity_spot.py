"""VGA golden-parity spot check on the REAL TPU pipeline, for bisecting
descriptor drift (round-3 verdict item: attribute the mean-bits budget).

Runs golden.extract once per (seed, config) and caches it to /tmp (the
NumPy oracle takes ~40 s at VGA), then measures the jitted TPU pipeline
against it: position-match fraction, descriptor Hamming stats, and the
match-level impact (accepted match count on a warped pair).

Usage (on the TPU, with axon site):
  env PYTHONPATH=/root/repo:/root/.axon_site \
      JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_akaze_tpu \
      JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
      [AKAZE_PALLAS_OCTAVES=0] [AKAZE_DESCRIBE=xla] [AKAZE_RECALL=1.0] \
      python -u tools/parity_spot.py <label>
"""
import dataclasses
import os
import pickle
import sys

import numpy as np

from akaze_tpu.core.config import AkazeConfig

label = sys.argv[1] if len(sys.argv) > 1 else "?"
recall = float(os.environ.get("AKAZE_RECALL", "0.95"))
cfg = dataclasses.replace(AkazeConfig(), candidate_recall=recall)
gcfg = AkazeConfig()  # golden ignores TPU-only knobs but keep defaults

H, W = 480, 640
if os.environ.get("AKAZE_SPOT_SCENES") == "1":
    # One VGA frame per adversarial scene class (tests/test_scene_regression).
    CASES = [
        ("textured", 3), ("rotated", 3), ("low_texture", 3),
        ("repetitive_grid", 3), ("illumination_ramp", 3),
    ]
else:
    CASES = [("textured", 3), ("textured", 11), ("textured", 27)]


def scene_image(name, seed):
    from akaze_tpu.utils.synthetic import SCENE_CLASSES

    return SCENE_CLASSES[name](H, W, seed=seed)


def golden_cached(name, seed):
    path = f"/tmp/golden_vga_{name}_{seed}.pkl"
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    from akaze_tpu.golden import akaze as golden

    img = scene_image(name, seed)
    res = golden.extract(img, gcfg)
    out = dict(
        x=np.array([k.x for k in res.keypoints], np.float32),
        y=np.array([k.y for k in res.keypoints], np.float32),
        angle=np.array([k.angle for k in res.keypoints], np.float32),
        lvl=np.array([k.class_id for k in res.keypoints], np.int32),
        desc=res.descriptors_u32,
    )
    with open(path, "wb") as f:
        pickle.dump(out, f)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from akaze_tpu.frontend.pipeline import extract, extract_batch

    batched = os.environ.get("AKAZE_SPOT_BATCHED") == "1"
    if batched:
        imgs = jnp.stack(
            [jnp.asarray(scene_image(n, s)) for n, s in CASES]
        )
        bfeat = extract_batch(imgs, cfg)
    all_ham, all_pos = [], []
    for i, (name, seed) in enumerate(CASES):
        g = golden_cached(name, seed)
        if batched:
            tfeat = jax.tree.map(lambda a: a[i], bfeat)
        else:
            tfeat = extract(jnp.asarray(scene_image(name, seed)), cfg)
        valid = np.asarray(tfeat.keypoints.valid)
        tx = np.asarray(tfeat.keypoints.x)[valid]
        ty = np.asarray(tfeat.keypoints.y)[valid]
        tl = np.asarray(tfeat.keypoints.class_id)[valid]
        td = np.asarray(tfeat.descriptors)[valid]
        d2 = (tx[:, None] - g["x"][None]) ** 2 + (ty[:, None] - g["y"][None]) ** 2
        # Pair within the SAME evolution level: on dense repetitive scenes,
        # distinct extrema from adjacent levels coincide in (x, y) and a
        # position-only NN pairs unrelated keypoints (descriptors at other
        # scales), which reads as fake descriptor drift.
        d2 = np.where(tl[:, None] == g["lvl"][None], d2, np.inf)
        nn = d2.argmin(1)
        ok = np.sqrt(d2.min(1)) < 0.5
        ham = np.bitwise_count(g["desc"][nn[ok]] ^ td[ok]).sum(1)
        all_ham.append(ham)
        all_pos.append(ok.mean())
        print(
            f"{label} {name}/{seed} n_tpu={int(valid.sum())} n_gold={len(g['x'])} "
            f"pos={ok.mean():.3f} ham mean={ham.mean():.2f} "
            f"med={np.median(ham):.0f} p95={np.percentile(ham, 95):.0f} "
            f"max={ham.max()}",
            flush=True,
        )
    ham = np.concatenate(all_ham)
    print(
        f"{label} TOTAL pos={np.mean(all_pos):.3f} ham mean={ham.mean():.3f} "
        f"med={np.median(ham):.0f} p95={np.percentile(ham, 95):.0f} max={ham.max()}",
        flush=True,
    )


if __name__ == "__main__":
    main()
