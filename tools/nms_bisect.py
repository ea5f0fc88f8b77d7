"""Bisect the adversarial-scene position-parity residual (round-4 verdict
item 6): on the SAME golden Ldet planes, run (a) the golden sequential
chain NMS (golden/akaze.find_scale_space_extrema) and (b) the repo's
parallel detect() (symmetric NMS + per-level candidate cap), and attribute
every position mismatch to one of:

  cap        the golden keypoint's candidate did not make the top
             per_level_candidates=256 of its level by response (a genuine
             difference class the parallel path introduces)
  topm       lost only to the global top-max_keypoints response cut
  chain      suppressed by a candidate that does NOT itself survive in the
             device output (the documented sequential-chain effect the
             symmetric NMS forgoes, frontend/detect.py:14-16)
  beaten     suppressed by a candidate that DOES survive (symmetric-vs-
             sequential disagreement on a real pair, incl. replacement
             semantics: golden lets a later stronger point REPLACE an
             earlier one in place, aux[idx] = point)
  subpix     present pre-refinement but the sub-pixel fit rejected it on
             one side only (should be ~0: identical formula)

Runs on CPU with the golden scale space as the common input, isolating
selection/NMS semantics from scale-space drift (which BASELINE.md already
attributes separately).  Device detect() on CPU uses exact reductions, so
approx_max_k recall is not a factor here (recorded separately: recall 0.95
adds ~0.04 Hamming bits, BASELINE.md round-3 table).

Usage: python tools/nms_bisect.py [scene ...]   (default: all 5 classes)
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.detect import detect
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics, stack_levels
from akaze_tpu.golden import akaze as golden
from akaze_tpu.utils.synthetic import SCENE_CLASSES

H, W = 480, 640
SEED = 3


def golden_side(name):
    path = f"/tmp/nms_bisect_{name}_{SEED}.pkl"
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    img = SCENE_CLASSES[name](H, W, seed=SEED)
    cfg = AkazeConfig()
    evs = golden.create_nonlinear_scale_space(img, cfg)
    golden.detector_response(evs, cfg)
    kept = golden.find_scale_space_extrema(evs, cfg)
    out = dict(
        ldet=[np.asarray(ev.Ldet) for ev in evs],
        kx=np.array([k.x for k in kept], np.float32),
        ky=np.array([k.y for k in kept], np.float32),
        klvl=np.array([k.class_id for k in kept], np.int32),
        kresp=np.array([k.response for k in kept], np.float32),
    )
    with open(path, "wb") as f:
        pickle.dump(out, f)
    return out


def device_side(ldet_levels, statics, per_level_candidates=None, max_kp=None):
    cfg = statics.config
    if per_level_candidates or max_kp:
        cfg = dataclasses.replace(
            cfg,
            per_level_candidates=per_level_candidates or cfg.per_level_candidates,
            max_keypoints=max_kp or cfg.max_keypoints,
        )
        statics = ScaleSpaceStatics(statics.w0, statics.h0, cfg)
    stack = stack_levels([jnp.asarray(l) for l in ldet_levels], statics.specs,
                         fill=-3.0e38)
    kps = jax.jit(lambda ld: detect(ld, statics))(stack)
    v = np.asarray(kps.valid)
    return dict(
        x=np.asarray(kps.x)[v], y=np.asarray(kps.y)[v],
        lvl=np.asarray(kps.class_id)[v], resp=np.asarray(kps.response)[v],
    )


def pair_misses(gold, dev, tol=0.75):
    """Golden keypoints with no same/adjacent-level device keypoint within
    tol px (level-aware, like tools/parity_spot)."""
    miss = []
    for i in range(len(gold["kx"])):
        d2 = (dev["x"] - gold["kx"][i]) ** 2 + (dev["y"] - gold["ky"][i]) ** 2
        near = (d2 < tol * tol) & (np.abs(dev["lvl"] - gold["klvl"][i]) <= 1)
        if not near.any():
            miss.append(i)
    return miss


def candidates_per_level(ldet_levels, statics):
    cfg = statics.config
    out = []
    for l, ld in enumerate(ldet_levels):
        b = statics.specs[l].border
        h, w = ld.shape
        if h - 2 * b <= 0 or w - 2 * b <= 0:
            out.append(np.zeros((0, 3), np.float32))
            continue
        interior = ld[b:-b, b:-b]
        nmax = golden._neighbor_max_3x3(ld)[b:-b, b:-b]
        cand = (interior > cfg.detector_threshold) & (interior > nmax)
        ys, xs = np.nonzero(cand)
        out.append(
            np.stack([ys + b, xs + b, interior[cand]], axis=1)
        )
    return out


def main():
    scenes = sys.argv[1:] or list(SCENE_CLASSES)
    cfg = AkazeConfig()
    statics = ScaleSpaceStatics(W, H, cfg)
    ratios = np.asarray(statics.ratios)
    print(f"| scene | golden kps | missed | cap | topm | chain | beaten | other |")
    print(f"|---|---|---|---|---|---|---|---|")
    for name in scenes:
        g = golden_side(name)
        cands = candidates_per_level(g["ldet"], statics)
        K = cfg.per_level_candidates
        # response rank of each candidate within its level
        cap_cut = []
        for l, c in enumerate(cands):
            if len(c) > K:
                thr = np.partition(c[:, 2], len(c) - K)[len(c) - K]
                cap_cut.append(thr)
            else:
                cap_cut.append(-np.inf)
        dev = device_side(g["ldet"], statics)
        dev_unc = device_side(
            g["ldet"], statics, per_level_candidates=4096, max_kp=8192
        )
        miss = pair_misses(g, dev)
        n_cap = n_topm = n_chain = n_beaten = n_other = 0
        # survivors (uncapped device) as a set for chain classification
        for i in miss:
            lvl = int(g["klvl"][i])
            # nearest candidate in that level to the golden keypoint's
            # UNREFINED position: golden x/y are refined; recover pixel by
            # rounding the refined position back to the level grid.
            xi = g["kx"][i] / ratios[lvl]
            yi = g["ky"][i] / ratios[lvl]
            c = cands[lvl]
            if len(c) == 0:
                n_other += 1
                continue
            d2 = (c[:, 1] - xi) ** 2 + (c[:, 0] - yi) ** 2
            j = int(np.argmin(d2))
            if d2[j] > 2.25:  # no candidate near: refinement moved it far
                n_other += 1
                continue
            resp = c[j, 2]
            if resp < cap_cut[lvl]:
                n_cap += 1
                continue
            # In the uncapped device output?
            gx = c[j, 1] * ratios[lvl]
            gy = c[j, 0] * ratios[lvl]
            d2u = (dev_unc["x"] - gx) ** 2 + (dev_unc["y"] - gy) ** 2
            if ((d2u < 2.25) & (np.abs(dev_unc["lvl"] - lvl) <= 1)).any():
                # survives without the caps -> lost to a cap downstream
                n_topm += 1
                continue
            # Suppressed by symmetric NMS: find the suppressor — any
            # candidate within the pair radius at lvl-1/lvl/lvl+1 beating
            # it.  chain if NO suppressor survives in dev_unc.
            size = statics.sizes
            sup_survives = False
            found_sup = False
            for dl in (-1, 0, 1):
                l2 = lvl + dl
                if not (0 <= l2 < len(cands)):
                    continue
                r = 0.5 * size[max(lvl, l2)]
                c2 = cands[l2]
                if len(c2) == 0:
                    continue
                qx = c2[:, 1] * ratios[l2]
                qy = c2[:, 0] * ratios[l2]
                close = (qx - gx) ** 2 + (qy - gy) ** 2 <= r * r
                beats = c2[:, 2] >= resp
                sup = close & beats
                # exclude the point itself
                if dl == 0:
                    sup[j] = False
                if sup.any():
                    found_sup = True
                    for jj in np.nonzero(sup)[0]:
                        d2s = (dev_unc["x"] - qx[jj]) ** 2 + (
                            dev_unc["y"] - qy[jj]
                        ) ** 2
                        if (
                            (d2s < 2.25)
                            & (np.abs(dev_unc["lvl"] - l2) <= 1)
                        ).any():
                            sup_survives = True
            if found_sup and not sup_survives:
                n_chain += 1
            elif found_sup:
                n_beaten += 1
            else:
                n_other += 1
        print(
            f"| {name} | {len(g['kx'])} | {len(miss)} | {n_cap} | {n_topm} "
            f"| {n_chain} | {n_beaten} | {n_other} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
