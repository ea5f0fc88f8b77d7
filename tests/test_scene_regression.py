"""Adversarial-scene regression + parity (VERDICT round-1 item 6).

The reference regression-tests on checked-in road frames (SURVEY.md §2
C15); this environment has no image assets, so the suite covers the scene
classes AKAZE is actually designed for — rotation-dominant warps,
low-texture, repetitive grids, illumination ramps — via deterministic
generators (utils/synthetic.SCENE_CLASSES):

  * golden model vs checked-in snapshot: EXACT equality per scene class
    (snapshot regenerated consciously: tests/data/golden_scene_snapshots.npz,
    created 2026-08-17 from the frozen golden model at 180x240 seed 3);
  * jitted TPU path vs golden: tolerant parity gates per scene class —
    re-gating the parallel-NMS reformulation on content where suppressed
    chains concentrate (repetitive grids) and where detections are sparse
    and threshold-marginal (low texture).
"""

import pathlib

import numpy as np
import pytest

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.pipeline import extract
from akaze_tpu.golden import akaze as golden
from akaze_tpu.utils.synthetic import SCENE_CLASSES

_SNAPSHOT = pathlib.Path(__file__).parent / "data" / "golden_scene_snapshots.npz"
_SCENES = sorted(SCENE_CLASSES)


def _scene(name):
    with np.load(_SNAPSHOT) as z:
        shape = tuple(int(v) for v in z["image_shape"])
        seed = int(z["seed"])
        snap = {
            "x": z[f"{name}_x"], "y": z[f"{name}_y"],
            "angle": z[f"{name}_angle"], "class_id": z[f"{name}_class_id"],
            "descriptors": z[f"{name}_descriptors"],
        }
    img = SCENE_CLASSES[name](*shape, seed=seed)
    return img, snap


@pytest.mark.parametrize("name", _SCENES)
def test_golden_scene_snapshot_exact(name):
    img, snap = _scene(name)
    res = golden.extract(img)
    assert len(res.keypoints) == len(snap["x"])
    np.testing.assert_array_equal(
        np.array([k.x for k in res.keypoints], np.float32), snap["x"]
    )
    np.testing.assert_array_equal(
        np.array([k.y for k in res.keypoints], np.float32), snap["y"]
    )
    np.testing.assert_array_equal(
        np.array([k.angle for k in res.keypoints], np.float32), snap["angle"]
    )
    np.testing.assert_array_equal(res.descriptors, snap["descriptors"])


@pytest.mark.parametrize("name", _SCENES)
def test_tpu_parity_per_scene(name):
    """Tolerant parity of the jitted path against the per-scene snapshot:
    >= 90% of keypoints within 0.5 px both ways, descriptor median <= 4 bits
    on matched keypoints (SURVEY.md §7.3 gates), count within 10%."""
    img, snap = _scene(name)
    feats = extract(img, AkazeConfig())
    valid = np.asarray(feats.keypoints.valid)
    n_tpu = int(valid.sum())
    n_gold = len(snap["x"])
    assert abs(n_tpu - n_gold) <= max(2, 0.1 * n_gold), (n_tpu, n_gold)
    if n_gold == 0:
        return
    tx = np.asarray(feats.keypoints.x)[valid]
    ty = np.asarray(feats.keypoints.y)[valid]
    d2 = (tx[:, None] - snap["x"][None, :]) ** 2
    d2 += (ty[:, None] - snap["y"][None, :]) ** 2
    assert (np.sqrt(d2.min(1)) < 0.5).mean() >= 0.9, name
    assert (np.sqrt(d2.min(0)) < 0.5).mean() >= 0.9, name
    # Descriptor parity on position-matched keypoints.
    nn = d2.argmin(1)
    ok = np.sqrt(d2.min(1)) < 0.5
    td = np.asarray(feats.descriptors)[valid][ok]
    gold_words = np.zeros((n_gold, td.shape[1]), np.uint32)
    packed = np.pad(
        snap["descriptors"], ((0, 0), (0, td.shape[1] * 4 - snap["descriptors"].shape[1]))
    )
    gold_words = packed.view("<u4")
    ham = np.bitwise_count(gold_words[nn[ok]] ^ td).sum(1)
    assert np.median(ham) <= 4, (name, np.median(ham))
