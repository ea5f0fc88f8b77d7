"""Snapshot regression (reference test strategy, SURVEY.md §4): extraction
on a fixed synthetic frame must reproduce the checked-in snapshot.

The golden model is pure deterministic NumPy, so it is held to EXACT
equality — any drift means the behavioral spec changed and must be a
conscious decision (regenerate tests/data/golden_snapshot.npz and explain
why).  The jitted path is gated tolerantly against the same snapshot.
"""

import pathlib

import numpy as np

from akaze_tpu.frontend.pipeline import extract
from akaze_tpu.golden import akaze as golden
from akaze_tpu.utils.synthetic import textured_scene

_SNAPSHOT = pathlib.Path(__file__).parent / "data" / "golden_snapshot.npz"


def _load():
    with np.load(_SNAPSHOT) as z:
        snap = {k: z[k] for k in z.files}
    # Python ints, not np.int64: int64 scalars promote float32 arithmetic to
    # float64 inside textured_scene and change the image at the ulp level.
    snap["shape"] = tuple(int(v) for v in snap["image_shape"])
    return snap


def test_golden_matches_snapshot_exactly():
    snap = _load()
    img = textured_scene(*snap["shape"], seed=int(snap["seed"]))
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


def test_tpu_path_matches_snapshot_tolerantly():
    snap = _load()
    img = textured_scene(*snap["shape"], seed=int(snap["seed"]))
    feats = extract(img)
    valid = np.asarray(feats.keypoints.valid)
    tx = np.asarray(feats.keypoints.x)[valid]
    ty = np.asarray(feats.keypoints.y)[valid]
    d2 = (tx[:, None] - snap["x"][None, :]) ** 2 + (ty[:, None] - snap["y"][None, :]) ** 2
    dmin = np.sqrt(d2.min(1))
    assert (dmin < 0.5).mean() >= 0.9
    assert abs(int(valid.sum()) - len(snap["x"])) <= max(2, 0.1 * len(snap["x"]))
