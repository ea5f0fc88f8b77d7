"""Image + feature-file IO for the CLI tools.

The reference CLI loads images via the `image` crate and serializes features
as JSON (SURVEY.md §2 C13, §3.3).  Here: grayscale loaders for .npy/.npz,
binary PGM (own parser, no deps), and anything PIL can open if PIL exists;
features serialize as reference-style JSON or a versioned .npz schema
(SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

FEATURE_SCHEMA_VERSION = 1


def load_gray(path: str | pathlib.Path) -> np.ndarray:
    """Load a grayscale image as float32 (H, W) in [0, 1]."""
    path = pathlib.Path(path)
    suffix = path.suffix.lower()
    if suffix == ".npy":
        img = np.load(path)
    elif suffix == ".npz":
        with np.load(path) as z:
            img = z[z.files[0]]
    elif suffix in (".pgm", ".ppm"):
        img = _load_pnm(path)
    else:
        try:
            from PIL import Image  # optional dependency
        except ImportError as e:
            raise RuntimeError(
                f"cannot load {path}: install PIL or use .npy/.npz/.pgm"
            ) from e
        img = np.asarray(Image.open(path).convert("F"), np.float32) / 255.0
    img = np.asarray(img, np.float32)
    if img.ndim == 3:  # RGB -> luma
        img = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
    if img.max() > 1.5:  # 8/16-bit range
        img = img / (65535.0 if img.max() > 255.5 else 255.0)
    return np.ascontiguousarray(img, np.float32)


def _load_pnm(path: pathlib.Path) -> np.ndarray:
    data = path.read_bytes()
    parts = []
    i = 0
    # Parse header tokens (magic, dims, maxval), skipping comments.
    while len(parts) < 4:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        parts.append(data[i:j])
        i = j
    magic, w, h, maxval = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
    i += 1  # single whitespace after maxval
    if magic == b"P5":
        dtype = np.dtype(">u2") if maxval > 255 else np.uint8
        img = np.frombuffer(data, dtype, count=w * h, offset=i).reshape(h, w)
        return img.astype(np.float32) / maxval
    if magic == b"P2":
        vals = np.array(data[i:].split(), np.float32)[: w * h].reshape(h, w)
        return vals / maxval
    raise ValueError(f"unsupported PNM magic {magic!r} in {path}")


def features_to_dict(features) -> dict:
    """Host-side Features -> JSON-serializable dict (reference JSON shape)."""
    kps = features.keypoints.to_list()
    valid = np.asarray(features.keypoints.valid)
    desc = np.asarray(features.descriptors)[valid]
    return {
        "schema_version": FEATURE_SCHEMA_VERSION,
        "keypoints": kps,
        "descriptors": [d.tobytes().hex() for d in desc],
    }


def save_features(path: str | pathlib.Path, features) -> None:
    path = pathlib.Path(path)
    if path.suffix.lower() == ".npz":
        valid = np.asarray(features.keypoints.valid)
        kp = features.keypoints
        np.savez_compressed(
            path,
            schema_version=FEATURE_SCHEMA_VERSION,
            x=np.asarray(kp.x)[valid],
            y=np.asarray(kp.y)[valid],
            response=np.asarray(kp.response)[valid],
            size=np.asarray(kp.size)[valid],
            octave=np.asarray(kp.octave)[valid],
            class_id=np.asarray(kp.class_id)[valid],
            angle=np.asarray(kp.angle)[valid],
            descriptors=np.asarray(features.descriptors)[valid],
        )
    else:
        path.write_text(json.dumps(features_to_dict(features), indent=1))


def load_features(path: str | pathlib.Path) -> dict[str, np.ndarray]:
    """Load a saved feature file back into numpy arrays."""
    path = pathlib.Path(path)
    if path.suffix.lower() == ".npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    obj = json.loads(path.read_text())
    kps = obj["keypoints"]
    desc = np.array(
        [np.frombuffer(bytes.fromhex(h), np.uint32) for h in obj["descriptors"]]
    ).reshape(len(obj["descriptors"]), -1)
    out = {"descriptors": desc, "schema_version": np.int64(obj["schema_version"])}
    for field in ("x", "y", "response", "size", "octave", "class_id", "angle"):
        out[field] = np.array([k[field] for k in kps])
    return out
