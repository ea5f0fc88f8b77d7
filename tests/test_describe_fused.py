"""Parity tests for the fused chunk-batched describe kernel
(kernels/describe_fused.py) against the chunked XLA describe path.

The kernel's sampling is exact one-hot selection, so keypoint sample values
are identical to the XLA path; residual descriptor differences come from
f32 accumulation order in the cell-mean contractions and the in-kernel
atan2 polynomial (~1e-7 rad), both bounded here.  Runs in Pallas interpret
mode on the CPU test mesh (the TPU pipeline runs the same kernel compiled).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.describe import describe
from akaze_tpu.frontend.detect import detect
from akaze_tpu.frontend.pipeline import _statics
from akaze_tpu.frontend.scale_space import build_scale_space
from akaze_tpu.kernels.describe_fused import describe_fused
from akaze_tpu.utils.synthetic import video_sequence


def _hamming(a, b):
    return np.unpackbits((a ^ b).view(np.uint8), axis=-1).sum(-1)


@pytest.fixture(scope="module")
def pipeline_pair():
    cfg = AkazeConfig()
    ss, ds = _statics(320, 240, cfg)
    frames = video_sequence(2, 240, 320, seed=3)
    stacks, kps, feats = [], [], []
    for f in frames:
        st = build_scale_space(jnp.asarray(f, jnp.float32), ss)
        kp = detect(st["Ldet"], ss)
        stacks.append(st)
        kps.append(kp)
        feats.append(describe(kp, st, ss, ds))
    return cfg, ss, ds, stacks, kps, feats


def test_fused_matches_xla_single_frame(pipeline_pair):
    _, ss, ds, stacks, kps, feats = pipeline_pair
    kb = jax.tree.map(lambda a: a[None], kps[0])
    ang, desc = describe_fused(kb, stacks[0], ss, ds, interpret=True)
    v = np.asarray(kps[0].valid)
    assert v.sum() > 50
    a_ref = np.asarray(feats[0].keypoints.angle)[v]
    a_new = np.asarray(ang[0])[v]
    # atan2 polynomial bound (wrap-around at 2pi allowed)
    d_ang = np.abs(a_ref - a_new)
    d_ang = np.minimum(d_ang, 2 * np.pi - d_ang)
    assert d_ang.max() < 1e-5
    ham = _hamming(np.asarray(feats[0].descriptors)[v], np.asarray(desc[0])[v])
    assert ham.mean() <= 3.0 and ham.max() <= 12

    # Invalid slots are exactly zeroed.
    iv = ~v
    assert (np.asarray(desc[0])[iv] == 0).all()
    assert (np.asarray(ang[0])[iv] == 0).all()


def test_fused_batched_frames(pipeline_pair):
    """Two frames with different detection counts exercise the per-frame
    validity prefixes, live sub-group counts and the frame-index DMA path."""
    _, ss, ds, stacks, kps, feats = pipeline_pair
    kb = jax.tree.map(lambda *xs: jnp.stack(xs), *kps)
    st = {
        k: jnp.stack([stacks[0][k], stacks[1][k]])
        for k in ("Lt", "Lx", "Ly")
    }
    ang, desc = describe_fused(kb, st, ss, ds, interpret=True)
    for b in range(2):
        v = np.asarray(kps[b].valid)
        ham = _hamming(
            np.asarray(feats[b].descriptors)[v], np.asarray(desc[b])[v]
        )
        assert ham.mean() <= 3.0 and ham.max() <= 12
        d_ang = np.abs(
            np.asarray(feats[b].keypoints.angle)[v] - np.asarray(ang[b])[v]
        )
        d_ang = np.minimum(d_ang, 2 * np.pi - d_ang)
        assert d_ang.max() < 1e-5
        assert (np.asarray(desc[b])[~v] == 0).all()


def test_fused_validity_holes(pipeline_pair):
    """Mid-prefix invalid slots (detect() rejects sub-pixel fits in place
    without compacting) must not strand trailing VALID keypoints: with >= 8
    holes inside one 64-keypoint program a sum-based live count would skip
    their sub-groups, emitting zero descriptors still flagged valid and
    leaking their prefetch-DMA semaphores (round-3 advisor high finding)."""
    _, ss, ds, stacks, kps, _ = pipeline_pair
    v = np.asarray(kps[0].valid)
    n_valid = int(v.sum())
    assert n_valid > 30
    # Punch 10 holes into the valid prefix of the FIRST 64-kp program; the
    # dense run [8..18) guarantees >= 8 rejections inside one program.
    holes = [3, 5] + list(range(8, 16))
    holes = [h for h in holes if h < n_valid - 4]
    v_holed = v.copy()
    v_holed[holes] = False
    kp_holed = dataclasses.replace(kps[0], valid=jnp.asarray(v_holed))

    kb_full = jax.tree.map(lambda a: a[None], kps[0])
    kb_holed = jax.tree.map(lambda a: a[None], kp_holed)
    ang_f, desc_f = describe_fused(kb_full, stacks[0], ss, ds, interpret=True)
    ang_h, desc_h = describe_fused(kb_holed, stacks[0], ss, ds, interpret=True)

    # Trailing valid keypoints (indices past every hole) must be bit-equal
    # to the no-hole run — in particular NOT zero-filled.
    tail = v_holed.copy()
    tail[: max(holes) + 1] = False
    assert tail.sum() >= 8, "need trailing valid keypoints past the holes"
    np.testing.assert_array_equal(
        np.asarray(desc_h[0])[tail], np.asarray(desc_f[0])[tail]
    )
    np.testing.assert_array_equal(
        np.asarray(ang_h[0])[tail], np.asarray(ang_f[0])[tail]
    )
    assert (np.asarray(desc_h[0])[tail] != 0).any(axis=-1).all(), (
        "trailing valid keypoints got zero descriptors (coverage hole)"
    )
    # Holes themselves are zeroed like any invalid slot.
    assert (np.asarray(desc_h[0])[holes] == 0).all()


def test_fused_level_major_layout(pipeline_pair):
    """The level-major (L, B, H0, W0) stack layout the batched TPU builder
    emits reads bit-identically to the batch-major layout."""
    _, ss, ds, stacks, kps, _ = pipeline_pair
    kb = jax.tree.map(lambda *xs: jnp.stack(xs), *kps)
    st_bm = {k: jnp.stack([stacks[0][k], stacks[1][k]]) for k in ("Lt", "Lx", "Ly")}
    st_lm = {k: jnp.swapaxes(v, 0, 1) for k, v in st_bm.items()}
    st_lm["level_major"] = True
    a0, d0 = describe_fused(kb, st_bm, ss, ds, interpret=True)
    a1, d1 = describe_fused(kb, st_lm, ss, ds, interpret=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
