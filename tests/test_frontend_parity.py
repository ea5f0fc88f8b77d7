"""Parity gates: jitted TPU front-end vs the frozen NumPy golden oracle
(SURVEY.md §7.2 step 2 / §7.3 "bitwise-tolerant parity").

Gates are tolerant by design: the TPU extrema pass is a parallel NMS
reformulation of the reference's sequential de-dup (SURVEY.md §7.3), and f32
accumulation order differs, so we gate on match fractions and bit distances
rather than exact equality.
"""

import numpy as np
import pytest

from akaze_tpu.core.config import AkazeConfig, Diffusivity
from akaze_tpu.frontend.pipeline import extract, extract_batch
from akaze_tpu.golden import akaze as golden
from akaze_tpu.utils.synthetic import textured_scene


def _match_stats(gres, tfeat):
    valid = np.asarray(tfeat.keypoints.valid)
    tx = np.asarray(tfeat.keypoints.x)[valid]
    ty = np.asarray(tfeat.keypoints.y)[valid]
    tl = np.asarray(tfeat.keypoints.class_id)[valid]
    td = np.asarray(tfeat.descriptors)[valid]
    ta = np.asarray(tfeat.keypoints.angle)[valid]
    gx = np.array([k.x for k in gres.keypoints])
    gy = np.array([k.y for k in gres.keypoints])
    gl = np.array([k.class_id for k in gres.keypoints])
    ga = np.array([k.angle for k in gres.keypoints])
    d2 = (tx[:, None] - gx[None, :]) ** 2 + (ty[:, None] - gy[None, :]) ** 2
    # Pair within the SAME evolution level: distinct extrema from adjacent
    # levels can coincide in (x, y) (dense repetitive content) and a
    # position-only NN pairs unrelated keypoints, reading as fake
    # descriptor drift (round-3 bisect of the round-2 "3.9-4.4 bit" spot
    # check attributed most of it to exactly this artifact).
    d2 = np.where(tl[:, None] == gl[None, :], d2, np.inf)
    nn = d2.argmin(1)
    dmin = np.sqrt(d2.min(1))
    ok = dmin < 0.5
    ham = np.bitwise_count(gres.descriptors_u32[nn[ok]] ^ td[ok]).sum(1)
    angdiff = np.abs(((ta[ok] - ga[nn[ok]] + np.pi) % (2 * np.pi)) - np.pi)
    return dict(
        n_gold=len(gres.keypoints),
        n_tpu=int(valid.sum()),
        frac_pos=float(ok.mean()),
        frac_covered=float((np.sqrt(d2.min(0)) < 0.5).mean()),
        ham=ham,
        angdiff=angdiff,
    )


@pytest.fixture(scope="module")
def parity(small_image):
    cfg = AkazeConfig()
    gres = golden.extract(small_image, cfg)
    tfeat = extract(small_image, cfg)
    return _match_stats(gres, tfeat)


def test_keypoint_count_parity(parity):
    assert parity["n_gold"] > 0
    assert abs(parity["n_tpu"] - parity["n_gold"]) <= max(2, 0.1 * parity["n_gold"])


def test_keypoint_position_parity(parity):
    # Round-5 floor raise (verdict item 6): the NMS bisect
    # (tools/nms_bisect.py, BASELINE.md round 5) attributes the
    # device-vs-golden selection differences to the per-level candidate
    # cap (config-documented) plus ~3-5% of genuine chain/replacement
    # NMS-semantics divergence — so 0.93 is the defensible floor for the
    # device->golden direction on textured content (measured 0.95-0.997).
    assert parity["frac_pos"] >= 0.93
    assert parity["frac_covered"] >= 0.9


def test_descriptor_parity(parity):
    # SURVEY.md §7.3 gate: <= a few bits of 486 on matched keypoints.
    # Round-3 tightening (verdict item 2): the CPU/XLA path measures
    # bit-exact (mean 0.00) and the full TPU pipeline measures mean <= 1.8
    # across the 5 adversarial scene classes at VGA (tools/parity_spot.py),
    # so the old median<=4/mean<=8 budget was slack, not drift.
    assert np.median(parity["ham"]) <= 1
    assert parity["ham"].mean() <= 2.5


def test_angle_parity(parity):
    assert np.median(parity["angdiff"]) < 0.05


@pytest.mark.parametrize("diff", [Diffusivity.PM_G1, Diffusivity.WEICKERT])
def test_conductivity_variants_parity(small_image, diff):
    """BASELINE.md config 3: g1/Weickert variants keep descriptor parity."""
    cfg = AkazeConfig(diffusivity=diff)
    gres = golden.extract(small_image, cfg)
    stats = _match_stats(gres, extract(small_image, cfg))
    assert stats["frac_pos"] >= 0.9  # round-5 raise; see position gate
    assert np.median(stats["ham"]) <= 1
    assert stats["ham"].mean() <= 2.5


def test_batch_matches_single(small_image):
    other = textured_scene(*small_image.shape, seed=11)
    batch = np.stack([small_image, other])
    feats = extract_batch(batch)
    single = extract(small_image)
    assert np.array_equal(
        np.asarray(feats.keypoints.valid)[0], np.asarray(single.keypoints.valid)
    )
    np.testing.assert_allclose(
        np.asarray(feats.keypoints.x)[0], np.asarray(single.keypoints.x), atol=1e-4
    )
    assert np.array_equal(np.asarray(feats.descriptors)[0], np.asarray(single.descriptors))
    # Second frame differs from the first.
    assert not np.array_equal(
        np.asarray(feats.descriptors)[1], np.asarray(feats.descriptors)[0]
    )


def test_extract_deterministic(small_image):
    a = extract(small_image)
    b = extract(small_image)
    assert np.array_equal(np.asarray(a.descriptors), np.asarray(b.descriptors))
    assert np.array_equal(np.asarray(a.keypoints.x), np.asarray(b.keypoints.x))


def test_describe_batched_matches_vmapped(small_image):
    """The chunk-skipping lax.map describe variant == the vmapped path."""
    import jax
    import jax.numpy as jnp

    from akaze_tpu.frontend.describe import (
        DescribeStatics, describe, describe_batched,
    )
    from akaze_tpu.frontend.detect import detect
    from akaze_tpu.frontend.scale_space import ScaleSpaceStatics, build_scale_space

    cfg = AkazeConfig(max_keypoints=64)
    st = ScaleSpaceStatics(small_image.shape[1], small_image.shape[0], cfg)
    dst = DescribeStatics(cfg, st)
    imgs = jnp.stack(
        [jnp.asarray(small_image), jnp.asarray(textured_scene(*small_image.shape, seed=9))]
    )
    stacks = jax.jit(lambda im: jax.vmap(lambda x: build_scale_space(x, st))(im))(imgs)
    kps = jax.jit(lambda ld: jax.vmap(lambda x: detect(x, st))(ld))(stacks["Ldet"])
    ref = jax.jit(
        lambda k, s: jax.vmap(lambda kk, ss: describe(kk, ss, st, dst))(k, s)
    )(kps, stacks)
    got = jax.jit(lambda k, s: describe_batched(k, s, st, dst))(kps, stacks)
    valid = np.asarray(kps.valid)
    assert np.array_equal(
        np.asarray(got.descriptors)[valid], np.asarray(ref.descriptors)[valid]
    )
    np.testing.assert_allclose(
        np.asarray(got.keypoints.angle)[valid],
        np.asarray(ref.keypoints.angle)[valid], atol=1e-6,
    )
