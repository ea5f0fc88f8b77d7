"""Pallas fused describe kernel vs the XLA path (interpret mode on CPU).

On real TPU hardware the kernel's transcendentals (in-kernel atan2/cos/sin)
can round differently from XLA's, flipping ~1 bit/keypoint; in interpret
mode the arithmetic is identical and parity is near-exact.  Golden-model
parity (test_frontend_parity) remains the semantic gate for both paths.
"""

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.describe import DescribeStatics, describe
from akaze_tpu.frontend.detect import detect
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics, build_scale_space
from akaze_tpu.kernels.describe_pallas import describe_pallas
from akaze_tpu.utils.synthetic import textured_scene


def _features(img, cfg):
    st = ScaleSpaceStatics(img.shape[1], img.shape[0], cfg)
    dst = DescribeStatics(cfg, st)
    stacks = jax.jit(lambda im: build_scale_space(im, st))(jnp.asarray(img))
    kps = jax.jit(lambda ld: detect(ld, st))(stacks["Ldet"])
    return st, dst, stacks, kps


def test_pallas_describe_matches_xla(small_image):
    cfg = AkazeConfig(max_keypoints=64)
    st, dst, stacks, kps = _features(small_image, cfg)
    feats = describe(kps, stacks, st, dst)
    angles_p, desc_p = describe_pallas(kps, stacks, st, dst, interpret=True)
    valid = np.asarray(kps.valid)
    assert valid.sum() > 10
    da = np.abs(np.asarray(feats.keypoints.angle) - np.asarray(angles_p))[valid]
    assert da.max() < 1e-5  # in-kernel atan2 poly vs XLA atan2
    dd = np.asarray(feats.descriptors)[valid] ^ np.asarray(desc_p)[valid]
    ham = np.bitwise_count(dd).sum(axis=1)
    assert np.median(ham) == 0
    assert ham.max() <= 4


def test_pallas_invalid_slots_zero(small_image):
    cfg = AkazeConfig(max_keypoints=64)
    st, dst, stacks, kps = _features(small_image, cfg)
    _, desc_p = describe_pallas(kps, stacks, st, dst, interpret=True)
    invalid = ~np.asarray(kps.valid)
    assert (np.asarray(desc_p)[invalid] == 0).all()


def test_pallas_backend_dispatch(small_image):
    cfg = AkazeConfig(max_keypoints=64)
    st, dst, stacks, kps = _features(small_image, cfg)
    import akaze_tpu.kernels.describe_pallas as dp

    orig = dp.describe_pallas
    dp.describe_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        feats = describe(kps, stacks, st, dst, backend="pallas")
    finally:
        dp.describe_pallas = orig
    valid = np.asarray(kps.valid)
    assert np.asarray(feats.descriptors)[valid].any()
