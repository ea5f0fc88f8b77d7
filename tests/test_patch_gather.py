"""Pallas patch-gather kernel vs the XLA dynamic_slice path.

The kernel is pure data movement (aligned DMA + roll recentering), so parity
is bit-exact — both against a NumPy slice oracle and end-to-end through
describe_batched with the backend toggled (interpret mode on the CPU mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.describe import DescribeStatics, describe_batched
from akaze_tpu.frontend.detect import detect
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics, build_scale_space
from akaze_tpu.kernels.patch_pallas import gather_patches


def _oracle(stk, frame, lvl, y0, x0, valid, ph, pw):
    out = np.zeros((len(frame), 3, ph, pw), np.float32)
    arrs = [np.asarray(stk["Lt"]), np.asarray(stk["Lx"]), np.asarray(stk["Ly"])]
    for n in range(len(frame)):
        if not valid[n]:
            continue
        for c, a in enumerate(arrs):
            plane = a[frame[n]] if a.ndim == 4 else a
            out[n, c] = plane[lvl[n], y0[n] : y0[n] + ph, x0[n] : x0[n] + pw]
    return out


def _random_case(rng, F, L, H, W, N, ph, pw):
    stk = {
        k: jnp.asarray(rng.standard_normal((F, L, H, W)).astype(np.float32))
        for k in ("Lt", "Lx", "Ly")
    }
    frame = rng.integers(0, F, N)
    lvl = rng.integers(0, L, N)
    y0 = rng.integers(0, max(H - ph, 0) + 1, N)
    x0 = rng.integers(0, max(W - pw, 0) + 1, N)
    valid = rng.random(N) < 0.8
    # Force edge origins into the set (clamped-alignment paths).
    y0[:4] = [0, max(H - ph, 0), 1, max(H - ph - 1, 0)]
    x0[:4] = [0, max(W - pw, 0), 1, max(W - pw - 1, 0)]
    valid[:4] = True
    return stk, frame, lvl, y0, x0, valid


def _run(stk, frame, lvl, y0, x0, valid, ph, pw):
    got = gather_patches(
        stk,
        jnp.asarray(frame, jnp.int32),
        jnp.asarray(lvl, jnp.int32),
        jnp.asarray(y0, jnp.int32),
        jnp.asarray(x0, jnp.int32),
        jnp.asarray(valid),
        ph=ph,
        pw=pw,
        interpret=True,
    )
    want = _oracle(stk, frame, lvl, y0, x0, valid, ph, pw)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gather_matches_slice_aligned_planes():
    rng = np.random.default_rng(0)
    _run(*_random_case(rng, F=3, L=4, H=96, W=256, N=64, ph=40, pw=64), 40, 64)


def test_gather_matches_slice_odd_planes():
    """Unaligned plane sizes exercise the pad path (KITTI-style shapes)."""
    rng = np.random.default_rng(1)
    _run(*_random_case(rng, F=2, L=3, H=51, W=200, N=32, ph=24, pw=48), 24, 48)


def test_gather_level_major_stacks():
    """(L, F, H, W) level-major stacks (the copy-free batched-TPU layout)
    must gather byte-identically to the frame-major layout."""
    rng = np.random.default_rng(3)
    stk, frame, lvl, y0, x0, valid = _random_case(
        rng, F=3, L=4, H=96, W=256, N=64, ph=40, pw=64
    )
    want = _oracle(stk, frame, lvl, y0, x0, valid, 40, 64)
    stk_lm = {k: jnp.moveaxis(v, 0, 1) for k, v in stk.items()}
    stk_lm["level_major"] = True
    got = gather_patches(
        stk_lm,
        jnp.asarray(frame, jnp.int32),
        jnp.asarray(lvl, jnp.int32),
        jnp.asarray(y0, jnp.int32),
        jnp.asarray(x0, jnp.int32),
        jnp.asarray(valid),
        ph=40,
        pw=64,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gather_single_frame_stacks():
    rng = np.random.default_rng(2)
    stk4, frame, lvl, y0, x0, valid = _random_case(
        rng, F=1, L=4, H=64, W=256, N=32, ph=32, pw=64
    )
    stk3 = {k: v[0] for k, v in stk4.items()}
    _run(stk3, np.zeros_like(frame), lvl, y0, x0, valid, 32, 64)


def test_describe_batched_backend_parity(small_image):
    """End-to-end: describe_batched with pallas patches == xla patches,
    descriptors bit-exact and angles equal on valid slots."""
    cfg = AkazeConfig(max_keypoints=64)
    st = ScaleSpaceStatics(small_image.shape[1], small_image.shape[0], cfg)
    dst = DescribeStatics(cfg, st)
    imgs = jnp.stack([jnp.asarray(small_image)] * 2)
    stacks = jax.vmap(lambda im: build_scale_space(im, st))(imgs)
    kps = jax.vmap(lambda ld: detect(ld, st))(stacks["Ldet"])

    import akaze_tpu.frontend.describe as dmod

    results = {}
    for backend in ("xla", "pallas"):
        orig = dmod._patch_backend
        dmod._patch_backend = lambda b=backend: b
        try:
            results[backend] = describe_batched(kps, stacks, st, dst)
        finally:
            dmod._patch_backend = orig

    valid = np.asarray(kps.valid)
    assert valid.sum() > 10
    dx = np.asarray(results["xla"].descriptors)
    dp = np.asarray(results["pallas"].descriptors)
    np.testing.assert_array_equal(dp, dx)  # invalid slots masked to 0 in both
    ax = np.asarray(results["xla"].keypoints.angle)[valid]
    ap = np.asarray(results["pallas"].keypoints.angle)[valid]
    np.testing.assert_array_equal(ap, ax)
