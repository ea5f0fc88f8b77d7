"""Fused Pallas scale-space kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from akaze_tpu.core.config import AkazeConfig, Diffusivity
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics, build_scale_space
from akaze_tpu.kernels.fed_pallas import build_scale_space_pallas_batched
from akaze_tpu.utils.synthetic import textured_scene


@pytest.mark.parametrize("diff", [Diffusivity.PM_G2, Diffusivity.WEICKERT])
def test_fed_pallas_matches_xla(diff):
    cfg = AkazeConfig(diffusivity=diff)
    imgs = np.stack(
        [textured_scene(96, 128, seed=s) for s in (0, 1)]
    ).astype(np.float32)
    st = ScaleSpaceStatics(128, 96, cfg)
    ref = jax.jit(lambda im: jax.vmap(lambda x: build_scale_space(x, st))(im))(
        jnp.asarray(imgs)
    )
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda im: build_scale_space_pallas_batched(im, st))(
            jnp.asarray(imgs)
        )
    lm = got.get("level_major", False)
    for key in ("Lt", "Lx", "Ly", "Ldet"):
        g = np.asarray(got[key])
        if lm and key in ("Lt", "Lx", "Ly"):
            g = np.moveaxis(g, 0, 1)  # level-major -> frame-major for compare
        np.testing.assert_allclose(
            g, np.asarray(ref[key]), atol=2e-5,
            err_msg=key,
        )


def test_with_detect_matches_xla_score_fields():
    """Fused-into-build detect fields == the XLA `_dense_score_fields`
    construction on the same native-resolution Ldet planes.

    (Round 5: this cross-check previously ran against the standalone
    kernels/detect_pallas pass, deleted per the wired-and-winning-or-gone
    rule — production detect fields moved in-kernel in round 3, leaving it
    unwired.  The XLA construction is the surviving second implementation.)

    Scores must agree to f32 tolerance everywhere (interior-masked,
    sentinel elsewhere); the packed sub-pixel fields are unpacked and
    compared at candidate sites only — candidates are strictly interior
    (border >= 1), so both constructions see identical 3x3 neighborhoods
    there."""
    cfg = AkazeConfig()
    imgs = np.stack(
        [textured_scene(96, 128, seed=s) for s in (2, 3)]
    ).astype(np.float32)
    st = ScaleSpaceStatics(128, 96, cfg)
    from akaze_tpu.kernels.fed_pallas import (
        _dense_score_fields, octave_groups, unpack_sub,
    )

    with pltpu.force_tpu_interpret_mode():
        full = jax.jit(
            lambda im: build_scale_space_pallas_batched(im, st, with_detect=True)
        )(jnp.asarray(imgs))
        nodet = jax.jit(
            lambda im: build_scale_space_pallas_batched(im, st)
        )(jnp.asarray(imgs))["Ldet"]  # padded (B, L, H0, W0) stack

    thr = float(cfg.detector_threshold)
    checked_cands = 0
    for (l0, n, h, w), prod in zip(octave_groups(st), full["oct"]):
        for i in range(n):
            spec = st.specs[l0 + i]
            # Native-resolution Ldet slice for this level, from the
            # no-detect builder (whose Ldet stack is parity-tested vs the
            # XLA scale space in test_fed_pallas_matches_xla).
            ldet_l = nodet[:, l0 + i, :h, :w]
            score_ref, sub_ref = jax.jit(
                lambda x, b=int(spec.border): _dense_score_fields(x, b, thr)
            )(ldet_l)
            score_got = np.asarray(prod["score"][i])  # (B, h, w)
            np.testing.assert_allclose(
                score_got, np.asarray(score_ref), atol=2e-6, rtol=1e-6,
                err_msg=f"level {l0 + i} score",
            )
            cand = score_got > -1e38
            checked_cands += int(cand.sum())
            ox_r, oy_r, keep_r = jax.tree.map(np.asarray, unpack_sub(sub_ref))
            ox_g, oy_g, keep_g = jax.tree.map(
                np.asarray, unpack_sub(prod["sub"][i])
            )
            np.testing.assert_array_equal(keep_g[cand], keep_r[cand])
            both = cand & keep_g
            np.testing.assert_allclose(ox_g[both], ox_r[both], atol=1e-4)
            np.testing.assert_allclose(oy_g[both], oy_r[both], atol=1e-4)
    assert checked_cands > 10  # the scene must actually produce candidates
