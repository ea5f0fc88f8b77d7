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


def test_with_detect_matches_detect_pallas():
    """Fused-into-build detect fields == the standalone Pallas detect pass.

    Scores must agree exactly everywhere (interior-masked, sentinel
    elsewhere); ox/oy are compared at candidate sites only — candidates are
    strictly interior (border >= 1) so both layouts see identical 3x3
    neighborhoods there, while non-candidate boundary pixels legitimately
    differ (padded-stack vs native-resolution edge replication)."""
    from akaze_tpu.kernels.detect_pallas import detect_scores_pallas

    cfg = AkazeConfig()
    imgs = np.stack(
        [textured_scene(96, 128, seed=s) for s in (2, 3)]
    ).astype(np.float32)
    st = ScaleSpaceStatics(128, 96, cfg)
    from akaze_tpu.frontend.scale_space import build_scale_space, stack_levels
    from akaze_tpu.kernels.fed_pallas import octave_groups

    with pltpu.force_tpu_interpret_mode():
        full = jax.jit(
            lambda im: build_scale_space_pallas_batched(im, st, with_detect=True)
        )(jnp.asarray(imgs))
        ldet = jax.jit(
            lambda im: build_scale_space_pallas_batched(im, st)
        )(jnp.asarray(imgs))["Ldet"]
        scores, ox, oy = detect_scores_pallas(ldet, st)

    def restack(key, fill):
        # Round 3: the builder emits per-octave native-resolution products;
        # pad+stack them here only for the comparison.
        levels = []
        for (l0, n, _, _), prod in zip(octave_groups(st), full["oct"]):
            for i in range(n):
                levels.append(prod[key][i])  # level-major (n, B, h, w)
        return stack_levels(levels, st.specs, fill=fill)

    np.testing.assert_allclose(
        np.asarray(restack("score", -3.0e38)), np.asarray(scores),
        atol=2e-6, rtol=1e-6,
    )
    cand = np.asarray(scores) > -1e38
    assert cand.sum() > 10  # the scene must actually produce candidates
    ox_ref, oy_ref = np.asarray(ox), np.asarray(oy)
    # The builder's field is the PACKED int32 form (round 4): unpack and
    # compare at the 1/16000-px quantization tolerance; NaN in the
    # reference corresponds to a rejected (keep=False) packed slot.
    from akaze_tpu.kernels.fed_pallas import unpack_sub

    packed = np.asarray(restack("sub", -1)).astype(np.int32)
    ox_got, oy_got, keep = jax.tree.map(
        np.asarray, unpack_sub(jnp.asarray(packed))
    )
    ref_keep = ~np.isnan(ox_ref)
    np.testing.assert_array_equal(keep[cand], ref_keep[cand])
    both = cand & keep
    np.testing.assert_allclose(ox_got[both], ox_ref[both], atol=1e-4)
    np.testing.assert_allclose(oy_got[both], oy_ref[both], atol=1e-4)
