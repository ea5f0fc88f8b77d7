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
    for key in ("Lt", "Lx", "Ly", "Ldet"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), atol=2e-5,
            err_msg=key,
        )
