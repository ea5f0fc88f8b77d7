"""Fused detect-score Pallas kernel vs the XLA construction (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.detect import _NEG, _neighbor_max_3x3
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics, build_scale_space
from akaze_tpu.kernels.detect_pallas import detect_scores_pallas
from akaze_tpu.utils.synthetic import textured_scene


def test_detect_scores_pallas_matches_xla():
    cfg = AkazeConfig()
    imgs = np.stack([textured_scene(96, 128, seed=s) for s in (0, 4)])
    st = ScaleSpaceStatics(128, 96, cfg)
    stacks = jax.jit(
        lambda im: jax.vmap(lambda x: build_scale_space(x, st))(im)
    )(jnp.asarray(imgs))
    ldet = stacks["Ldet"]
    nmax = _neighbor_max_3x3(ldet)
    cand = (
        (ldet > cfg.detector_threshold) & (ldet > nmax) & jnp.asarray(st.interior)
    )
    ref = jnp.where(cand, ldet, _NEG)
    with pltpu.force_tpu_interpret_mode():
        got = detect_scores_pallas(ldet, st)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
