"""Fused detect Pallas kernel vs the XLA construction (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.detect import (
    _NEG,
    _neighbor_max_3x3,
    detect,
    find_candidates,
    subpixel_refine,
)
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics, build_scale_space
from akaze_tpu.kernels.detect_pallas import detect_scores_pallas
from akaze_tpu.utils.synthetic import textured_scene


def _stacks(shapes=(96, 128), seeds=(0, 4)):
    cfg = AkazeConfig()
    imgs = np.stack([textured_scene(*shapes, seed=s) for s in seeds])
    st = ScaleSpaceStatics(shapes[1], shapes[0], cfg)
    stacks = jax.jit(
        lambda im: jax.vmap(lambda x: build_scale_space(x, st))(im)
    )(jnp.asarray(imgs))
    return cfg, st, stacks


def test_detect_scores_pallas_matches_xla():
    cfg, st, stacks = _stacks()
    ldet = stacks["Ldet"]
    nmax = _neighbor_max_3x3(ldet)
    cand = (
        (ldet > cfg.detector_threshold) & (ldet > nmax) & jnp.asarray(st.interior)
    )
    ref = jnp.where(cand, ldet, _NEG)
    with pltpu.force_tpu_interpret_mode():
        got, ox, oy = detect_scores_pallas(ldet, st)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert ox.shape == ldet.shape and oy.shape == ldet.shape


def test_batched_candidates_match_per_frame():
    """Per-octave tight-slice approx_max_k == padded-plane per-frame path."""
    from akaze_tpu.frontend.detect import find_candidates_batched

    _, st, stacks = _stacks()
    ldet = stacks["Ldet"]
    with pltpu.force_tpu_interpret_mode():
        scores, ox, oy = detect_scores_pallas(ldet, st)
    ref = jax.vmap(lambda l, s, a, b: detect(l, st, s, (a, b)))(
        ldet, scores, ox, oy
    )
    cand = find_candidates_batched(scores, st)
    got = jax.vmap(lambda l, a, b, c: detect(l, st, None, (a, b), c))(
        ldet, ox, oy, cand
    )
    v = np.asarray(ref.valid)
    assert np.array_equal(np.asarray(got.valid), v)
    np.testing.assert_allclose(np.asarray(got.x)[v], np.asarray(ref.x)[v], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.y)[v], np.asarray(ref.y)[v], atol=1e-5)


def test_detect_with_fields_matches_gather_path():
    """detect() fed the dense sub-pixel fields == the 9-gather XLA path."""
    _, st, stacks = _stacks()
    ldet = stacks["Ldet"]
    with pltpu.force_tpu_interpret_mode():
        scores, ox, oy = detect_scores_pallas(ldet, st)
    ref = jax.vmap(lambda l, s: detect(l, st, s))(ldet, scores)
    got = jax.vmap(lambda l, s, a, b: detect(l, st, s, (a, b)))(
        ldet, scores, ox, oy
    )
    assert np.array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(got.x)[v], np.asarray(ref.x)[v], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.y)[v], np.asarray(ref.y)[v], atol=1e-5
    )
    assert np.array_equal(np.asarray(got.class_id)[v], np.asarray(ref.class_id)[v])
