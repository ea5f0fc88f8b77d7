"""Packed scale-space atlas layout: geometry, roundtrip, guard semantics."""

import jax.numpy as jnp
import numpy as np

from akaze_tpu.core.config import AkazeConfig
from akaze_tpu.frontend.atlas import (
    atlas_bytes_ratio, build_scale_space_atlas, pack_levels, pack_stack,
    plan_atlas, to_atlas_rows, unpack_level,
)
from akaze_tpu.frontend.scale_space import ScaleSpaceStatics

ST = ScaleSpaceStatics(640, 480, AkazeConfig())
LAYOUT = plan_atlas(ST)


def _stack(batch=()):
    rng = np.random.default_rng(0)
    s = np.zeros(batch + (ST.num_levels, ST.h0, ST.w0), np.float32)
    for l in range(ST.num_levels):
        h, w = int(ST.heights[l]), int(ST.widths[l])
        s[..., l, :h, :w] = rng.random(batch + (h, w), np.float32)
    return s


def test_levels_disjoint_and_sublane_aligned():
    for l in range(LAYOUT.num_levels):
        assert int(LAYOUT.y_off[l]) % 8 == 0
        end = int(LAYOUT.y_off[l]) + int(LAYOUT.heights[l])
        nxt = (
            int(LAYOUT.y_off[l + 1])
            if l + 1 < LAYOUT.num_levels
            else LAYOUT.total_rows
        )
        assert end < nxt  # >= 1 guard row between levels


def test_memory_win_matches_estimate():
    # BASELINE.md headroom: ~2.1x less HBM than the (L, H0, W0) stack.
    assert atlas_bytes_ratio(LAYOUT, ST.h0) > 2.0


def test_pack_unpack_roundtrip():
    stack = _stack()
    atlas = np.asarray(pack_stack(jnp.asarray(stack), LAYOUT))
    assert atlas.shape == (LAYOUT.total_rows, LAYOUT.width)
    for l in range(LAYOUT.num_levels):
        h, w = int(ST.heights[l]), int(ST.widths[l])
        np.testing.assert_array_equal(
            np.asarray(unpack_level(jnp.asarray(atlas), LAYOUT, l)),
            stack[l, :h, :w],
        )


def test_pack_batched():
    stack = _stack(batch=(2,))
    atlas = np.asarray(pack_stack(jnp.asarray(stack), LAYOUT))
    assert atlas.shape == (2, LAYOUT.total_rows, LAYOUT.width)
    np.testing.assert_array_equal(
        np.asarray(unpack_level(jnp.asarray(atlas), LAYOUT, 3)),
        stack[:, 3, : int(ST.heights[3]), : int(ST.widths[3])],
    )


def test_guard_rows_replicate_level_edge():
    stack = _stack()
    atlas = np.asarray(pack_stack(jnp.asarray(stack), LAYOUT))
    for l in range(LAYOUT.num_levels):
        h, w = int(ST.heights[l]), int(ST.widths[l])
        end = int(LAYOUT.y_off[l]) + h
        nxt = (
            int(LAYOUT.y_off[l + 1])
            if l + 1 < LAYOUT.num_levels
            else LAYOUT.total_rows
        )
        for gy in range(end, nxt):  # every guard row == level's last row
            np.testing.assert_array_equal(atlas[gy, :w], stack[l, h - 1, :w])


def test_pack_levels_matches_pack_stack():
    stack = _stack()
    levels = [
        jnp.asarray(stack[l, : int(ST.heights[l]), : int(ST.widths[l])])
        for l in range(ST.num_levels)
    ]
    np.testing.assert_array_equal(
        np.asarray(pack_levels(levels, LAYOUT)),
        np.asarray(pack_stack(jnp.asarray(stack), LAYOUT)),
    )


def test_build_scale_space_atlas_parity():
    # Atlas builder must reproduce the stacked builder level-for-level.
    from akaze_tpu.frontend.scale_space import build_scale_space
    from akaze_tpu.utils.synthetic import textured_scene

    st = ScaleSpaceStatics(96, 80, AkazeConfig())
    layout = plan_atlas(st)
    img = jnp.asarray(textured_scene(80, 96, seed=5))
    atl = build_scale_space_atlas(img, st)
    stk = build_scale_space(img, st)
    for name in ("Lt", "Lx", "Ly", "Ldet"):
        assert atl[name].shape == (layout.total_rows, layout.width)
        for l in range(st.num_levels):
            h, w = int(st.heights[l]), int(st.widths[l])
            np.testing.assert_array_equal(
                np.asarray(unpack_level(atl[name], layout, l)),
                np.asarray(stk[name][l, :h, :w]),
                err_msg=f"{name} level {l}",
            )


def test_atlas_score_fields_match_per_level():
    # One dense 3x3 pass over the packed atlas must reproduce the per-level
    # _dense_score_fields outputs at every candidate site.
    from akaze_tpu.frontend.atlas import atlas_score_fields, plan_interior_mask
    from akaze_tpu.frontend.scale_space import build_scale_space
    from akaze_tpu.kernels.fed_pallas import _dense_score_fields
    from akaze_tpu.utils.synthetic import textured_scene

    cfg = AkazeConfig(detector_threshold=1e-5)
    st = ScaleSpaceStatics(128, 96, cfg)
    assert (np.asarray(st.borders) >= 1).all()  # the exactness precondition
    layout = plan_atlas(st)
    img = jnp.asarray(textured_scene(96, 128, seed=9))
    ldet_stack = build_scale_space(img, st)["Ldet"]

    levels = [
        ldet_stack[l, : int(st.heights[l]), : int(st.widths[l])]
        for l in range(st.num_levels)
    ]
    mask = plan_interior_mask(layout, st.borders)
    a_score, a_ox, a_oy = (
        np.asarray(v)
        for v in atlas_score_fields(
            pack_levels(levels, layout), mask, cfg.detector_threshold
        )
    )

    total_cands = 0
    for l in range(st.num_levels):
        score, ox, oy = (
            np.asarray(v)
            for v in _dense_score_fields(
                levels[l], int(st.borders[l]), cfg.detector_threshold
            )
        )
        rows, cols = layout.level_slice(l)
        np.testing.assert_array_equal(a_score[rows, cols], score, err_msg=f"L{l}")
        cand = score > -1e38
        total_cands += int(cand.sum())
        np.testing.assert_array_equal(
            a_ox[rows, cols][cand], ox[cand], err_msg=f"L{l} ox"
        )
        np.testing.assert_array_equal(
            a_oy[rows, cols][cand], oy[cand], err_msg=f"L{l} oy"
        )
    assert total_cands > 0  # the scene actually produced candidates


def test_atlas_candidates_top_k():
    # Top-k over the packed plane must return exactly the k best candidate
    # sites with correct (level, y, x) decoding.
    from akaze_tpu.frontend.atlas import (
        atlas_candidates, atlas_score_fields, plan_interior_mask,
    )
    from akaze_tpu.frontend.scale_space import build_scale_space
    from akaze_tpu.utils.synthetic import textured_scene

    cfg = AkazeConfig(detector_threshold=1e-5)
    st = ScaleSpaceStatics(128, 96, cfg)
    layout = plan_atlas(st)
    img = jnp.asarray(textured_scene(96, 128, seed=9))
    ldet_stack = build_scale_space(img, st)["Ldet"]
    levels = [
        ldet_stack[l, : int(st.heights[l]), : int(st.widths[l])]
        for l in range(st.num_levels)
    ]
    atlas = pack_levels(levels, layout)
    mask = plan_interior_mask(layout, st.borders)
    score_plane, _, _ = atlas_score_fields(atlas, mask, cfg.detector_threshold)

    k = 64
    s, lv, y, x, valid = (
        np.asarray(v) for v in atlas_candidates(score_plane, layout, k)
    )
    # Oracle: gather every candidate site per level, sort by score desc.
    sites = []
    sp = np.asarray(score_plane)
    for l in range(st.num_levels):
        rows, cols = layout.level_slice(l)
        lvl_scores = sp[rows, cols]
        for yy, xx in zip(*np.nonzero(lvl_scores > -1e38)):
            sites.append((float(lvl_scores[yy, xx]), l, int(yy), int(xx)))
    sites.sort(key=lambda t: -t[0])
    n = min(k, len(sites))
    assert n > 0
    assert valid[:n].all() and not valid[n:].any()
    np.testing.assert_allclose(s[:n], [t[0] for t in sites[:n]], rtol=0)
    got = {(int(a), int(b), int(c)) for a, b, c in zip(lv[:n], y[:n], x[:n])}
    want = {(t[1], t[2], t[3]) for t in sites[:n]}
    assert got == want


def test_atlas_detect_path_vmaps():
    # The batch-first pipeline will vmap these; they must trace cleanly and
    # agree with the single-frame path.
    import jax

    from akaze_tpu.frontend.atlas import (
        atlas_candidates, atlas_score_fields, plan_interior_mask,
    )

    cfg = AkazeConfig(detector_threshold=1e-5)
    st = ScaleSpaceStatics(128, 96, cfg)
    layout = plan_atlas(st)
    mask = plan_interior_mask(layout, st.borders)
    rng = np.random.default_rng(4)
    atl = jnp.asarray(
        rng.random((3, layout.total_rows, layout.width), np.float32)
    )

    def one(a):
        score, ox, oy = atlas_score_fields(a, mask, cfg.detector_threshold)
        s, lv, y, x, valid = atlas_candidates(score, layout, 32)
        return s, lv, y, x, valid

    batched = jax.jit(jax.vmap(one))(atl)
    for b in range(3):
        single = one(atl[b])
        for got, want in zip(batched, single):
            np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(want))


def test_atlas_extract_patches_matches_stack_slices():
    from akaze_tpu.frontend.atlas import atlas_extract_patches

    ph = pw = 24
    cfg = AkazeConfig()
    st = ScaleSpaceStatics(128, 96, cfg)
    layout = plan_atlas(st, tail_rows=ph)
    rng = np.random.default_rng(11)
    stack3 = np.zeros((3, st.num_levels, st.h0, st.w0), np.float32)
    for l in range(st.num_levels):
        h, w = int(st.heights[l]), int(st.widths[l])
        stack3[:, l, :h, :w] = rng.random((3, h, w), np.float32)
    planes = jnp.stack(
        [pack_stack(jnp.asarray(stack3[c]), layout) for c in range(3)]
    )

    # Random in-level origins incl. the extreme (h-ph, w-pw) corner of the
    # LAST level (exercises tail_rows: the window must not clamp).
    lvls, y0s, x0s = [], [], []
    for l in list(range(st.num_levels)) + [st.num_levels - 1]:
        h, w = int(st.heights[l]), int(st.widths[l])
        assert h >= ph and w >= pw
        lvls.append(l)
        if len(lvls) <= st.num_levels:
            y0s.append(int(rng.integers(0, h - ph + 1)))
            x0s.append(int(rng.integers(0, w - pw + 1)))
        else:
            y0s.append(h - ph)
            x0s.append(w - pw)
    got = np.asarray(
        atlas_extract_patches(
            planes, layout,
            jnp.asarray(lvls, jnp.int32), jnp.asarray(y0s, jnp.int32),
            jnp.asarray(x0s, jnp.int32), ph, pw,
        )
    )
    for i, (l, y0, x0) in enumerate(zip(lvls, y0s, x0s)):
        np.testing.assert_array_equal(
            got[i], stack3[:, l, y0 : y0 + ph, x0 : x0 + pw], err_msg=f"kp {i}"
        )


def test_atlas_extract_patches_oversized_window_slop():
    # A window taller than its level (origin clamps to 0 in the describe
    # stage) reads guard slop past the level's rows; the IN-LEVEL region
    # must still match the stack, since only it is ever consumed.
    from akaze_tpu.frontend.atlas import atlas_extract_patches

    ph = pw = 64
    cfg = AkazeConfig()
    st = ScaleSpaceStatics(128, 96, cfg)
    layout = plan_atlas(st, tail_rows=ph)
    l = st.num_levels - 1  # deepest level: 48 rows < ph
    h, w = int(st.heights[l]), int(st.widths[l])
    assert h < ph and w >= pw
    rng = np.random.default_rng(12)
    stack3 = np.zeros((3, st.num_levels, st.h0, st.w0), np.float32)
    stack3[:, l, :h, :w] = rng.random((3, h, w), np.float32)
    planes = jnp.stack(
        [pack_stack(jnp.asarray(stack3[c]), layout) for c in range(3)]
    )
    got = np.asarray(
        atlas_extract_patches(
            planes, layout,
            jnp.asarray([l], jnp.int32), jnp.asarray([0], jnp.int32),
            jnp.asarray([0], jnp.int32), ph, pw,
        )
    )[0]
    np.testing.assert_array_equal(got[:, :h, :pw], stack3[:, l, :h, :pw])


def test_borders_at_least_one_across_configs():
    # Exactness precondition of the single-pass atlas detect scoring: every
    # level's detection border >= 1, so no candidate's 3x3/stencil
    # neighborhood crosses a level boundary (see atlas_score_fields).
    for w, h in [(640, 480), (1241, 376), (128, 96), (320, 240)]:
        for octaves in (2, 4):
            st = ScaleSpaceStatics(w, h, AkazeConfig(num_octaves=octaves))
            assert (np.asarray(st.borders) >= 1).all(), (w, h, octaves)


def test_to_atlas_rows_vectorized():
    levels = jnp.asarray([0, 3, 7, 15])
    ys = jnp.asarray([0, 1, 5, 2])
    got = np.asarray(to_atlas_rows(LAYOUT, levels, ys))
    want = LAYOUT.y_off[np.asarray(levels)] + np.asarray(ys)
    np.testing.assert_array_equal(got, want)
