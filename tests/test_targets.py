"""Target rasterization tests vs a literal per-pixel numpy port of the
reference's compute_target_part_scoremap (pose_defaultdataset.py:220-266)."""

import numpy as np
import jax.numpy as jnp

from deepgraphpose_tpu.ops.targets import (
    gaussian_target_maps, dlc_scoremap_targets,
    locref_targets_from_scoremap_coords)


def np_dlc_targets(coords_xy, present, h, w, stride, pos_dist_thresh,
                   locref_stdev, scale=1.0):
    t, nj, _ = coords_xy.shape
    dist_thresh = pos_dist_thresh * scale
    half = stride / 2.0
    locref_scale = 1.0 / locref_stdev
    scmap = np.zeros((t, h, w, nj))
    lmap = np.zeros((t, h, w, nj * 2))
    lmask = np.zeros((t, h, w, nj * 2))
    for f in range(t):
        for k in range(nj):
            if not present[f, k]:
                continue
            jx, jy = coords_xy[f, k]
            if np.isnan(jx):
                continue
            for j in range(h):
                pt_y = j * stride + half
                for i in range(w):
                    pt_x = i * stride + half
                    dx, dy = jx - pt_x, jy - pt_y
                    if dx * dx + dy * dy <= dist_thresh ** 2:
                        scmap[f, j, i, k] = 1
                        lmask[f, j, i, 2 * k] = 1
                        lmask[f, j, i, 2 * k + 1] = 1
                        lmap[f, j, i, 2 * k] = dx * locref_scale
                        lmap[f, j, i, 2 * k + 1] = dy * locref_scale
    return scmap, lmap, lmask


def test_dlc_scoremap_targets_match_reference_rasterizer(rng):
    h, w, stride = 12, 10, 8.0
    coords = rng.uniform(0, 80, size=(2, 3, 2)).astype(np.float32)
    present = np.ones((2, 3), bool)
    present[1, 2] = False
    got_s, got_m, got_k = dlc_scoremap_targets(
        jnp.asarray(coords), jnp.asarray(present), h, w, stride,
        pos_dist_thresh=17, locref_stdev=7.2801)
    want_s, want_m, want_k = np_dlc_targets(
        coords, present, h, w, stride, 17, 7.2801)
    np.testing.assert_allclose(np.asarray(got_s), want_s, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_k), want_k, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_m), want_m, atol=1e-5)


def test_nan_coords_produce_empty_targets():
    coords = np.full((1, 2, 2), np.nan, np.float32)
    s, m, k = dlc_scoremap_targets(
        jnp.asarray(coords), jnp.ones((1, 2)), 6, 6, 8.0, 17, 7.2801)
    assert float(jnp.sum(s)) == 0.0
    assert float(jnp.sum(k)) == 0.0


def test_gaussian_target_peak_normalized():
    maps = gaussian_target_maps(jnp.asarray([[3.0, 4.0]]), 8, 8, 1.0)
    m = np.asarray(maps)[0]
    np.testing.assert_allclose(m.max(), 1.0 / (1.0 + 1e-5), rtol=1e-5)
    assert m[3, 4] == m.max()
    # gaussian falloff
    np.testing.assert_allclose(m[3, 5] / m[3, 4], np.exp(-0.5), rtol=1e-4)


def test_locref_from_scoremap_coords_roundtrip():
    # coords in scoremap space; pixel = coord * 8 + 4 (ref dataset.py:252)
    coords_rc = jnp.asarray([[[2.0, 3.0]]])
    s, m, k = locref_targets_from_scoremap_coords(
        coords_rc, jnp.ones((1, 1)), 6, 6, 8.0, 17, 7.2801)
    s = np.asarray(s)
    assert s[0, 2, 3, 0] == 1.0  # disk center at (row 2, col 3)
    # offset at the center cell is zero
    np.testing.assert_allclose(np.asarray(m)[0, 2, 3], [0.0, 0.0], atol=1e-5)
