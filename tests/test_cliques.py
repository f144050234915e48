"""Clique potentials vs numpy re-implementations (SURVEY 'hard parts':
loss normalization subtleties, box flow gating) + a wt>0 pipeline smoke."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepgraphpose_tpu.ops.cliques import (box_mean_flow,
                                           spatial_clique_loss,
                                           temporal_clique_loss)


def test_box_mean_flow_integer_boxes_exact(rng):
    flow = rng.uniform(0, 3, (2, 20, 30)).astype(np.float32)
    r_min = np.array([[2.0, 0.0], [5.0, 1.0]])
    r_max = np.array([[10.0, 20.0], [15.0, 19.0]])
    c_min = np.array([[3.0, 0.0], [0.0, 7.0]])
    c_max = np.array([[13.0, 30.0], [10.0, 28.0]])
    got = np.asarray(box_mean_flow(jnp.asarray(flow), jnp.asarray(r_min),
                                   jnp.asarray(c_min), jnp.asarray(r_max),
                                   jnp.asarray(c_max)))
    for p in range(2):
        for k in range(2):
            want = flow[p, int(r_min[p, k]):int(r_max[p, k]),
                        int(c_min[p, k]):int(c_max[p, k])].mean()
            np.testing.assert_allclose(got[p, k], want, rtol=1e-5)


def test_box_mean_flow_fractional_close_to_direct(rng):
    """Fractional boxes: SAT bilinear vs dense weighted mean on a smooth
    field (matches the reference's crop_and_resize up to interpolation)."""
    y, x = np.mgrid[0:24, 0:32]
    flow = (np.sin(y / 5.0) + np.cos(x / 7.0) + 2.5)[None].astype(np.float32)
    r_min = np.array([[3.6]]); r_max = np.array([[17.2]])
    c_min = np.array([[5.3]]); c_max = np.array([[22.8]])
    got = float(np.asarray(box_mean_flow(
        jnp.asarray(flow), jnp.asarray(r_min), jnp.asarray(c_min),
        jnp.asarray(r_max), jnp.asarray(c_max)))[0, 0])
    want = flow[0, 4:17, 5:23].mean()  # nearest integer box
    assert abs(got - want) / want < 0.05


def _np_temporal(coords_px, flow, wt_batch, wt_max, pair_mask, hw,
                 window=10.0):
    p0, p1 = coords_px[:-1], coords_px[1:]
    td = np.sqrt(((p0 - p1) ** 2).sum(-1))
    P, nj = td.shape
    h_in, w_in = flow.shape[1:]
    mean_flow = np.zeros((P, nj))
    for p in range(P):
        for j in range(nj):
            rmin = max(min(p0[p, j, 0], p1[p, j, 0]) - window, 0)
            rmax = min(max(p0[p, j, 0], p1[p, j, 0]) + window, h_in)
            cmin = max(min(p0[p, j, 1], p1[p, j, 1]) - window, 0)
            cmax = min(max(p0[p, j, 1], p1[p, j, 1]) + window, w_in)
            box = flow[p, int(round(rmin)):int(round(rmax)),
                       int(round(cmin)):int(round(cmax))]
            mean_flow[p, j] = box.mean() if box.size else 0.0
    inv = np.minimum(1.0 / (mean_flow + 1e-10), 1.0) ** 3
    inv = np.minimum(inv, 1.0)
    gate = inv * (wt_batch * pair_mask)[:, None] / hw[0] / hw[1]
    hinged = (np.maximum(td - wt_max, 0) + wt_max) * gate
    return float(np.sqrt((hinged ** 2).sum()))


def test_temporal_clique_matches_numpy(rng):
    T, nj, hw = 5, 3, (12, 16)
    coords = rng.uniform(15, 80, (T, nj, 2))
    flow = rng.uniform(0.0, 4.0, (T - 1, 96, 128)).astype(np.float32)
    wt_batch = np.full(T - 1, 2.0, np.float32)
    pair_mask = np.array([1, 1, 0, 1], np.float32)
    got = float(temporal_clique_loss(
        jnp.asarray(coords), jnp.asarray(flow), jnp.asarray(wt_batch),
        1.5, jnp.asarray(pair_mask), hw))
    want = _np_temporal(coords, flow, wt_batch, 1.5, pair_mask, hw)
    assert got == pytest.approx(want, rel=0.03)


def test_temporal_clique_flow_gating(rng):
    """High flow (animal moving) must weaken the smoothness penalty."""
    T, nj, hw = 4, 2, (8, 8)
    coords = rng.uniform(20, 60, (T, nj, 2))
    ones = np.ones(T - 1, np.float32)
    lo = np.full((T - 1, 96, 96), 0.01, np.float32)
    hi = np.full((T - 1, 96, 96), 50.0, np.float32)
    args = (jnp.asarray(coords),)
    l_lo = float(temporal_clique_loss(*args, jnp.asarray(lo),
                                      jnp.asarray(ones), 0.0,
                                      jnp.asarray(ones), hw))
    l_hi = float(temporal_clique_loss(*args, jnp.asarray(hi),
                                      jnp.asarray(ones), 0.0,
                                      jnp.asarray(ones), hw))
    assert l_hi < l_lo * 1e-3


def test_temporal_clique_pair_mask_zeroes(rng):
    T, nj, hw = 4, 2, (8, 8)
    coords = rng.uniform(20, 60, (T, nj, 2))
    flow = np.full((T - 1, 64, 64), 0.1, np.float32)
    zeros = np.zeros(T - 1, np.float32)
    l0 = float(temporal_clique_loss(
        jnp.asarray(coords), jnp.asarray(flow),
        jnp.asarray(np.ones(T - 1, np.float32)), 0.0,
        jnp.asarray(zeros), hw))
    assert l0 == pytest.approx(0.0, abs=1e-8)


def test_spatial_clique_matches_numpy(rng):
    T, nj, nl, hw = 4, 3, 2, (10, 12)
    coords = rng.uniform(0, 50, (T, nj, 2))
    S0 = np.array([[1.0, -1.0, 0.0], [0.0, 1.0, -1.0]], np.float32)
    ws = np.array([0.5, 2.0], np.float32)
    ws_max = np.array([10.0, 5.0], np.float32)
    fmask = np.array([1, 1, 0, 1], np.float32)
    got = float(spatial_clique_loss(
        jnp.asarray(coords), jnp.asarray(S0), jnp.asarray(ws),
        jnp.asarray(ws_max), jnp.asarray(fmask), hw))
    limb = np.einsum("lj,tjc->tlc", S0, coords)
    dist = np.sqrt((limb ** 2).sum(-1))
    hinged = np.maximum(dist - ws_max, 0) + ws_max
    want = float((hinged * ws * fmask[:, None]).sum() / hw[0] / hw[1])
    assert got == pytest.approx(want, rel=1e-5)


def test_fit_dgp_with_temporal_clique(synthetic_project, tmp_path, monkeypatch):
    """wt>0 end-to-end: optical flow is computed on the host and the
    temporal clique contributes a finite loss through a real train step."""
    import shutil

    from deepgraphpose_tpu.train.fit import fit_dgp

    root, _, _ = synthetic_project
    # isolated copy so snapshots don't collide with other tests
    proj = tmp_path / "proj"
    shutil.copytree(root, proj)
    for extra in (proj / "dlc-models").rglob("snapshot-*"):
        extra.unlink()
    final = fit_dgp(dlcpath=proj, batch_size=3, maxiters=2, displayiters=1,
                    saveiters=100, wt=1.0, nepoch=1, n_max_frames=12,
                    aug=False)
    assert final is not None and final.exists()
