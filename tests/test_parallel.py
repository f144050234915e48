"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams
from deepgraphpose_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                             pad_to_multiple, replicate,
                                             shard_leading_axis)
from deepgraphpose_tpu.parallel.train_dp import (make_dp_dgp_train_step,
                                                 make_dp_infer_fn)
from deepgraphpose_tpu.train.steps import make_optimizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the virtual multi-device CPU mesh")


def _cfg(nj=3):
    return PoseConfig(num_joints=nj, net_type="mobilenet_v2_0.35",
                      pos_dist_thresh=9)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8  # conftest forces the 8-device CPU mesh


def test_pad_to_multiple():
    arr = np.arange(10).reshape(5, 2)
    padded, n = pad_to_multiple(arr, 4)
    assert padded.shape == (8, 2) and n == 5
    np.testing.assert_array_equal(padded[5], padded[4])


def test_dp_infer_matches_single_device(rng):
    cfg = _cfg()
    mesh = make_mesh(4)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    images = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)

    from deepgraphpose_tpu.infer.predict import make_infer_fn

    mu_ref, lik_ref = make_infer_fn(model, cfg)(variables,
                                                jnp.asarray(images))
    with mesh:
        infer = make_dp_infer_fn(model, cfg, mesh)
        v_r = replicate(variables, mesh)
        im_s = shard_leading_axis(images, mesh)
        mu, lik = infer(v_r, im_s)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lik), np.asarray(lik_ref),
                               rtol=1e-4, atol=1e-4)


def test_dp_train_step_runs_and_is_finite(rng):
    cfg = _cfg()
    nj, t, g = 3, 3, 4
    mesh = make_mesh(g)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    lp = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=8.0,
        n_hidden_frames_total=16.0, S0=np.array([[1.0, -1.0, 0.0]]),
        ws=np.array([2.0], np.float32), ws_max=np.array([60.0], np.float32))
    tx = make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    step = make_dp_dgp_train_step(model, lp, tx, mesh)

    vis = np.zeros((g, t * nj), np.float32)
    vis[:, :nj] = 1.0
    images = rng.uniform(0, 255, (g, t, 32, 32, 3)).astype(np.float32)
    batch = dict(
        targets=rng.uniform(0, 3, (g, t, nj, 2)).astype(np.float32),
        visible_mask=vis, hidden_mask=1.0 - vis,
        frame_mask=np.ones((g, t), np.float32),
        wt_batch=np.zeros((g, t - 1), np.float32),
        pair_mask=np.ones((g, t - 1), np.float32),
        flow=np.zeros((g, t - 1, 32, 32), np.float32))

    # snapshot before the step: donated buffers may alias the originals
    p0 = np.asarray(jax.tree_util.tree_leaves(variables["params"])[0]).copy()
    with mesh:
        v = replicate(variables, mesh)
        o = replicate(opt_state, mesh)
        im = shard_leading_axis(images, mesh)
        b = shard_leading_axis(batch, mesh)
        v2, o2, out = step(v, o, im, b)
    assert np.isfinite(float(out["total_loss"]))
    p1 = np.asarray(jax.tree_util.tree_leaves(v2["params"])[0])
    assert not np.array_equal(p0, p1)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dp_pooled_step_matches_dp_step(rng):
    """DP-over-pool (replicated HBM pool, sharded row indices) reproduces
    the plain DP step exactly when augmentation is off."""
    from deepgraphpose_tpu.parallel.train_dp import \
        make_dp_pooled_dgp_train_step

    cfg = _cfg()
    nj, t, g = 3, 3, 4
    mesh = make_mesh(g)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    lp = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=8.0,
        n_hidden_frames_total=16.0, S0=np.array([[1.0, -1.0, 0.0]]),
        ws=np.array([2.0], np.float32), ws_max=np.array([60.0], np.float32))

    pool = rng.integers(0, 255, (10, 32, 32, 3), dtype=np.uint8)
    rows = rng.integers(0, 10, (g, t)).astype(np.int32)
    images = pool[rows].astype(np.float32)
    vis = np.zeros((g, t * nj), np.float32)
    vis[:, :nj] = 1.0
    batch = dict(
        targets=rng.uniform(0, 3, (g, t, nj, 2)).astype(np.float32),
        visible_mask=vis, hidden_mask=1.0 - vis,
        frame_mask=np.ones((g, t), np.float32),
        wt_batch=np.zeros((g, t - 1), np.float32),
        pair_mask=np.ones((g, t - 1), np.float32),
        flow=np.zeros((g, t - 1, 32, 32), np.float32))
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(3), g))

    # host copy: the step donates its replicated inputs, and replicate()
    # may alias the original buffers
    variables_np = jax.device_get(variables)

    results = {}
    for mode in ("plain", "pooled"):
        variables = jax.tree_util.tree_map(np.array, variables_np)
        tx = make_optimizer(0.005, clip_norm=10.0)
        opt_state = tx.init(variables["params"])
        with mesh:
            v = replicate(variables, mesh)
            o = replicate(opt_state, mesh)
            b = shard_leading_axis(batch, mesh)
            if mode == "plain":
                step = make_dp_dgp_train_step(model, lp, tx, mesh)
                im = shard_leading_axis(images, mesh)
                v2, o2, out = step(v, o, im, b)
            else:
                step = make_dp_pooled_dgp_train_step(model, lp, tx, mesh,
                                                     aug_cfg=None)
                pool_r = jax.device_put(
                    pool, jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec()))
                rows_s = shard_leading_axis(rows, mesh)
                keys_s = shard_leading_axis(keys, mesh)
                v2, o2, out = step(v, o, pool_r, rows_s, b, keys_s)
        results[mode] = (float(out["total_loss"]),
                         [np.asarray(x) for x in
                          jax.tree_util.tree_leaves(v2["params"])])
    assert results["plain"][0] == pytest.approx(results["pooled"][0],
                                                rel=1e-6)
    for a, b_ in zip(results["plain"][1], results["pooled"][1]):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)


def test_dp_pooled_step_with_aug_is_finite(rng):
    from deepgraphpose_tpu.ops.augment_device import DeviceAugmentConfig
    from deepgraphpose_tpu.parallel.train_dp import \
        make_dp_pooled_dgp_train_step

    cfg = _cfg()
    nj, t, g = 3, 3, 4
    mesh = make_mesh(g)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    lp = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=8.0,
        n_hidden_frames_total=16.0, S0=np.array([[1.0, -1.0, 0.0]]),
        ws=np.array([2.0], np.float32), ws_max=np.array([60.0], np.float32))
    tx = make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    step = make_dp_pooled_dgp_train_step(
        model, lp, tx, mesh, aug_cfg=DeviceAugmentConfig.reference())

    pool = rng.integers(0, 255, (10, 32, 32, 3), dtype=np.uint8)
    rows = rng.integers(0, 10, (g, t)).astype(np.int32)
    vis = np.zeros((g, t * nj), np.float32)
    vis[:, :nj] = 1.0
    batch = dict(
        targets=rng.uniform(0, 3, (g, t, nj, 2)).astype(np.float32),
        visible_mask=vis, hidden_mask=1.0 - vis,
        frame_mask=np.ones((g, t), np.float32),
        wt_batch=np.zeros((g, t - 1), np.float32),
        pair_mask=np.ones((g, t - 1), np.float32),
        flow=np.zeros((g, t - 1, 32, 32), np.float32))
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(5), g))
    with mesh:
        v = replicate(variables, mesh)
        o = replicate(opt_state, mesh)
        pool_r = jax.device_put(pool, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        v2, o2, out = step(v, o, pool_r, shard_leading_axis(rows, mesh),
                           shard_leading_axis(batch, mesh),
                           shard_leading_axis(keys, mesh))
    assert np.isfinite(float(out["total_loss"]))
