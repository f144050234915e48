"""Data-parallel training wired through the user-facing fit API
(train/fit.py ``data_parallel=`` -> parallel/train_dp.py) on the virtual
8-device CPU mesh; plus DP-step feature parity (bn_train / device_flow)
against the single-device pooled step."""

import os
from pathlib import Path

import jax
import numpy as np
import pytest
import yaml

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams
from deepgraphpose_tpu.parallel.mesh import (make_mesh, replicate,
                                             shard_leading_axis)
from deepgraphpose_tpu.train.steps import make_optimizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the virtual multi-device CPU mesh")


@pytest.fixture(scope="module")
def dp_project(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import make_synthetic_project

    root = str(tmp_path_factory.mktemp("dpproj"))
    make_synthetic_project(root, n_frames=30, n_labeled=4, hw=(48, 64))
    cfg_path = Path(root, "dlc-models/iteration-0/"
                    "SynthJan1-trainset95shuffle1", "train", "pose_cfg.yaml")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["net_type"] = "mobilenet_v2_0.35"
    raw["multi_step"] = [[0.002, 100000]]
    cfg_path.write_text(yaml.safe_dump(raw))
    return root


@pytest.mark.slow
def test_fit_pipeline_data_parallel(dp_project):
    """All three fit steps train through the DP path (mesh of 4) on a real
    synthetic project and leave loadable final snapshots."""
    from deepgraphpose_tpu.train.fit import (fit_dgp, fit_dgp_labeledonly,
                                             fit_dlc)

    root = dp_project
    snap0 = fit_dlc(dlcpath=root, maxiters=3, displayiters=1, saveiters=100,
                    data_parallel=4)
    assert snap0 is not None and snap0.name == "snapshot-step0-final--0.ckpt"

    snap1 = fit_dgp_labeledonly(dlcpath=root, maxiters=4, displayiters=1,
                                saveiters=100, ns=2, n_max_frames=20,
                                nepoch=1, aug=False, data_parallel=4)
    assert snap1.name == "snapshot-step1-final--0.ckpt"

    snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=4, displayiters=1,
                    saveiters=100, ns=2, n_max_frames=20, nepoch=1,
                    aug=True, data_parallel=4)
    assert snap2.name == "snapshot-step2-final--0.ckpt"

    # snapshots are plain (unreplicated) host checkpoints: load one back
    # and run a forward pass
    from deepgraphpose_tpu.core.checkpoint import load_snapshot
    from deepgraphpose_tpu.infer.predict import make_infer_fn
    from deepgraphpose_tpu.train.fit import resolve_project

    _, cfg, _ = resolve_project(root)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (48, 64))
    variables, _ = load_snapshot(snap2, variables)
    mu, lik = make_infer_fn(model, cfg)(
        variables, np.zeros((2, 48, 64, 3), np.uint8))
    assert np.isfinite(np.asarray(mu)).all()


def test_group_schedule_dp_covers_and_pads():
    from deepgraphpose_tpu.train.fit import _group_schedule_dp

    rng = np.random.default_rng(0)
    schedule = ([(0, np.array([i, i + 1])) for i in range(5)]
                + [(1, np.array([i])) for i in range(3)])
    groups = _group_schedule_dp(schedule, 4, rng)
    assert all(len(grp) == 4 for _, grp in groups)
    # 5 windows of video 0 -> 2 groups; 3 of video 1 -> 1 group
    assert sorted(ds for ds, _ in groups) == [0, 0, 1]
    # every scheduled window appears in its video's groups
    seen0 = {tuple(w) for ds, grp in groups if ds == 0 for w in grp}
    assert seen0 == {tuple(w) for ds, w in schedule if ds == 0}


def _lp(nj):
    return DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.5,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=8.0,
        n_hidden_frames_total=16.0, S0=np.array([[1.0, -1.0, 0.0]]),
        ws=np.array([2.0], np.float32), ws_max=np.array([60.0], np.float32))


def _window_batch(rng, t, nj):
    vis = np.zeros(t * nj, np.float32)
    vis[:nj] = 1.0
    return dict(
        targets=rng.uniform(0, 3, (t, nj, 2)).astype(np.float32),
        visible_mask=vis, hidden_mask=1.0 - vis,
        frame_mask=np.ones(t, np.float32),
        wt_batch=np.full(t - 1, 0.5, np.float32),
        pair_mask=np.ones(t - 1, np.float32),
        flow=np.zeros((t - 1, 32, 32), np.float32))


def test_dp_pooled_step_bn_train_device_flow_matches_single(rng):
    """G identical windows through the DP step (bn_train + device_flow)
    reproduce the single-device pooled step exactly: same params, same
    updated batch_stats."""
    from deepgraphpose_tpu.parallel.train_dp import \
        make_dp_pooled_dgp_train_step
    from deepgraphpose_tpu.train.device_data import \
        make_pooled_dgp_train_step

    cfg = PoseConfig(num_joints=3, net_type="mobilenet_v2_0.35",
                     pos_dist_thresh=9)
    nj, t, g = 3, 3, 4
    mesh = make_mesh(g)
    model, variables0 = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    lp = _lp(nj)

    pool = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    rows1 = rng.integers(0, 8, (t,)).astype(np.int32)
    batch1 = _window_batch(rng, t, nj)
    variables_np = jax.device_get(variables0)

    # single device
    variables = jax.tree_util.tree_map(np.array, variables_np)
    tx = make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    sstep = make_pooled_dgp_train_step(model, lp, tx, None, bn_train=True,
                                       device_flow=True)
    v1, o1, out1 = sstep(variables, opt_state, jax.device_put(pool),
                         jax.device_put(rows1),
                         {k: jax.device_put(v) for k, v in batch1.items()},
                         jax.random.PRNGKey(3))

    # DP: the same window replicated G times
    variables = jax.tree_util.tree_map(np.array, variables_np)
    tx = make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    dstep = make_dp_pooled_dgp_train_step(model, lp, tx, mesh, None,
                                          bn_train=True, device_flow=True)
    rows_g = np.tile(rows1, (g, 1))
    batch_g = {k: np.tile(v, (g,) + (1,) * v.ndim) for k, v in batch1.items()}
    keys_g = np.tile(np.asarray(jax.random.PRNGKey(3)), (g, 1))
    with mesh:
        v2, o2, out2 = dstep(
            replicate(variables, mesh), replicate(opt_state, mesh),
            replicate(pool, mesh), shard_leading_axis(rows_g, mesh),
            shard_leading_axis(batch_g, mesh),
            shard_leading_axis(keys_g, mesh))

    assert float(out1["total_loss"]) == pytest.approx(
        float(out2["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(v1["params"]),
                    jax.tree_util.tree_leaves(v2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # bn_train actually updated the stats, identically on both paths
    for a, b in zip(jax.tree_util.tree_leaves(v1["batch_stats"]),
                    jax.tree_util.tree_leaves(v2["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dp_pooled_step_rejects_aug_with_device_flow():
    from deepgraphpose_tpu.ops.augment_device import DeviceAugmentConfig
    from deepgraphpose_tpu.parallel.train_dp import \
        make_dp_pooled_dgp_train_step

    cfg = PoseConfig(num_joints=3, net_type="mobilenet_v2_0.35")
    mesh = make_mesh(2)
    model, _ = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    tx = make_optimizer(0.005)
    with pytest.raises(ValueError, match="aug_cfg must be None"):
        make_dp_pooled_dgp_train_step(
            model, _lp(3), tx, mesh, DeviceAugmentConfig.reference(),
            device_flow=True)


def test_dp_pooled_dlc_step_matches_single(rng):
    """The DP step-0 pooled step with a sharded global batch reproduces the
    single-device pooled step on the identical batch."""
    from deepgraphpose_tpu.parallel.train_dp import \
        make_dp_pooled_dlc_train_step
    from deepgraphpose_tpu.train.device_data import \
        make_pooled_dlc_train_step

    cfg = PoseConfig(num_joints=3, net_type="mobilenet_v2_0.35",
                     pos_dist_thresh=9)
    g, bs, nj = 4, 2, 3
    mesh = make_mesh(g)
    model, variables0 = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    variables_np = jax.device_get(variables0)

    n = 10
    pool_images = rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8)
    pool_coords = rng.uniform(0, 31, (n, nj, 2)).astype(np.float32)
    pool_present = np.ones((n, nj), np.float32)
    pool_content = np.tile(np.array([32.0, 32.0], np.float32), (n, 1))
    idxs = rng.integers(0, n, (g * bs,)).astype(np.int32)
    key = jax.random.PRNGKey(11)

    variables = jax.tree_util.tree_map(np.array, variables_np)
    tx = make_optimizer(0.005)
    opt_state = tx.init(variables["params"])
    sstep = make_pooled_dlc_train_step(model, cfg, tx, None, bn_train=False)
    v1, o1, out1 = sstep(variables, opt_state, jax.device_put(pool_images),
                         jax.device_put(pool_coords),
                         jax.device_put(pool_present),
                         jax.device_put(pool_content),
                         jax.device_put(idxs), key, 0)

    variables = jax.tree_util.tree_map(np.array, variables_np)
    tx = make_optimizer(0.005)
    opt_state = tx.init(variables["params"])
    dstep = make_dp_pooled_dlc_train_step(model, cfg, tx, mesh, None,
                                          bn_train=False)
    with mesh:
        v2, o2, out2 = dstep(
            replicate(variables, mesh), replicate(opt_state, mesh),
            replicate(pool_images, mesh), replicate(pool_coords, mesh),
            replicate(pool_present, mesh), replicate(pool_content, mesh),
            shard_leading_axis(idxs, mesh),
            replicate(np.asarray(key), mesh), 0)

    assert float(out1["total_loss"]) == pytest.approx(
        float(out2["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(v1["params"]),
                    jax.tree_util.tree_leaves(v2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fit_dgp_windows_per_device_layout_invariant(dp_project, tmp_path):
    """data_parallel=4, data_parallel=2+windows_per_device=2, and the
    single-device windows_per_device=4 mesh all consume the same dp_G=4
    global batches (same seed -> same grouping/keys), so the trained
    step-2 params must agree across device layouts — the windows knob is
    pure layout, not new semantics."""
    import shutil

    from deepgraphpose_tpu.core.checkpoint import load_snapshot
    from deepgraphpose_tpu.train.fit import fit_dgp, resolve_project

    finals = []
    for name, kw in [("dp4", dict(data_parallel=4)),
                     ("dp2w2", dict(data_parallel=2, windows_per_device=2)),
                     ("w4", dict(windows_per_device=4))]:
        root = tmp_path / name
        shutil.copytree(dp_project, root)
        for p in (root / "dlc-models").rglob("snapshot-step2*"):
            p.unlink()
        snap = fit_dgp(dlcpath=root, batch_size=3, maxiters=8,
                       displayiters=4, saveiters=100, ns=2, n_max_frames=20,
                       nepoch=1, aug=True, **kw)
        assert snap is not None and "final" in snap.name
        _, cfg, _ = resolve_project(root)
        model, variables = init_model(cfg, jax.random.PRNGKey(0), (48, 64))
        variables, _ = load_snapshot(snap, variables)
        finals.append(jax.device_get(variables["params"]))
    for other in finals[1:]:
        for a, b in zip(jax.tree_util.tree_leaves(finals[0]),
                        jax.tree_util.tree_leaves(other)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
