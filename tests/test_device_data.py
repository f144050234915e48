"""Device-resident data pools (train/device_data.py): pool-vs-host
equivalence of the fit entry points, pooled-step semantics."""

import os
import shutil
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(__file__))

from deepgraphpose_tpu.core import checkpoint as ckpt_lib  # noqa: E402
from deepgraphpose_tpu.train import device_data as dd  # noqa: E402
from deepgraphpose_tpu.train.fit import (fit_dgp, fit_dlc,  # noqa: E402
                                         resolve_project)


def _make_proj(tmp_path, name, deterministic=False):
    from conftest import make_synthetic_project

    root = str(tmp_path / name)
    make_synthetic_project(root, n_frames=12, n_labeled=3, hw=(48, 64))
    cfg_path = Path(root, "dlc-models/iteration-0/"
                    "SynthJan1-trainset95shuffle1", "train", "pose_cfg.yaml")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["net_type"] = "mobilenet_v2_0.35"
    raw["multi_step"] = [[0.002, 100000]]
    if deterministic:
        raw["dataset_type"] = "deterministic"
    cfg_path.write_text(yaml.safe_dump(raw))
    return root


def _final_params(root, step):
    _, _, train_dir = resolve_project(root, 1)
    snap = Path(train_dir) / f"snapshot-step{step}-final--0.ckpt"
    assert snap.exists()
    from deepgraphpose_tpu.core.checkpoint import load_snapshot

    variables, _ = load_snapshot(snap, None, None)
    return jax.tree_util.tree_leaves(variables["params"])


def test_pool_fits_budget():
    assert dd.pool_fits(52, 747, 832)
    assert not dd.pool_fits(100000, 747, 832)


def test_fit_dlc_pool_matches_host_exactly(tmp_path):
    """With the deterministic loader (no jitter, fixed order), the pooled
    path must reproduce the host path bit-for-bit: same batches, same
    init, same optimizer -> same final parameters."""
    params = {}
    for mode in (True, False):
        root = _make_proj(tmp_path, f"p{mode}", deterministic=True)
        snap = fit_dlc(dlcpath=root, maxiters=3, displayiters=1,
                       saveiters=100, device_data=mode, bn_train=False)
        assert snap is not None
        params[mode] = _final_params(root, 0)
    for a, b in zip(params[True], params[False]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_fit_dgp_pool_matches_host_exactly(tmp_path):
    """aug=False DGP: the pooled path gathers the same frames the host path
    decodes, so the trained parameters must match."""
    params = {}
    for mode in (True, False):
        root = _make_proj(tmp_path, f"g{mode}")
        # provide a warm-start so both runs share the same step-0 snapshot
        snap0 = fit_dlc(dlcpath=root, maxiters=2, displayiters=1,
                        saveiters=100, device_data=True, bn_train=False,
                        jitter=False)
        assert snap0 is not None
        snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=3,
                        displayiters=1, saveiters=100, ns=2, n_max_frames=10,
                        nepoch=1, aug=False, device_data=mode,
                        bn_train=False)
        assert snap2 is not None
        params[mode] = _final_params(root, 2)
    for a, b in zip(params[True], params[False]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_fit_dgp_pool_with_device_aug_smoke(tmp_path):
    """aug=True in pool mode runs the on-device augmentation pipeline
    inside the jitted step; losses stay finite and a snapshot lands."""
    root = _make_proj(tmp_path, "aug")
    snap0 = fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
                    bn_train=False, jitter=False)
    snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=3, displayiters=1,
                    saveiters=100, ns=2, n_max_frames=10, nepoch=1,
                    aug=True, device_data=True, bn_train=False)
    assert snap2 is not None and snap2.exists()


def test_fit_dlc_from_scratch_full_aug_smoke(tmp_path):
    """The from-scratch recipe: bn_train auto-on (no warm start), device
    pool, full reference augmentation on device."""
    root = _make_proj(tmp_path, "scratch")
    snap = fit_dlc(dlcpath=root, maxiters=3, displayiters=1, saveiters=100,
                   device_data=True, aug=True)
    assert snap is not None and snap.exists()
    # bn stats must have moved away from the (0, 1) init somewhere
    from deepgraphpose_tpu.core.checkpoint import load_snapshot

    variables, _ = load_snapshot(snap, None, None)
    means = [np.asarray(v) for k, v in
             jax.tree_util.tree_flatten_with_path(
                 variables["batch_stats"])[0] if "mean" in str(k)]
    assert any(np.abs(m).max() > 1e-6 for m in means)


def test_frame_pool_rows_and_gather(tmp_path):
    from deepgraphpose_tpu.data.batcher import MultiDataset
    from deepgraphpose_tpu.train.fit import dgp_video_sets

    root = _make_proj(tmp_path, "rows")
    proj, cfg, _ = resolve_project(root, 1)
    mds = MultiDataset(proj, cfg, dgp_video_sets(proj, root), ns=2,
                       n_max_frames=10)
    d = mds.datasets[0]
    pool = dd.FramePool(d)
    # pool rows round-trip: gather by row returns the cached frame
    some = d.chunk[:3]
    rows = pool.rows(some)
    got = np.asarray(jnp.take(pool.images, jnp.asarray(rows), axis=0))
    want = d.get_frames(some)
    np.testing.assert_array_equal(got, want)
    # padding frame number -1 maps to row 0 (masked downstream)
    assert pool.rows([-1])[0] == 0


def test_fit_dgp_device_flow_temporal_training(tmp_path):
    """wt > 0 with device_flow=True: the temporal clique trains from the
    HBM pool with on-device LK flow (no host Farneback on the hot path)."""
    root = _make_proj(tmp_path, "flow")
    fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
            bn_train=False, jitter=False)
    snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=3, displayiters=1,
                    saveiters=100, ns=2, n_max_frames=10, nepoch=1,
                    wt=1.0, aug=False, device_data=True, device_flow=True,
                    bn_train=False)
    assert snap2 is not None and snap2.exists()


def test_pooled_step_device_flow_wt_loss_nonzero():
    import jax
    import jax.numpy as jnp

    from deepgraphpose_tpu.core.config import PoseConfig
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams
    from deepgraphpose_tpu.train import steps as steps_lib

    nj, t = 3, 3
    cfg = PoseConfig(num_joints=nj, net_type="mobilenet_v2_0.35",
                     pos_dist_thresh=9)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    lp = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=1.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=4.0,
        n_hidden_frames_total=8.0, S0=np.zeros((0, nj), np.float32),
        ws=np.zeros((0,), np.float32), ws_max=np.zeros((0,), np.float32))
    tx = steps_lib.make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    step = dd.make_pooled_dgp_train_step(model, lp, tx, aug_cfg=None,
                                         device_flow=True)
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.integers(0, 255, (6, 32, 32, 3), dtype=np.uint8))
    rows = jnp.asarray(np.arange(t, dtype=np.int32))
    vis = np.zeros(t * nj, np.float32)
    vis[:nj] = 1
    batch = dict(
        targets=jnp.asarray(rng.uniform(0, 3, (t, nj, 2)), jnp.float32),
        visible_mask=jnp.asarray(vis), hidden_mask=jnp.asarray(1 - vis),
        frame_mask=jnp.ones(t), wt_batch=jnp.full(t - 1, 1.0),
        pair_mask=jnp.ones(t - 1), flow=jnp.zeros((t - 1, 1, 1)))
    variables, opt_state, out = step(variables, opt_state, pool, rows,
                                     batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(out["total_loss"]))
    assert "wt_loss" in out and np.isfinite(float(out["wt_loss"]))


# ---------------------------------------------------------------------------
# lax.scan superstep (K updates per dispatch)
# ---------------------------------------------------------------------------

def test_iter_scan_chunks_boundary_last():
    chunks = list(dd.iter_scan_chunks(0, 100, 40, 16))
    # full coverage, in order, no overlap
    assert chunks[0][0] == 0 and chunks[-1][1] == 100
    for (a1, b1), (a2, b2) in zip(chunks, chunks[1:]):
        assert b1 == a2 and a1 < b1
    # every snapshot boundary is the LAST iteration of its chunk
    for a, b in chunks:
        for it in range(a, b - 1):
            assert not (it > 0 and it % 40 == 0)
    assert all(b - a <= 17 for a, b in chunks)
    # falsy save_every disables boundary splitting
    assert list(dd.iter_scan_chunks(0, 32, None, 16)) == [(0, 16), (16, 32)]


def test_iter_scan_runs_dataset_homogeneous():
    schedule = [(0, None)] * 5 + [(1, None)] * 3 + [(0, None)] * 4
    runs = list(dd.iter_scan_runs(schedule, 0, 4, 8))
    assert runs[0][1] == 0 and runs[-1][2] == len(schedule)
    for ds_i, a, b in runs:
        assert a < b
        assert all(schedule[i][0] == ds_i for i in range(a, b))
        for it in range(a, b - 1):
            assert not (it > 0 and it % 4 == 0)
    # resume start honored
    assert list(dd.iter_scan_runs(schedule, 6, None, 8))[0][1] == 6


def test_resolve_scan_iters():
    assert dd.resolve_scan_iters(0, True) == 0
    assert dd.resolve_scan_iters(1, True) == 0
    assert dd.resolve_scan_iters(7, True) == 7
    assert dd.resolve_scan_iters(7, False) == 0
    assert dd.resolve_scan_iters(7, True, n_dp=2) == 0
    # auto is off on CPU backends (tests), on for TPU
    want = 20 if jax.default_backend() == "tpu" else 0
    assert dd.resolve_scan_iters(None, True) == want


def test_fit_dlc_scan_matches_per_iter(tmp_path):
    """The scan superstep replays the exact per-iteration stream and keys,
    so K-chunked training must match the per-iteration pooled path."""
    params = {}
    for k in (0, 2):
        root = _make_proj(tmp_path, f"s{k}")
        snap = fit_dlc(dlcpath=root, maxiters=5, displayiters=1,
                       saveiters=3, device_data=True, bn_train=False,
                       jitter=False, scan_iters=k)
        assert snap is not None
        params[k] = _final_params(root, 0)
    for a, b in zip(params[0], params[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_fit_dgp_scan_matches_per_iter(tmp_path):
    """DGP windows staged K-at-a-time (schedule tensors stacked, one
    dispatch) must train identically to the per-iteration pooled step,
    including across a snapshot boundary inside the run."""
    params = {}
    for k in (0, 3):
        root = _make_proj(tmp_path, f"g{k}")
        fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
                device_data=True, bn_train=False, jitter=False)
        snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=5,
                        displayiters=1, saveiters=2, ns=2, n_max_frames=10,
                        nepoch=1, aug=False, device_data=True,
                        bn_train=False, scan_iters=k)
        assert snap2 is not None
        params[k] = _final_params(root, 2)
        # the boundary snapshot must exist (written from mid-scan state;
        # the synthetic schedule has 4 iterations, so only it=2 qualifies)
        _, _, train_dir = resolve_project(root, 1)
        assert (Path(train_dir) / "snapshot-step2-2.ckpt").exists()
    for a, b in zip(params[0], params[3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_fit_dgp_scan_with_aug_and_bn_smoke(tmp_path):
    """scan + on-device augmentation + trainable BN compose: losses stay
    finite and a final snapshot lands."""
    root = _make_proj(tmp_path, "sa")
    fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
            bn_train=False, jitter=False)
    snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=4, displayiters=1,
                    saveiters=100, ns=2, n_max_frames=10, nepoch=1,
                    aug=True, device_data=True, bn_train=True, scan_iters=2)
    assert snap2 is not None and snap2.exists()


def test_labeled_images_lazy_spill_matches_eager(tmp_path):
    """Step-0 host spill tier: over-budget labeled sets keep only
    paths/coords and decode per batch through an LRU; batches and the
    HBM pool built from them are identical to the eager set's."""
    from deepgraphpose_tpu.train.fit import _TrainLabeledImages

    root = _make_proj(tmp_path, "lazy")
    proj, cfg, _ = resolve_project(root, 1)
    eager = _TrainLabeledImages(proj, cfg, root, jitter=False)
    lazy = _TrainLabeledImages(proj, cfg, root, jitter=False,
                               budget_bytes=1)
    assert lazy.lazy and not eager.lazy
    assert len(lazy) == len(eager) > 0
    assert lazy.canvas_hw == eager.canvas_hw
    idxs = np.arange(len(eager))
    ie, ce, pe = eager.batch(idxs)
    il, cl, pl = lazy.batch(idxs)
    np.testing.assert_array_equal(ie, il)
    np.testing.assert_array_equal(ce, cl)
    np.testing.assert_array_equal(pe, pl)
    pool_e = dd.LabeledImagePool(eager, cfg)
    pool_l = dd.LabeledImagePool(lazy, cfg)
    np.testing.assert_array_equal(np.asarray(pool_e.images),
                                  np.asarray(pool_l.images))


def test_iter_group_scan_runs():
    """Chunks over group indices: dataset-homogeneous, snapshot-boundary
    groups chunk-final (boundary = gi*G crosses save_every)."""
    # G=2, save_every=4: boundary groups are gi=2 (it=4) and gi=4 (it=8)
    runs = list(dd.iter_group_scan_runs([0] * 6, 0, 4, 2, 3))
    assert runs == [(0, 0, 3), (0, 3, 5), (0, 5, 6)]
    # dataset switch splits a chunk
    assert list(dd.iter_group_scan_runs([0, 0, 1, 1], 0, None, 2, 8)) == \
        [(0, 0, 2), (1, 2, 4)]
    # resume start honored
    assert list(dd.iter_group_scan_runs([0] * 6, 4, None, 2, 8))[0] == \
        (0, 4, 6)


def test_fit_dgp_group_scan_matches_multiwindow(tmp_path):
    """The composed path (scan over K G-window pooled updates) must train
    identically to the G-window DP-machinery path it supersedes on one
    device, including across a snapshot boundary inside a scan chunk."""
    params = {}
    for k in (0, 2):
        root = _make_proj(tmp_path, f"gsc{k}")
        fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
                device_data=True, bn_train=False, jitter=False)
        snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=8,
                        displayiters=1, saveiters=4, ns=2, n_max_frames=10,
                        nepoch=2, aug=False, device_data=True,
                        bn_train=False, windows_per_device=2, scan_iters=k)
        assert snap2 is not None
        params[k] = _final_params(root, 2)
        _, _, train_dir = resolve_project(root, 1)
        assert (Path(train_dir) / "snapshot-step2-4.ckpt").exists()
    for a, b in zip(params[0], params[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_fit_dgp_group_scan_with_aug_and_bn_smoke(tmp_path):
    """Composed scan + on-device aug + trainable BN: finite losses, final
    snapshot lands."""
    root = _make_proj(tmp_path, "gsab")
    fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
            bn_train=False, jitter=False)
    snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=6, displayiters=1,
                    saveiters=100, ns=2, n_max_frames=10, nepoch=1,
                    aug=True, device_data=True, bn_train=True,
                    windows_per_device=2, scan_iters=2)
    assert snap2 is not None and snap2.exists()
