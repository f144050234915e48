"""Training-layer tests: checkpoints, train steps, 3-step fit pipeline smoke.

Uses the mobilenet_v2_0.35 backbone for CPU speed; the step/loss plumbing is
backbone-agnostic.
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from deepgraphpose_tpu.core import checkpoint as ckpt_lib
from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams
from deepgraphpose_tpu.train import steps as steps_lib
from deepgraphpose_tpu.train.fit import fit_dlc, fit_dgp, fit_dgp_labeledonly


def _small_cfg(nj=3):
    return PoseConfig(num_joints=nj, net_type="mobilenet_v2_0.35",
                      pos_dist_thresh=9)


# ------------------------------------------------------------- checkpointing

def test_checkpoint_roundtrip(tmp_path):
    cfg = _small_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    tx = steps_lib.make_optimizer(0.01, clip_norm=10.0)
    opt_state = tx.init(variables["params"])

    p = ckpt_lib.save_snapshot(tmp_path, 1, 42, variables, opt_state)
    assert p.name == "snapshot-step1-42.ckpt"
    v2, o2 = ckpt_lib.load_snapshot(p, variables, opt_state)
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(v2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert (jax.tree_util.tree_structure(o2)
            == jax.tree_util.tree_structure(opt_state))


def test_checkpoint_pruning_and_latest(tmp_path):
    cfg = _small_cfg()
    _, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    for it in [10, 20, 30, 40, 50, 60, 70]:
        ckpt_lib.save_snapshot(tmp_path, 2, it, variables, max_to_keep=3)
    remaining = sorted(p.name for p in tmp_path.glob("*.ckpt"))
    assert remaining == ["snapshot-step2-50.ckpt", "snapshot-step2-60.ckpt",
                         "snapshot-step2-70.ckpt"]
    assert ckpt_lib.latest_snapshot(tmp_path, 2).name == "snapshot-step2-70.ckpt"
    ckpt_lib.save_snapshot(tmp_path, 2, "final--0", variables)
    assert ckpt_lib.snapshot_exists(tmp_path, 2)
    assert ckpt_lib.latest_snapshot(tmp_path, 2).name == \
        "snapshot-step2-final--0.ckpt"


def test_restore_backbone_and_heads_partial(tmp_path):
    cfg = _small_cfg()
    _, v1 = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    p = ckpt_lib.save_snapshot(tmp_path, 0, "final--0", v1)
    _, v2 = init_model(cfg, jax.random.PRNGKey(1), (32, 32))
    merged = ckpt_lib.restore_backbone_and_heads(v2, p)
    a = jax.tree_util.tree_leaves(v1)
    b = jax.tree_util.tree_leaves(merged)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# --------------------------------------------------------------- train steps

def test_dlc_train_step_decreases_loss():
    cfg = _small_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    tx = steps_lib.make_optimizer(0.002)
    opt_state = tx.init(variables["params"])
    step = steps_lib.make_dlc_train_step(model, cfg, tx)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    coords = jnp.asarray(rng.uniform(4, 28, (2, 3, 2)), jnp.float32)
    present = jnp.ones((2, 3), bool)

    losses = []
    for it in range(8):
        variables, opt_state, out = step(variables, opt_state, imgs, coords,
                                         present, it)
        losses.append(float(out["total_loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_dgp_train_step_runs_and_updates():
    cfg = _small_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    nj = 3
    S0 = np.array([[1.0, -1.0, 0.0]])
    lp = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=6.0,
        n_hidden_frames_total=10.0, S0=S0, ws=np.array([2.0], np.float32),
        ws_max=np.array([50.0], np.float32))
    tx = steps_lib.make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    step = steps_lib.make_dgp_train_step(model, lp, tx)

    rng = np.random.default_rng(0)
    t = 3
    imgs = jnp.asarray(rng.uniform(0, 255, (t, 32, 32, 3)), jnp.float32)
    vis = np.zeros(t * nj, np.float32)
    vis[:nj] = 1
    batch = dict(
        targets=jnp.asarray(rng.uniform(0, 3, (t, nj, 2)), jnp.float32),
        visible_mask=jnp.asarray(vis),
        hidden_mask=jnp.asarray(1 - vis),
        frame_mask=jnp.ones(t),
        wt_batch=jnp.zeros(t - 1),
        pair_mask=jnp.ones(t - 1),
        flow=jnp.zeros((t - 1, 32, 32)))
    before = np.asarray(
        jax.tree_util.tree_leaves(variables["params"])[0]).copy()
    variables, opt_state, out = step(variables, opt_state, imgs, batch)
    after = np.asarray(jax.tree_util.tree_leaves(variables["params"])[0])
    assert np.isfinite(float(out["total_loss"]))
    assert not np.array_equal(before, after)
    assert float(out["ws_loss"]) >= 0


def test_piecewise_lr_schedule():
    sched = steps_lib.piecewise_lr([[0.005, 10], [0.02, 30], [0.002, 100]])
    assert float(sched(0)) == pytest.approx(0.005)
    assert float(sched(15)) == pytest.approx(0.02)
    assert float(sched(50)) == pytest.approx(0.002)
    assert float(sched(1000)) == pytest.approx(0.002)


# ------------------------------------------------------------ pipeline smoke

@pytest.fixture(scope="module")
def tiny_project(tmp_path_factory):
    """Synthetic project with a mobilenet pose_cfg for fast CPU training."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import make_synthetic_project

    root = str(tmp_path_factory.mktemp("trainproj"))
    make_synthetic_project(root, n_frames=30, n_labeled=4, hw=(48, 64))
    cfg_path = Path(root, "dlc-models/iteration-0/SynthJan1-trainset95shuffle1",
                    "train", "pose_cfg.yaml")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["net_type"] = "mobilenet_v2_0.35"
    raw["multi_step"] = [[0.002, 100000]]
    cfg_path.write_text(yaml.safe_dump(raw))
    return root


@pytest.mark.slow
def test_three_step_pipeline_smoke(tiny_project):
    """End-to-end: step 0 -> 1 -> 2 with tiny iteration counts
    (the reference's --test mode, run_dgp_demo.py:175-235)."""
    root = tiny_project
    snap0 = fit_dlc(dlcpath=root, maxiters=3, displayiters=1, saveiters=100,
                    tb_log=True)
    assert snap0 is not None and snap0.name == "snapshot-step0-final--0.ckpt"

    snap1 = fit_dgp_labeledonly(dlcpath=root, maxiters=2, displayiters=1,
                                saveiters=100, ns=2, n_max_frames=20,
                                nepoch=1, aug=False, tb_log=True)
    assert snap1.name == "snapshot-step1-final--0.ckpt"

    snap2 = fit_dgp(dlcpath=root, batch_size=3, maxiters=3, displayiters=1,
                    saveiters=100, ns=2, n_max_frames=20, nepoch=1,
                    aug=False, tb_log=True)
    assert snap2.name == "snapshot-step2-final--0.ckpt"

    # opt-in TensorBoard scalars: one event file per fit call, with
    # per-term loss tags (ref: train.py:131-133, fitdgp.py:128-130)
    log_dir = Path(root, "dlc-models/iteration-0/"
                   "SynthJan1-trainset95shuffle1", "train", "log")
    event_files = sorted(log_dir.glob("events.out.tfevents.*"))
    assert len(event_files) == 3
    assert all(f.stat().st_size > 100 for f in event_files)

    # idempotency: skip-if-done returns the existing final snapshot
    again = fit_dgp(dlcpath=root, batch_size=3, maxiters=3, ns=2,
                    n_max_frames=20, nepoch=1)
    assert again.name == "snapshot-step2-final--0.ckpt"

    stats = Path(root, "dlc-models/iteration-0/SynthJan1-trainset95shuffle1",
                 "train", "learning_stats.csv")
    assert stats.exists()


def test_dgp_train_step_bfloat16():
    """bf16 compute path: finite losses, params actually update, and the
    loss stays within a few percent of the f32 value on the same batch."""
    cfg = _small_cfg()
    nj = 3
    S0 = np.array([[1.0, -1.0, 0.0]])
    lp = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=6.0,
        n_hidden_frames_total=10.0, S0=S0, ws=np.array([2.0], np.float32),
        ws_max=np.array([50.0], np.float32))
    rng = np.random.default_rng(1)
    t = 3
    imgs = jnp.asarray(rng.uniform(0, 255, (t, 32, 32, 3)), jnp.float32)
    vis = np.zeros(t * nj, np.float32)
    vis[:nj] = 1
    batch = dict(
        targets=jnp.asarray(rng.uniform(0, 3, (t, nj, 2)), jnp.float32),
        visible_mask=jnp.asarray(vis),
        hidden_mask=jnp.asarray(1 - vis),
        frame_mask=jnp.ones(t),
        wt_batch=jnp.zeros(t - 1),
        pair_mask=jnp.ones(t - 1),
        flow=jnp.zeros((t - 1, 32, 32)))

    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32),
                                      dtype=dtype)
        tx = steps_lib.make_optimizer(0.005, clip_norm=10.0)
        opt_state = tx.init(variables["params"])
        step = steps_lib.make_dgp_train_step(model, lp, tx)
        before = np.asarray(
            jax.tree_util.tree_leaves(variables["params"])[0]).copy()
        variables, opt_state, out = step(variables, opt_state, imgs, batch)
        after = np.asarray(jax.tree_util.tree_leaves(variables["params"])[0])
        assert np.isfinite(float(out["total_loss"]))
        assert not np.array_equal(before, after)
        # params must stay f32 under mixed precision
        assert after.dtype == np.float32
        losses[dtype] = float(out["total_loss"])
    assert losses[jnp.bfloat16] == pytest.approx(losses[jnp.float32],
                                                 rel=0.05)


def test_mid_step_resume(synthetic_project, tmp_path):
    """Interrupted training resumes from the latest intermediate snapshot
    with its optimizer state (capability the reference lacks, SURVEY §5)."""
    import shutil

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.train.fit import fit_dgp, resolve_project

    root, _, _ = synthetic_project
    proj = tmp_path / "proj"
    shutil.copytree(root, proj)
    _, _, train_dir = resolve_project(proj, 1)
    for extra in Path(train_dir).glob("snapshot-*"):
        extra.unlink()

    # simulate an interrupted run: saveiters small so iteration snapshots
    # exist, then delete the finals to mimic a crash before completion
    fit_dgp(dlcpath=proj, batch_size=2, maxiters=4, displayiters=1,
            saveiters=2, nepoch=1, n_max_frames=10, aug=False)
    finals = list(Path(train_dir).glob("snapshot-step2-final--0.ckpt"))
    assert finals
    for f in finals:
        f.unlink()
    # drop intermediates past iteration 2 to mimic a crash at it=3
    for f in Path(train_dir).glob("snapshot-step2-*.ckpt"):
        m = f.stem.rsplit("-", 1)[-1]
        if m.isdigit() and int(m) > 2:
            f.unlink()
    inter = ckpt_lib.latest_intermediate_snapshot(train_dir, 2)
    assert inter is not None
    _, last_it = inter
    assert last_it == 2

    out = fit_dgp(dlcpath=proj, batch_size=2, maxiters=4, displayiters=1,
                  saveiters=2, nepoch=1, n_max_frames=10, aug=False)
    assert out is not None and out.exists()
    # the resumed run started after the snapshot iteration: steps.jsonl's
    # last entries begin at last_it + 1 (displayiters=1 writes each iter)
    import json

    lines = [json.loads(l) for l in
             (Path(train_dir) / "steps.jsonl").read_text().splitlines()]
    resumed_iters = [l["iteration"] for l in lines]
    assert any(i > last_it for i in resumed_iters)


def test_latest_snapshot_prefers_highest_step(tmp_path):
    from deepgraphpose_tpu.core import checkpoint as ckpt_lib

    variables = {"params": {"w": np.zeros(2, np.float32)}}
    for step in (0, 1, 2):
        ckpt_lib.save_snapshot(tmp_path, step, "final--0", variables)
        ckpt_lib.save_snapshot(tmp_path, step, 5, variables)
    latest = ckpt_lib.latest_snapshot(tmp_path)
    assert latest.name == "snapshot-step2-final--0.ckpt"
    latest1 = ckpt_lib.latest_snapshot(tmp_path, step=1)
    assert latest1.name == "snapshot-step1-final--0.ckpt"


def test_step0_scale_jitter_tracks_coords(synthetic_project):
    """The reference's per-sample scale jitter (pose_defaultdataset.py:
    132-135) inside the static canvas: sampled scales vary, shapes stay
    static, and the returned coords still point at the image content (the
    synthetic frames have a bright disc at every label)."""
    from deepgraphpose_tpu.train.fit import (_TrainLabeledImages,
                                             resolve_project)

    root, lab_idx, _ = synthetic_project
    proj, cfg, _ = resolve_project(root, 1)
    data = _TrainLabeledImages(proj, cfg, root, jitter=True)
    rng = np.random.default_rng(0)

    n = 8
    imgs, coords, present = data.batch([0] * n, rng=rng)
    assert imgs.shape == (n, *data.canvas_hw, 3)  # static canvas
    assert present.shape == coords.shape[:2]

    # jitter actually varies the scale: repeated samples of the same item
    # land the (present) joints at different places
    xs = coords[:, :, 0][present.reshape(n, -1)].reshape(n, -1)
    assert len(np.unique(np.round(xs[:, 0], 3))) >= 3

    # coords track the jittered content: a bright disc sits at every label
    hits = total = 0
    for k in range(n):
        for j in range(coords.shape[1]):
            if not present[k, j]:
                continue
            x, y = coords[k, j]
            x0, x1 = int(max(x - 5, 0)), int(min(x + 6, imgs.shape[2]))
            y0, y1 = int(max(y - 5, 0)), int(min(y + 6, imgs.shape[1]))
            total += 1
            if imgs[k, y0:y1, x0:x1].max() > 100:
                hits += 1
    assert total > 0 and hits == total, (hits, total)


def test_dataset_type_dispatch():
    """pose_cfg dataset_type dispatch (ref: dataset/factory.py:19-44):
    'deterministic' walks the labeled set in fixed cyclic order regardless
    of the rng; the default mode samples randomly."""
    from deepgraphpose_tpu.train.fit import _index_stream

    det = _index_stream(5, 3, True, np.random.default_rng(0))
    np.testing.assert_array_equal(next(det), [0, 1, 2])
    np.testing.assert_array_equal(next(det), [3, 4, 0])
    np.testing.assert_array_equal(next(det), [1, 2, 3])
    # rng-independent
    det2 = _index_stream(5, 3, True, np.random.default_rng(7))
    np.testing.assert_array_equal(next(det2), [0, 1, 2])

    rnd_a = _index_stream(100, 4, False, np.random.default_rng(0))
    rnd_b = _index_stream(100, 4, False, np.random.default_rng(0))
    a = [next(rnd_a) for _ in range(3)]
    b = [next(rnd_b) for _ in range(3)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
    assert len(np.unique(np.concatenate(a))) > 4  # actually random


def test_fit_dlc_honors_deterministic_dataset_type(tmp_path):
    """fit_dlc reads dataset_type from pose_cfg and runs the deterministic
    loader path end-to-end (jitter forced off, sequential order)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import make_synthetic_project

    from deepgraphpose_tpu.train.fit import fit_dlc

    root = str(tmp_path / "detproj")
    make_synthetic_project(root, n_frames=10, n_labeled=3, hw=(48, 64))
    cfg_path = Path(root, "dlc-models/iteration-0/"
                    "SynthJan1-trainset95shuffle1", "train", "pose_cfg.yaml")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["net_type"] = "mobilenet_v2_0.35"
    raw["dataset_type"] = "deterministic"
    cfg_path.write_text(yaml.safe_dump(raw))

    snap = fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100)
    assert snap is not None and snap.name == "snapshot-step0-final--0.ckpt"


def test_step0_jitter_off_is_deterministic(synthetic_project):
    from deepgraphpose_tpu.train.fit import (_TrainLabeledImages,
                                             resolve_project)

    root, _, _ = synthetic_project
    proj, cfg, _ = resolve_project(root, 1)
    data = _TrainLabeledImages(proj, cfg, root, jitter=False)
    a = data.batch([0, 1], rng=np.random.default_rng(0))
    b = data.batch([0, 1], rng=np.random.default_rng(1))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
