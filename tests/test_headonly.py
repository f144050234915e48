"""Head-only training on cached backbone features (train/headonly.py) —
the working redesign of the reference's dead preprocess/ pipeline
(ref: preprocess/run_pipeline.py, get_morig_prediction_layer.py)."""

import os
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(__file__))

from deepgraphpose_tpu.core.checkpoint import load_snapshot  # noqa: E402
from deepgraphpose_tpu.train import headonly  # noqa: E402
from deepgraphpose_tpu.train.fit import fit_dlc, resolve_project  # noqa: E402


def _make_proj(tmp_path, name):
    from conftest import make_synthetic_project

    root = str(tmp_path / name)
    make_synthetic_project(root, n_frames=12, n_labeled=4, hw=(48, 64))
    cfg_path = Path(root, "dlc-models/iteration-0/"
                    "SynthJan1-trainset95shuffle1", "train", "pose_cfg.yaml")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["net_type"] = "mobilenet_v2_0.35"
    raw["multi_step"] = [[0.002, 100000]]
    cfg_path.write_text(yaml.safe_dump(raw))
    return root


def test_features_tap_matches_heads_module():
    """Full-model heads == HeadsModule applied to the features tap with the
    same parameter subtrees (exact: identical math on identical inputs)."""
    from deepgraphpose_tpu.core.config import PoseConfig
    from deepgraphpose_tpu.models.pose_model import init_model

    cfg = PoseConfig(num_joints=3, net_type="mobilenet_v2_0.35")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 32, 32, 3), dtype=np.uint8))
    full = model.apply(variables, imgs, return_features=True)
    heads_model = headonly.HeadsModule(cfg)
    hp = {k: v for k, v in variables["params"].items()
          if k in headonly.HEAD_KEYS}
    ho = heads_model.apply({"params": hp}, full["features"])
    np.testing.assert_array_equal(np.asarray(full["part_pred"]),
                                  np.asarray(ho["part_pred"]))
    np.testing.assert_array_equal(np.asarray(full["locref"]),
                                  np.asarray(ho["locref"]))


def test_fit_dlc_heads_trains_heads_only(tmp_path, capsys):
    """fit_dlc_heads reduces the loss, leaves the backbone bit-identical,
    and writes a snapshot the full model loads."""
    root = _make_proj(tmp_path, "ho")
    fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
            bn_train=False, jitter=False)
    _, _, train_dir = resolve_project(root, 1)
    before, _ = load_snapshot(
        Path(train_dir) / "snapshot-step0-final--0.ckpt", None, None)

    snap = headonly.fit_dlc_heads(dlcpath=root, maxiters=60,
                                  displayiters=59, lr=0.005,
                                  debug="_heads")
    out = capsys.readouterr().out
    assert "training heads only" in out
    assert snap is not None and snap.exists()
    assert "heads" in snap.name

    after, _ = load_snapshot(snap, None, None)
    # backbone untouched
    for k in after["params"]:
        if k in headonly.HEAD_KEYS:
            continue
        for a, b in zip(
                jax.tree_util.tree_leaves(after["params"][k]),
                jax.tree_util.tree_leaves(before["params"][k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # heads moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for k in headonly.HEAD_KEYS
        for a, b in zip(jax.tree_util.tree_leaves(after["params"][k]),
                        jax.tree_util.tree_leaves(before["params"][k])))
    assert moved

    # loss at the end of the display stream decreased vs iter 0
    import re

    losses = [float(m) for m in re.findall(
        r"\[fit_dlc_heads\] iter \d+/\d+ loss ([\d.]+)", out)]
    assert len(losses) >= 2 and losses[-1] < losses[0]
