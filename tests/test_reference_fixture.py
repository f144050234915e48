"""Integration against the real bundled Reaching-Mackenzie project.

The reference repo ships the fixture SURVEY §4 describes: 44 labeled PNGs,
CollectedData h5/csv, a prebuilt .mat training set + Documentation pickle,
and train/test pose_cfg.yaml. The videos are git-LFS-stripped, so only the
labeled-image paths (step 0 + evaluation) can run — which is exactly the
minimum end-to-end slice of SURVEY §7.

The training test compiles a 600x668 ResNet-50 on CPU (~minutes), so it is
gated behind RUN_SLOW=1; the loader-level checks always run.
"""

import os
import shutil
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def reaching_copy(reference_project_available, tmp_path):
    """Writable copy of the reference project (no videos needed)."""
    src = Path(reference_project_available)
    dst = tmp_path / "Reaching-Mackenzie-2018-08-30"
    shutil.copytree(src, dst,
                    ignore=shutil.ignore_patterns("*.avi", "*.mp4"))
    # the bundled config carries the original author's absolute path
    import yaml

    cfg = yaml.safe_load(open(dst / "config.yaml"))
    cfg["project_path"] = str(dst)
    yaml.safe_dump(cfg, open(dst / "config.yaml", "w"), sort_keys=False)
    return dst


def test_reaching_project_resolves(reaching_copy):
    from deepgraphpose_tpu.train.fit import _TrainLabeledImages, resolve_project

    proj, cfg, train_dir = resolve_project(reaching_copy, shuffle=1)
    assert proj.Task == "Reaching"
    assert cfg.num_joints == 5
    assert Path(train_dir).name == "train"

    data = _TrainLabeledImages(proj, cfg, reaching_copy)
    # 95% train split of 44 labeled frames -> 41 items in the .mat
    assert len(data) >= 40
    imgs, coords, present = data.batch(np.arange(4))
    assert imgs.shape[0] == 4 and imgs.shape[3] == 3
    assert coords.shape == (4, 5, 2)
    # labels live inside the (scaled) canvas
    scale = cfg.global_scale
    assert np.nanmax(coords[..., 0]) <= data.canvas_hw[1]
    assert np.nanmax(coords[..., 1]) <= data.canvas_hw[0]
    assert present.any()


def test_reaching_training_mat_roundtrip(reaching_copy):
    from deepgraphpose_tpu.data import project as project_io
    from deepgraphpose_tpu.train.fit import resolve_project

    _, cfg, _ = resolve_project(reaching_copy, shuffle=1)
    ts = project_io.read_training_set(
        reaching_copy / cfg.dataset, reaching_copy / cfg.metadataset)
    assert len(ts.image_paths) >= 40
    assert all(p.startswith("labeled-data/reachingvideo1") or
               "labeled-data" in p for p in ts.image_paths)
    coords = ts.coords_for(cfg.num_joints)
    finite = np.isfinite(coords)
    assert finite.any()
    # all joints inside the 747x832 (h x w) frames
    assert np.nanmax(coords[..., 0]) < 832
    assert np.nanmax(coords[..., 1]) < 747


def test_reaching_evaluation_split_has_test_frames(reaching_copy):
    """evaluate_dgp must score the FULL labeled table and carry a non-empty
    test split from the Documentation pickle (ref: eval.py:723-736) — the
    .mat alone holds train items only, which would make test RMSE NaN."""
    from deepgraphpose_tpu.evaluation.metrics import load_evaluation_entries
    from deepgraphpose_tpu.train.fit import resolve_project

    proj, cfg, _ = resolve_project(reaching_copy, shuffle=1)
    entries = load_evaluation_entries(Path(reaching_copy), proj, cfg)
    is_train = np.array([tr for _, _, tr in entries])
    assert len(entries) == 55          # full CollectedData table
    assert is_train.sum() == 52        # 95% split from the bundled pickle
    assert (~is_train).sum() == 3
    assert all(p.exists() for p, _, _ in entries)
    coords = np.stack([c for _, c, _ in entries])
    assert coords.shape == (55, 5, 2)
    assert np.isfinite(coords).any(axis=(1, 2)).all()


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="compiles a full-size ResNet-50 on CPU; set "
                           "RUN_SLOW=1 to run")
def test_reaching_fit_dlc_and_evaluate(reaching_copy):
    from deepgraphpose_tpu.evaluation.metrics import evaluate_dgp
    from deepgraphpose_tpu.train.fit import fit_dlc

    final = fit_dlc(dlcpath=reaching_copy, maxiters=2, displayiters=1,
                    saveiters=100)
    assert final is not None and final.exists()
    res = evaluate_dgp(reaching_copy / "config.yaml", final, shuffle=1)
    assert np.isfinite(res["train_error"])


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="full 4-step DGP pipeline at real resolution on "
                           "CPU; set RUN_SLOW=1 to run")
def test_reaching_full_pipeline_with_synthesized_video(reaching_copy):
    """The de-facto integration test of the reference (`run_dgp_demo --test`,
    SURVEY §4) on the real project. The bundled videos are LFS-stripped, so
    a stand-in video is synthesized from the 44 labeled full-res PNGs at
    their original frame indices (img<NNN>.png -> frame NNN), keeping the
    label <-> frame mapping intact."""
    import subprocess
    import sys

    import cv2

    vdir = reaching_copy / "labeled-data" / "reachingvideo1"
    pngs = {int("".join(c for c in p.stem if c.isdigit())): p
            for p in vdir.glob("img*.png")}
    n_frames = max(pngs) + 3
    first = cv2.imread(str(pngs[min(pngs)]))
    h, w = first.shape[:2]
    for out_dir in ("videos", "videos_dgp"):
        (reaching_copy / out_dir).mkdir(exist_ok=True)
    wr = cv2.VideoWriter(
        str(reaching_copy / "videos" / "reachingvideo1.avi"),
        cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w, h))
    cur = first
    for i in range(n_frames):
        if i in pngs:
            cur = cv2.imread(str(pngs[i]))
        wr.write(cur)
    wr.release()
    shutil.copy(reaching_copy / "videos" / "reachingvideo1.avi",
                reaching_copy / "videos_dgp" / "reachingvideo1.avi")

    repo = Path(__file__).parent.parent
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=f"{repo}:{os.environ.get('PYTHONPATH', '')}")
    proc = subprocess.run(
        [sys.executable, str(repo / "demo" / "run_dgp_demo.py"),
         "--dlcpath", str(reaching_copy), "--test"],
        env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    train_dir = next(reaching_copy.glob(
        "dlc-models/iteration-0/*/train"))
    for step in (0, 1, 2):
        assert (train_dir / f"snapshot-step{step}-final--0.ckpt").exists()
    pred = reaching_copy / "videos_pred"
    assert (pred / "reachingvideo1.csv").exists()
    labeled = pred / "reachingvideo1_labeled.mp4"
    assert labeled.exists()
    cap = cv2.VideoCapture(str(labeled))
    n_out = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    ok, _ = cap.read()
    cap.release()
    assert ok and n_out > 0, f"labeled video unreadable ({n_out} frames)"
