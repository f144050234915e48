"""Multi-video DGP training (BASELINE config #4: videos_dgp set with
per-video hidden-frame sampling and skeleton constraints)."""

import shutil
from pathlib import Path

import numpy as np
import pytest

import sys

sys.path.insert(0, str(Path(__file__).parent))
from conftest import make_synthetic_project  # noqa: E402


@pytest.fixture(scope="module")
def two_video_project(tmp_path_factory):
    """Synthetic project with two videos, both labeled + in videos_dgp/."""
    import cv2
    import yaml

    from deepgraphpose_tpu.data import project as project_io

    root = str(tmp_path_factory.mktemp("mvproj"))
    make_synthetic_project(root, n_frames=40, n_labeled=6, hw=(64, 80))

    # second video: different motion pattern + its own labels
    rng = np.random.default_rng(7)
    h, w, n2, nj = 64, 80, 36, 3
    t = np.arange(n2)
    cx = (w / 2 + (w / 3) * np.cos(2 * np.pi * t[:, None] / 17
                                   + np.arange(nj))).astype(np.float64)
    cy = (h / 2 + (h / 3) * np.sin(2 * np.pi * t[:, None] / 13
                                   + np.arange(nj) * 2)).astype(np.float64)
    vpath = Path(root) / "videos" / "secondvid.avi"
    wr = cv2.VideoWriter(str(vpath), cv2.VideoWriter_fourcc(*"MJPG"), 20.0,
                         (w, h))
    for f in range(n2):
        frame = rng.integers(0, 40, (h, w, 3), dtype=np.uint8)
        for j in range(nj):
            cv2.circle(frame, (int(cx[f, j]), int(cy[f, j])), 4,
                       (240, 240, 240), -1)
        wr.write(frame)
    wr.release()
    shutil.copy(vpath, Path(root) / "videos_dgp" / "secondvid.avi")

    lab_idx = np.array([3, 12, 21, 30])
    (Path(root) / "labeled-data" / "secondvid").mkdir()
    coords = np.stack([cx[lab_idx], cy[lab_idx]], axis=-1)
    project_io.write_collected_data_csv(
        Path(root) / "labeled-data/secondvid/CollectedData_synth.csv",
        project_io.Labels(
            scorer="synth", bodyparts=[f"bp{i}" for i in range(nj)],
            image_paths=[f"labeled-data/secondvid/img{i:03d}.png"
                         for i in lab_idx],
            coords_xy=coords))

    cfg_path = Path(root) / "config.yaml"
    with open(cfg_path) as f:
        proj = yaml.safe_load(f)
    proj["video_sets"][f"videos/secondvid.avi"] = {"crop": f"0, {w}, 0, {h}"}
    with open(cfg_path, "w") as f:
        yaml.safe_dump(proj, f, sort_keys=False)
    return root


def test_multidataset_two_videos(two_video_project):
    from deepgraphpose_tpu.core.config import ProjectConfig
    from deepgraphpose_tpu.data.batcher import MultiDataset
    from deepgraphpose_tpu.train.fit import dgp_video_sets, resolve_project

    root = two_video_project
    proj, cfg, _ = resolve_project(root, 1)
    videos = dgp_video_sets(proj, root)
    assert len(videos) == 2

    # ns=1 keeps the label windows small enough that the short synthetic
    # videos still have uncovered high-motion frames to pick as hidden
    mds = MultiDataset(proj, cfg, videos, ns=1, n_max_frames=30)
    assert len(mds.datasets) == 2
    # per-video sampling ratios proportional to labeled-frame counts
    # (ref: dataset.py:867-871): synthvid has 6 labels, secondvid 4
    n_labels = {"synthvid": 6, "secondvid": 4}
    want = np.array([n_labels[Path(v).stem] for v in videos],
                    np.float64) / 10
    np.testing.assert_allclose(mds.batch_ratios, want, atol=1e-6)
    assert mds.n_visible_frames_total == 10
    assert all(len(d.hidden_frames) > 0 for d in mds.datasets)


def test_fit_dgp_two_videos(two_video_project):
    from deepgraphpose_tpu.data.batcher import generate_batch_schedule
    from deepgraphpose_tpu.train.fit import fit_dgp

    root = two_video_project
    final = fit_dgp(dlcpath=root, batch_size=3, maxiters=4, displayiters=1,
                    saveiters=100, nepoch=2, n_max_frames=16, aug=False)
    assert final is not None and final.exists()


def test_schedule_mixes_videos():
    from deepgraphpose_tpu.data.batcher import generate_batch_schedule

    vis = [np.array([5, 20]), np.array([8, 30])]
    hid = [np.arange(0, 40, 3), np.arange(1, 36, 3)]
    chunks = [np.sort(np.concatenate([v, h])) for v, h in zip(vis, hid)]
    sched = generate_batch_schedule(vis, hid, chunks, batch_size=4,
                                    n_times_all_frames=4, maxiters=100,
                                    seed=0)
    ds_ids = {ds for ds, _ in sched}
    assert ds_ids == {0, 1}
