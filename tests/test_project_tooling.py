"""Project scaffolding workflow (ref capability surface:
create_new_project -> extract_frames -> [label] -> create_training_dataset),
modeled on DLC's examples/testscript.py with synthetic diagonal labels.
"""

from pathlib import Path

import numpy as np
import pytest

from deepgraphpose_tpu.core.config import ProjectConfig
from deepgraphpose_tpu.data import project as project_io
from deepgraphpose_tpu.project import (create_new_project,
                                       create_training_dataset,
                                       extract_frames, split_trials)
from deepgraphpose_tpu.project.extract import (select_frames_kmeans,
                                               select_frames_uniform)


@pytest.fixture(scope="module")
def source_video(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("srcvid")
    path = root / "mouse1.avi"
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 20.0,
                         (64, 48))
    rng = np.random.default_rng(3)
    for f in range(50):
        frame = rng.integers(0, 30, (48, 64, 3), dtype=np.uint8)
        cv2.circle(frame, (10 + f, 20), 4, (250, 250, 250), -1)
        wr.write(frame)
    wr.release()
    return path


@pytest.fixture(scope="module")
def project(tmp_path_factory, source_video):
    wd = tmp_path_factory.mktemp("projects")
    cfg_path = create_new_project("Testing", "alice", [str(source_video)],
                                  working_directory=str(wd),
                                  date="2026-08-16")
    return Path(cfg_path)


def test_create_new_project_layout(project):
    root = project.parent
    assert root.name == "Testing-alice-2026-08-16"
    for sub in ("videos", "labeled-data", "training-datasets", "dlc-models",
                "videos_dgp"):
        assert (root / sub).is_dir()
    proj = ProjectConfig.from_yaml(project)
    assert proj.Task == "Testing" and proj.scorer == "alice"
    assert proj.date == "Aug16"
    (key, spec), = proj.video_sets.items()
    assert key == "videos/mouse1.avi"
    assert spec["crop"] == "0, 64, 0, 48"
    assert (root / "videos" / "mouse1.avi").exists()


def test_frame_selection_algorithms(source_video):
    u = select_frames_uniform(50, 8, 0.0, 1.0)
    assert len(u) == 8 and u.min() >= 0 and u.max() < 50
    k = select_frames_kmeans(source_video, 5, 0.0, 1.0, step=2)
    assert 1 <= len(k) <= 5 and k.max() < 50


def test_extract_frames(project):
    proj = ProjectConfig.from_yaml(project)
    proj.numframes2pick = 6
    proj.to_yaml(project)
    out = extract_frames(project, algo="uniform")
    (idxs,) = out.values()
    pngs = sorted((project.parent / "labeled-data" / "mouse1").glob("*.png"))
    assert len(pngs) == len(idxs) == 6


def test_split_trials():
    tr, te = split_trials(20, 0.8, seed=0)
    assert len(tr) == 16 and len(te) == 4
    assert not set(tr) & set(te)
    assert sorted(set(tr) | set(te)) == list(range(20))


def test_create_training_dataset_roundtrip(project):
    root = project.parent
    proj = ProjectConfig.from_yaml(project)
    # synthesize diagonal labels for every extracted frame (testscript.py
    # style) with one NaN'd bodypart
    frames = sorted((root / "labeled-data" / "mouse1").glob("*.png"))
    nj = len(proj.bodyparts)
    coords = np.zeros((len(frames), nj, 2))
    for i in range(len(frames)):
        for j in range(nj):
            coords[i, j] = (5 + 3 * j + i, 4 + 2 * j)
    coords[0, -1] = np.nan
    labels = project_io.Labels(
        scorer=proj.scorer, bodyparts=list(proj.bodyparts),
        image_paths=[f"labeled-data/mouse1/{p.name}" for p in frames],
        coords_xy=coords)
    project_io.write_collected_data_csv(
        root / "labeled-data/mouse1" / f"CollectedData_{proj.scorer}.csv",
        labels)

    results = create_training_dataset(project, num_shuffles=1, seed=0)
    assert len(results) == 1
    frac, shuffle, n_train, n_test = results[0]
    assert n_train + n_test == len(frames)

    # the generated artifacts parse back through the data layer
    mat = next((root / "training-datasets").rglob("*.mat"))
    doc = next((root / "training-datasets").rglob("*.pickle"))
    ts = project_io.read_training_set(mat, doc)
    assert len(ts.image_paths) == n_train
    got = ts.coords_for(nj)
    # every stored joint matches the CSV labels (integerized)
    path_to_idx = {p: i for i, p in enumerate(labels.image_paths)}
    for i, p in enumerate(ts.image_paths):
        want = coords[path_to_idx[p]]
        finite = np.isfinite(got[i, :, 0])
        np.testing.assert_allclose(got[i][finite],
                                   np.floor(want[finite]), atol=0)

    # pose_cfg.yaml for train and test exist and point at the .mat
    pc = next((root / "dlc-models").rglob("train/pose_cfg.yaml"))
    from deepgraphpose_tpu.core.config import PoseConfig

    cfg = PoseConfig.from_yaml(pc)
    assert cfg.num_joints == nj
    assert (root / cfg.dataset).exists()
    assert (root / cfg.metadataset).exists()
    assert (pc.parent.parent / "test" / "pose_cfg.yaml").exists()
