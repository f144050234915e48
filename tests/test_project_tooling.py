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


def test_select_crop_parameters(tmp_path, monkeypatch):
    """Headless crop selection (ref: utils/select_crop_parameters.py):
    env / non-tty / browser resolution paths + the extract_frames(crop=True)
    config write-back (ref: frame_extraction.py:149-168)."""
    import json
    import urllib.request

    import numpy as np
    import yaml

    import deepgraphpose_tpu as dgp

    crop_select = dgp.select_crop_parameters
    img = np.zeros((60, 90, 3), np.uint8)

    monkeypatch.setenv("DGP_CROP", "5,80,6,50")
    assert crop_select.show(None, img) == [5, 80, 6, 50]
    monkeypatch.delenv("DGP_CROP")

    # non-interactive default: full frame, [x1, x2, y1, y2]
    assert crop_select.show(None, img) == [0, 90, 0, 60]

    # browser one-shot: GET the page, POST a rectangle; returns it clipped
    import threading
    import time
    out2 = {}

    def run2():
        out2["coords"] = crop_select._browser_select(img, port=8598,
                                                     timeout=10)

    t2 = threading.Thread(target=run2)
    t2.start()
    time.sleep(0.3)
    page = urllib.request.urlopen("http://127.0.0.1:8598/",
                                  timeout=5).read()
    assert b"frame.png" in page
    req = urllib.request.Request(
        "http://127.0.0.1:8598/api/crop",
        data=json.dumps({"x1": 3.2, "y1": 4.9, "x2": 200.0,
                         "y2": 30.0}).encode(), method="POST")
    urllib.request.urlopen(req, timeout=5)
    t2.join(10)
    assert out2["coords"] == [3, 90, 4, 30]  # x2 clipped to width

    # extract_frames(crop=True) with no stored crop resolves via $DGP_CROP
    # and writes the coords back into config.yaml
    from conftest import make_synthetic_project

    root, _, _ = make_synthetic_project(tmp_path / "proj")
    from pathlib import Path
    root = Path(root)
    cfg = yaml.safe_load((root / "config.yaml").read_text())
    vid_key = next(iter(cfg["video_sets"]))
    cfg["video_sets"][vid_key].pop("crop", None)
    (root / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))
    monkeypatch.setenv("DGP_CROP", "2,40,3,30")
    dgp.extract_frames(root / "config.yaml", crop=True)
    cfg2 = yaml.safe_load((root / "config.yaml").read_text())
    assert cfg2["video_sets"][vid_key]["crop"] == "2, 40, 3, 30"
    import cv2
    pngs = sorted((root / "labeled-data").rglob("img*.png"))
    im = cv2.imread(str(pngs[0]))
    assert im.shape[:2] == (27, 38)  # y: 3..30, x: 2..40


def test_multi_individual_labels(tmp_path):
    """4-level CollectedData (ref: multiple_individual_labeling_toolbox
    create_dataframe:620-641, saveDataSet:862-872): column order, CSV/H5
    twin, session merge."""
    import h5py
    import numpy as np

    from deepgraphpose_tpu.project import multi_individual as mi

    # column construction mirrors the reference: 'single' gets the unique
    # bodyparts, the others get the multi-animal bodyparts
    cols = mi.create_dataframe_columns(
        "Ann", ["single", "m1", "m2"], ["tailbase"], ["nose", "ear"])
    assert cols[:2] == [("Ann", "single", "tailbase", "x"),
                        ("Ann", "single", "tailbase", "y")]
    assert ("Ann", "m2", "ear", "y") == cols[-1]
    assert len(cols) == 2 * (1 + 2 + 2)

    imgs = ["labeled-data/v/img0.png", "labeled-data/v/img1.png"]
    lab = mi.MultiIndividualLabels.empty("Ann", ["single", "m1", "m2"],
                                         ["tailbase"], ["nose", "ear"], imgs)
    lab.set_label(imgs[0], "m1", "nose", 10.5, 20.25)
    lab.set_label(imgs[1], "single", "tailbase", 1.0, 2.0)
    out_csv = lab.save(tmp_path)
    back = mi.read_multi_individual_csv(out_csv)
    assert back.columns == lab.columns
    np.testing.assert_array_equal(
        np.isnan(back.values), np.isnan(lab.values))
    np.testing.assert_allclose(np.nan_to_num(back.values),
                               np.nan_to_num(lab.values))

    # h5 twin: pandas fixed format with 4 levels
    with h5py.File(tmp_path / "CollectedData_Ann.h5") as f:
        g = f["df_with_missing"]
        assert g.attrs["axis0_nlevels"] == 4
        assert [s.decode() for s in g["axis0_level1"][:]] == \
            ["single", "m1", "m2"]
        assert g["block0_values"].shape == (2, 10)

    # merge per-individual sessions written by the browser workflow
    import yaml

    proj = tmp_path / "proj"
    vdir = proj / "labeled-data" / "v"
    vdir.mkdir(parents=True)
    (proj / "config.yaml").write_text(yaml.safe_dump(dict(
        Task="t", scorer="Ann", individuals=["single", "m1"],
        uniquebodyparts=["tailbase"], multianimalbodyparts=["nose", "ear"],
        bodyparts=["nose", "ear"], video_sets={})))
    from deepgraphpose_tpu.data.project import Labels, write_collected_data

    write_collected_data(
        vdir / "CollectedData_Ann_idv_single",
        Labels("Ann_idv_single", ["tailbase"], ["labeled-data/v/img0.png"],
               np.array([[[7.0, 8.0]]])))
    write_collected_data(
        vdir / "CollectedData_Ann_idv_m1",
        Labels("Ann_idv_m1", ["nose", "ear"], ["labeled-data/v/img0.png"],
               np.array([[[1.0, 2.0], [3.0, 4.0]]])))
    merged = mi.merge_individual_sessions(proj / "config.yaml", "v")
    got = mi.read_multi_individual_csv(merged)
    ci = got.columns.index(("Ann", "m1", "ear", "x"))
    assert got.values[0, ci] == 3.0
    cs = got.columns.index(("Ann", "single", "tailbase", "y"))
    assert got.values[0, cs] == 8.0
    # session files cleaned up after merge
    assert not list(vdir.glob("*_idv_*"))


def test_launch_dlc_headless(capsys):
    """launch_dlc() without a config prints the guided workflow (the
    reference Welcome tab's function, ref: gui/launch_script.py)."""
    import deepgraphpose_tpu as dgp

    assert dgp.launch_dlc() is None
    out = capsys.readouterr().out
    assert "create_new_project" in out and "analyze_videos" in out


def test_extract_crop_writeback_null_video_entry(tmp_path, monkeypatch):
    """A YAML-null video_sets entry ("video:" with no mapping) reads back
    as None; the crop write-back must replace it, not TypeError
    (round-4 advisor finding)."""
    import yaml

    import deepgraphpose_tpu as dgp
    from conftest import make_synthetic_project

    root, _, _ = make_synthetic_project(tmp_path / "proj")
    root = Path(root)
    cfg = yaml.safe_load((root / "config.yaml").read_text())
    vid_key = next(iter(cfg["video_sets"]))
    cfg["video_sets"][vid_key] = None
    (root / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))
    monkeypatch.setenv("DGP_CROP", "2,40,3,30")
    dgp.extract_frames(root / "config.yaml", crop=True)
    cfg2 = yaml.safe_load((root / "config.yaml").read_text())
    assert cfg2["video_sets"][vid_key]["crop"] == "2, 40, 3, 30"


def test_extract_frames_manual_mode(tmp_path, monkeypatch):
    """mode='manual' (ref: frame_extraction.py:42-60 -> the wx
    frame_extraction_toolbox): $DGP_MANUAL_FRAMES scripted path and the
    browser scrub-and-grab UI both write labeled-data/<video>/img*.png
    with the automatic path's zero-padding."""
    import json
    import threading
    import time
    import urllib.request

    import deepgraphpose_tpu as dgp
    from conftest import make_synthetic_project

    root, _, _ = make_synthetic_project(tmp_path / "proj")
    root = Path(root)
    vdir = root / "labeled-data"
    import shutil
    for d in vdir.glob("*"):
        if d.is_dir():
            shutil.rmtree(d)

    # (a) scripted/CI path
    monkeypatch.setenv("DGP_MANUAL_FRAMES", "1,5,5,9")
    out = dgp.extract_frames(root / "config.yaml", mode="manual")
    monkeypatch.delenv("DGP_MANUAL_FRAMES")
    (vid, picked), = out.items()
    assert list(picked) == [1, 5, 9]
    stem = Path(vid).stem
    pngs = sorted((vdir / stem).glob("img*.png"))
    assert [p.name for p in pngs] == ["img01.png", "img05.png", "img09.png"]

    # (b) browser path: drive the HTTP UI like a user
    for p in pngs:
        p.unlink()
    res = {}

    def run():
        res["out"] = dgp.extract_frames(root / "config.yaml", mode="manual",
                                        port=8599, timeout=20)

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.5)
    base = "http://127.0.0.1:8599"
    page = urllib.request.urlopen(f"{base}/", timeout=5).read()
    assert b"Grab Frame" in page
    state = json.loads(urllib.request.urlopen(f"{base}/api/state",
                                              timeout=5).read())
    assert state["n_frames"] > 0 and state["grabbed"] == []
    png = urllib.request.urlopen(f"{base}/frame/2.png", timeout=5).read()
    assert png[:4] == b"\x89PNG"
    for i in (2, 7):
        req = urllib.request.Request(
            f"{base}/api/grab", data=json.dumps({"index": i}).encode(),
            method="POST")
        urllib.request.urlopen(req, timeout=5)
    req = urllib.request.Request(f"{base}/api/done", data=b"{}",
                                 method="POST")
    urllib.request.urlopen(req, timeout=5)
    t.join(20)
    assert list(res["out"][vid]) == [2, 7]
    assert sorted(p.name for p in (vdir / stem).glob("img*.png")) == [
        "img02.png", "img07.png"]
