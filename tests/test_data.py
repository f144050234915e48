"""Data-layer tests: project IO, video IO, hidden-frame selection, batcher."""

import numpy as np
import pytest

from deepgraphpose_tpu.core.config import PoseConfig, ProjectConfig
from deepgraphpose_tpu.data import project as project_io
from deepgraphpose_tpu.data.batcher import (
    MultiDataset, VideoDataset, assemble_batch, generate_batch_schedule,
    xy_to_scoremap, scoremap_to_xy)
from deepgraphpose_tpu.data.hidden import neighboring_window, select_hidden_frames
from deepgraphpose_tpu.data.video import FrameCache, VideoReader, motion_energy


# ---------------------------------------------------------------- project IO

def test_read_reference_labels_csv(reference_project_available):
    labels = project_io.read_labels(
        reference_project_available + "/labeled-data/reachingvideo1",
        "Mackenzie")
    assert labels.bodyparts == ["Hand", "Finger1", "Tongue", "Joystick1",
                                "Joystick2"]
    assert labels.coords_xy.shape[1:] == (5, 2)
    assert len(labels.image_paths) == labels.coords_xy.shape[0]
    # Tongue is frequently unlabeled -> NaNs must be preserved
    assert np.isnan(labels.coords_xy[:, 2]).any()
    idx = labels.frame_indices
    assert (idx >= 0).all()


def test_read_reference_training_mat(reference_project_available):
    base = (reference_project_available +
            "/training-datasets/iteration-0/UnaugmentedDataSet_ReachingAug30/")
    ts = project_io.read_training_set(
        base + "Reaching_Mackenzie95shuffle1.mat",
        base + "Documentation_data-Reaching_95shuffle1.pickle")
    assert len(ts.image_paths) == 52
    assert ts.sizes.shape == (52, 3)
    # indices index the FULL labels table (55 frames): 52 train + 3 test;
    # the .mat holds only the 52 train items
    assert len(ts.train_indices) == 52
    assert len(ts.test_indices) == 3
    assert ts.train_fraction == pytest.approx(0.95)
    coords = ts.coords_for(5)
    assert coords.shape == (52, 5, 2)
    # joints format is [id, x, y]; absent joints stay NaN
    assert np.isnan(coords).any()
    assert np.nanmax(coords) > 100


def test_csv_roundtrip(tmp_path, rng):
    coords = rng.uniform(0, 100, (4, 3, 2))
    coords[1, 2] = np.nan
    labels = project_io.Labels(
        scorer="s", bodyparts=["a", "b", "c"],
        image_paths=[f"labeled-data/v/img{i:03d}.png" for i in range(4)],
        coords_xy=coords)
    p = tmp_path / "CollectedData_s.csv"
    project_io.write_collected_data_csv(p, labels)
    back = project_io.read_collected_data_csv(p)
    assert back.scorer == "s"
    assert back.bodyparts == ["a", "b", "c"]
    np.testing.assert_allclose(back.coords_xy, coords, equal_nan=True)


def test_training_mat_roundtrip(tmp_path):
    joints = [np.array([[0, 10.0, 20.0], [1, 30.0, 40.0]]),
              np.array([[1, 5.0, 6.0]])]
    project_io.write_training_mat(
        tmp_path / "d.mat", ["labeled-data/v/img000.png",
                             "labeled-data/v/img001.png"],
        np.array([[3, 64, 80], [3, 64, 80]]), joints)
    ts = project_io.read_training_mat(tmp_path / "d.mat")
    assert ts.image_paths[0].endswith("img000.png")
    coords = ts.coords_for(2)
    np.testing.assert_allclose(coords[0, 0], [10, 20])
    np.testing.assert_allclose(coords[1, 1], [5, 6])
    assert np.isnan(coords[1, 0]).all()


# ---------------------------------------------------------------- video IO

def test_video_reader_and_cache(synthetic_project):
    root, lab_idx, _ = synthetic_project
    rd = VideoReader(root + "/videos/synthvid.avi")
    assert rd.n_frames == 40
    f5 = rd.read_frame(5)
    assert f5.shape == (64, 80, 3)
    batch = rd.read_frames([3, 1, 7])
    assert batch.shape == (3, 64, 80, 3)
    np.testing.assert_array_equal(batch[2], rd.read_frame(7))

    cache = FrameCache(rd, [1, 3, 7])
    assert 3 in cache and 2 not in cache
    # JPEG roundtrip is lossy; frames must still be close
    c7 = cache.get(7).astype(np.int32)
    direct = rd.read_frame(7).astype(np.int32)
    assert np.abs(c7 - direct).mean() < 8
    rd.close()


def test_motion_energy_finds_motion(synthetic_project):
    root, _, _ = synthetic_project
    me = motion_energy(root + "/videos/synthvid.avi", resize_to=None)
    assert len(me) == 40
    assert me[0] == 0.0
    assert me[1:].mean() > 0


# ------------------------------------------------------- hidden-frame select

def test_neighboring_window():
    win = neighboring_window(np.array([5]), 2, 40)
    np.testing.assert_array_equal(win, [3, 4, 5, 6, 7])
    win = neighboring_window(np.array([0, 39]), 2, 40)
    np.testing.assert_array_equal(win, [0, 1, 2, 37, 38, 39])


def test_select_hidden_respects_visible_window():
    visible = np.array([10])
    rank = np.array([11, 9, 10, 30, 20, 5])  # by descending motion energy
    got = select_hidden_frames(visible, rank, 40, ns=2, n_max_frames=40)
    # 9,10,11 are inside the +/-3 window around 10 -> excluded
    assert 10 not in got and 9 not in got and 11 not in got
    assert 30 in got and 20 in got


def test_select_hidden_caps_total_frames():
    visible = np.array([0])
    rank = np.arange(100)[::-1]
    got = select_hidden_frames(visible, rank, 100, ns=5, n_max_frames=25)
    covered = neighboring_window(np.concatenate([visible, got]), 5, 100)
    assert len(covered) <= 25


# ---------------------------------------------------------------- batcher

def _pose_cfg(nj=3):
    return PoseConfig(num_joints=nj, net_type="resnet_50", pos_dist_thresh=9)


def test_coord_conversions_roundtrip(rng):
    xy = rng.uniform(0, 100, (4, 3, 2))
    rc = xy_to_scoremap(xy, 8.0)
    back = scoremap_to_xy(rc, 8.0)
    np.testing.assert_allclose(back, xy, rtol=1e-6)


@pytest.fixture(scope="module")
def video_ds(synthetic_project):
    root, lab_idx, coords = synthetic_project
    labels = project_io.read_labels(root + "/labeled-data/synthvid", "synth")
    return VideoDataset(root + "/videos/synthvid.avi", _pose_cfg(),
                        labels, lab_idx, ns=2, n_max_frames=40,
                        cache_dir=None), lab_idx, coords


def test_video_dataset_structure(video_ds):
    ds, lab_idx, coords = video_ds
    np.testing.assert_array_equal(ds.visible_frames, sorted(lab_idx))
    assert ds.nx_out == 8 and ds.ny_out == 10  # 64x80 / 8
    assert len(ds.hidden_frames) > 0
    assert not np.intersect1d(ds.hidden_frames, ds.visible_frames).size
    # chunk covers visible and hidden
    assert np.isin(ds.visible_frames, ds.chunk).all()
    assert np.isin(ds.hidden_frames, ds.chunk).all()


def test_assemble_batch_masks(video_ds):
    ds, lab_idx, _ = video_ds
    vis = ds.visible_frames[:1]
    hid = ds.hidden_frames[:2]
    b = assemble_batch(ds, vis, hid, pad_to=5)
    assert b.images.shape == (5, 64, 80, 3)
    assert b.targets.shape == (5, 3, 2)
    assert b.frame_mask.sum() == 3
    nj = 3
    # one visible frame => nj visible markers (labels have no NaN here)
    assert b.visible_mask.sum() == nj
    assert b.hidden_mask.sum() == 2 * nj  # hidden frames only; pads excluded
    assert b.visible_mask.shape == (5 * nj,)
    # padded frames contribute no markers
    assert b.visible_mask[3 * nj:].sum() == 0
    assert b.hidden_mask[3 * nj:].sum() == 0


def test_assemble_batch_label_accuracy(video_ds):
    ds, lab_idx, coords = video_ds
    f = ds.visible_frames[0]
    b = assemble_batch(ds, [f], [], pad_to=2)
    k = np.where(b.frames == f)[0][0]
    xy = scoremap_to_xy(b.targets[k], 8.0)
    want = ds.labels_xy[0]
    np.testing.assert_allclose(xy, want, atol=1e-4)


def test_pair_mask_consecutive_only(video_ds):
    ds, _, _ = video_ds
    f = int(ds.chunk[0])
    b = assemble_batch(ds, [], [f, f + 1, f + 3], pad_to=4)
    np.testing.assert_array_equal(b.pair_mask, [1, 0, 0])


def test_generate_batch_schedule_windows():
    vis = [np.array([4, 10])]
    hid = [np.array([20])]
    chunk = [np.arange(0, 30)]
    sched = generate_batch_schedule(vis, hid, chunk, batch_size=5,
                                    n_times_all_frames=2, maxiters=100, seed=0)
    assert len(sched) > 0
    for ds_i, frames in sched:
        assert ds_i == 0
        assert len(frames) == 5
        assert (np.diff(frames) > 0).all()


def test_multidataset(synthetic_project):
    root, lab_idx, _ = synthetic_project
    proj = ProjectConfig.from_yaml(root + "/config.yaml")
    mds = MultiDataset(proj, _pose_cfg(), [root + "/videos/synthvid.avi"],
                       ns=2, n_max_frames=40)
    assert mds.n_visible_frames_total == len(lab_idx)
    assert mds.n_hidden_frames_total > 0
    assert mds.n_frames_total >= mds.n_visible_frames_total
    assert mds.batch_ratios[0] == 1.0
