"""CollectedData .h5 twin (pandas fixed-format via h5py) + conversioncode
parity (ref: utils/conversioncode.py; gui save paths write .csv/.h5 pairs)."""

import os
import sys

import h5py
import numpy as np
import pytest

from deepgraphpose_tpu.data import project as project_io

sys.path.insert(0, os.path.dirname(__file__))


def _labels(n=4, nj=3):
    rng = np.random.default_rng(0)
    coords = rng.uniform(5, 50, (n, nj, 2))
    coords[1, 2] = np.nan  # hidden marker
    return project_io.Labels(
        scorer="alice", bodyparts=[f"bp{i}" for i in range(nj)],
        image_paths=[f"labeled-data/vid/img{i:03d}.png" for i in range(n)],
        coords_xy=coords)


def test_collected_data_h5_roundtrip(tmp_path):
    labels = _labels()
    p = tmp_path / "CollectedData_alice.h5"
    project_io.write_collected_data_h5(p, labels)
    back = project_io.read_collected_data_h5(p)
    assert back.scorer == "alice"
    assert back.bodyparts == labels.bodyparts
    assert back.image_paths == labels.image_paths
    np.testing.assert_allclose(back.coords_xy, labels.coords_xy)


def test_collected_data_h5_pandas_fixed_layout(tmp_path):
    """The on-disk layout carries the attrs pandas' fixed-format reader
    requires (pandas.io.pytables BlockManagerFixed.read): group attrs,
    3-level MultiIndex level/label arrays, transposed block values."""
    labels = _labels()
    p = tmp_path / "CollectedData_alice.h5"
    project_io.write_collected_data_h5(p, labels)
    with h5py.File(p, "r") as f:
        g = f["df_with_missing"]
        assert g.attrs["pandas_type"] == b"frame"
        assert g.attrs["axis0_variety"] == b"multi"
        assert int(g.attrs["axis0_nlevels"]) == 3
        assert int(g.attrs["nblocks"]) == 1
        assert g.attrs["axis1_variety"] == b"regular"
        # block0_items mirrors axis0 (pandas reads both)
        for prefix in ("axis0", "block0_items"):
            assert [x.decode() for x in g[f"{prefix}_level0"]] == ["alice"]
            assert [x.decode() for x in g[f"{prefix}_level1"]] \
                == labels.bodyparts
            assert [x.decode() for x in g[f"{prefix}_level2"]] == ["x", "y"]
            assert g[f"{prefix}_label1"][()].tolist() == [0, 0, 1, 1, 2, 2]
        assert g["axis1"].attrs["kind"] == b"string"
        # values stored (n_rows, n_cols) with transposed=True, exactly how
        # pandas write_array stores blk.values.T
        assert bool(g["block0_values"].attrs["transposed"]) is True
        assert g["block0_values"].shape == (4, 6)


def test_write_collected_data_pair_agree(tmp_path):
    labels = _labels()
    project_io.write_collected_data(tmp_path / "CollectedData_alice", labels)
    a = project_io.read_collected_data_csv(tmp_path / "CollectedData_alice.csv")
    b = project_io.read_collected_data_h5(tmp_path / "CollectedData_alice.h5")
    np.testing.assert_allclose(a.coords_xy, b.coords_xy)
    assert a.image_paths == b.image_paths


@pytest.fixture()
def conv_project(tmp_path):
    from conftest import make_synthetic_project

    root = str(tmp_path / "proj")
    make_synthetic_project(root, n_frames=20, n_labeled=3, hw=(48, 64))
    return root


def test_convertcsv2h5(conv_project):
    from deepgraphpose_tpu.project.conversion import convertcsv2h5

    n = convertcsv2h5(os.path.join(conv_project, "config.yaml"))
    assert n == 1
    h5 = os.path.join(conv_project, "labeled-data", "synthvid",
                      "CollectedData_synth.h5")
    back = project_io.read_collected_data_h5(h5)
    csv = project_io.read_collected_data_csv(h5.replace(".h5", ".csv"))
    np.testing.assert_allclose(back.coords_xy, csv.coords_xy)


def test_convertcsv2h5_scorer_rename(conv_project):
    from deepgraphpose_tpu.project.conversion import convertcsv2h5

    convertcsv2h5(os.path.join(conv_project, "config.yaml"), scorer="bob")
    # file names keep the config scorer (reference behavior); content
    # carries the new annotator
    csv = project_io.read_collected_data_csv(
        os.path.join(conv_project, "labeled-data", "synthvid",
                     "CollectedData_synth.csv"))
    assert csv.scorer == "bob"


def test_windows2unix_conversion(conv_project):
    from deepgraphpose_tpu.project.conversion import (
        convertannotationdata_fromwindows2unixstyle, pathmagic)

    assert pathmagic(r"labeled-data\vid\img001.png") \
        == "labeled-data/vid/img001.png"
    assert pathmagic("labeled-data/vid/img001.png") \
        == "labeled-data/vid/img001.png"

    vdir = os.path.join(conv_project, "labeled-data", "synthvid")
    labels = project_io.read_labels(vdir, "synth")
    labels.image_paths = [p.replace("/", "\\") for p in labels.image_paths]
    project_io.write_collected_data_csv(
        os.path.join(vdir, "CollectedData_synth.csv"), labels)

    n = convertannotationdata_fromwindows2unixstyle(
        os.path.join(conv_project, "config.yaml"))
    assert n == 1
    back = project_io.read_labels(vdir, "synth")
    assert all("\\" not in p for p in back.image_paths)
    assert all(p.startswith("labeled-data/synthvid/")
               for p in back.image_paths)
    # originals backed up under the 'windows' suffix, both formats
    assert os.path.exists(os.path.join(vdir,
                                       "CollectedData_synthwindows.csv"))
    assert os.path.exists(os.path.join(vdir,
                                       "CollectedData_synthwindows.h5"))


def test_analyze_videos_converth5_to_csv(tmp_path):
    from deepgraphpose_tpu.infer.export import (load_pose_from_dlc,
                                                write_pose_h5)
    from deepgraphpose_tpu.project.conversion import \
        analyze_videos_converth5_to_csv

    rng = np.random.default_rng(1)
    labels = dict(x=rng.uniform(0, 64, (7, 3)),
                  y=rng.uniform(0, 48, (7, 3)),
                  likelihoods=rng.uniform(0, 1, (7, 3)))
    (tmp_path / "myvid.avi").write_bytes(b"stub")
    write_pose_h5(tmp_path / "myvidDGP_resnet50.h5", "DGP_resnet50",
                  ["a", "b", "c"], labels)
    n = analyze_videos_converth5_to_csv(tmp_path)
    assert n == 1
    back = load_pose_from_dlc(str(tmp_path / "myvidDGP_resnet50.csv"))
    np.testing.assert_allclose(back["x"], labels["x"])
    np.testing.assert_allclose(back["likelihoods"], labels["likelihoods"])


def test_merge_windows_annotationdata(conv_project):
    from deepgraphpose_tpu.project.conversion import \
        merge_windowsannotationdataONlinuxsystem

    merged = merge_windowsannotationdataONlinuxsystem(
        dict(project_path=conv_project, scorer="synth"))
    assert merged is not None and len(merged.image_paths) == 3


def test_label_server_save_writes_h5_twin(conv_project):
    from pathlib import Path

    from deepgraphpose_tpu.project.label_server import _State

    sess = _State(Path(conv_project), "synthvid", "synth",
                  [f"bp{i}" for i in range(3)])
    out = sess.save()
    assert out.exists()
    twin = out.with_suffix(".h5")
    assert twin.exists()
    a = project_io.read_collected_data_csv(out)
    b = project_io.read_collected_data_h5(twin)
    np.testing.assert_allclose(np.asarray(a.coords_xy),
                               np.asarray(b.coords_xy))
