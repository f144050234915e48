"""Label-file hygiene utilities over a disposable project copy."""

import shutil
from pathlib import Path

import numpy as np
import pytest

from deepgraphpose_tpu.core.config import ProjectConfig
from deepgraphpose_tpu.data import project as project_io
from deepgraphpose_tpu.project.hygiene import (
    compare_video_lists_and_data_folders,
    drop_annotations_for_deleted_images, drop_duplicates_in_annotation_files,
    drop_unannotated_images)


@pytest.fixture()
def proj_copy(synthetic_project, tmp_path):
    root, _, _ = synthetic_project
    dst = tmp_path / "proj"
    shutil.copytree(root, dst)
    import yaml

    cfg = yaml.safe_load(open(dst / "config.yaml"))
    cfg["project_path"] = str(dst)
    yaml.safe_dump(cfg, open(dst / "config.yaml", "w"), sort_keys=False)
    return dst


def test_compare_lists(proj_copy):
    (proj_copy / "labeled-data" / "ghostvid").mkdir()
    report = compare_video_lists_and_data_folders(proj_copy / "config.yaml")
    assert "ghostvid" in report["folders_without_videos"]
    assert report["videos_without_folders"] == []


def test_drop_duplicates(proj_copy):
    proj = ProjectConfig.from_yaml(proj_copy / "config.yaml")
    vdir = proj_copy / "labeled-data" / "synthvid"
    labels = project_io.read_labels(vdir, proj.scorer)
    dup = project_io.Labels(
        scorer=proj.scorer, bodyparts=list(labels.bodyparts),
        image_paths=list(labels.image_paths) + [labels.image_paths[0]],
        coords_xy=np.concatenate([labels.coords_xy,
                                  labels.coords_xy[:1] + 99]))
    project_io.write_collected_data_csv(
        vdir / f"CollectedData_{proj.scorer}.csv", dup)

    assert drop_duplicates_in_annotation_files(proj_copy / "config.yaml") == 1
    after = project_io.read_labels(vdir, proj.scorer)
    assert len(after.image_paths) == len(labels.image_paths)
    # first occurrence kept
    np.testing.assert_allclose(after.coords_xy[0], labels.coords_xy[0])


def test_drop_deleted_and_unannotated(proj_copy):
    proj = ProjectConfig.from_yaml(proj_copy / "config.yaml")
    vdir = proj_copy / "labeled-data" / "synthvid"
    labels = project_io.read_labels(vdir, proj.scorer)
    # delete one labeled image from disk
    (proj_copy / labels.image_paths[0]).unlink()
    assert drop_annotations_for_deleted_images(
        proj_copy / "config.yaml") == 1
    after = project_io.read_labels(vdir, proj.scorer)
    assert len(after.image_paths) == len(labels.image_paths) - 1

    # add an orphan PNG with no label row
    orphan = vdir / "img999.png"
    orphan.write_bytes((proj_copy / after.image_paths[0]).read_bytes())
    found = drop_unannotated_images(proj_copy / "config.yaml", delete=False)
    assert orphan in found and orphan.exists()
    drop_unannotated_images(proj_copy / "config.yaml", delete=True)
    assert not orphan.exists()
