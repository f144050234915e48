"""Refinement loop: accept machine labels, merge, frozen splits."""

from pathlib import Path

import numpy as np

from deepgraphpose_tpu.core.config import ProjectConfig
from deepgraphpose_tpu.data import project as project_io
from deepgraphpose_tpu.infer.export import write_pose_h5
from deepgraphpose_tpu.project.refine import (accept_machine_labels,
                                              merge_datasets, mergeandsplit)


def test_accept_machine_labels_and_merge(synthetic_project):
    root, lab_idx, _ = synthetic_project
    root = Path(root)
    vdir = root / "labeled-data" / "synthvid"
    proj = ProjectConfig.from_yaml(root / "config.yaml")
    before = project_io.read_labels(vdir, proj.scorer)
    n_before = len(before.image_paths)

    # machine predictions: 2 new frames + 1 already-labeled frame
    nj = len(proj.bodyparts)
    new_frames = [f"labeled-data/synthvid/img{900 + i:03d}.png"
                  for i in range(2)]
    dup = str(before.image_paths[0])
    lik = np.full((3, nj), 0.95)
    lik[1, 0] = 0.1  # low confidence -> NaN for that joint
    write_pose_h5(vdir / f"machinelabels-iter{proj.iteration}.h5", "m",
                  list(proj.bodyparts),
                  {"x": np.full((3, nj), 7.0), "y": np.full((3, nj), 9.0),
                   "likelihoods": lik},
                  index=new_frames + [dup])

    added = accept_machine_labels(root / "config.yaml", "synthvid",
                                  likelihood_cutoff=0.5)
    assert added == 2
    after = project_io.read_labels(vdir, proj.scorer)
    assert len(after.image_paths) == n_before + 2
    i = list(after.image_paths).index(new_frames[1])
    assert np.isnan(after.coords_xy[i, 0, 0])       # low-confidence joint
    np.testing.assert_allclose(after.coords_xy[i, 1], [7.0, 9.0])

    # idempotent: second accept adds nothing
    assert accept_machine_labels(root / "config.yaml", "synthvid",
                                 likelihood_cutoff=0.5) == 0

    # restore the original labels for other session-scoped tests
    project_io.write_collected_data_csv(
        vdir / f"CollectedData_{proj.scorer}.csv", before)


def test_merge_datasets_bumps_iteration(tmp_path, synthetic_project):
    root, _, _ = synthetic_project
    import shutil

    import yaml

    cfg = tmp_path / "config.yaml"
    shutil.copy(Path(root) / "config.yaml", cfg)
    it = merge_datasets(cfg)
    with open(cfg) as f:
        assert yaml.safe_load(f)["iteration"] == it == 1


def test_mergeandsplit_modes(synthetic_project):
    root, _, _ = synthetic_project
    cfg = Path(root) / "config.yaml"
    tr, te = mergeandsplit(cfg, uniform=True)
    assert not set(tr) & set(te)
    assert len(tr) + len(te) > 0
    tr2, te2 = mergeandsplit(cfg, trainindex=0, uniform=False)
    # single-video project: leave-one-out puts everything in test
    assert len(tr2) == 0 and len(te2) == len(tr) + len(te)
