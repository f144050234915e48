"""Config + path-layout tests, including parity with the bundled reference
project (read-only fixture)."""

import numpy as np

from deepgraphpose_tpu.core.config import PoseConfig, ProjectConfig
from deepgraphpose_tpu.core import paths


def test_pose_config_defaults():
    cfg = PoseConfig()
    assert cfg.stride == 8.0
    assert cfg.locref_stdev == 7.2801
    assert cfg.mean_pixel == (123.68, 116.779, 103.939)
    assert abs(cfg.locref_scale - 1 / 7.2801) < 1e-9


def test_pose_config_roundtrip(tmp_path):
    cfg = PoseConfig(num_joints=5, net_type="resnet_50",
                     extra={"custom_key": 42})
    p = tmp_path / "pose_cfg.yaml"
    cfg.to_yaml(p)
    cfg2 = PoseConfig.from_yaml(p)
    assert cfg2.num_joints == 5
    assert cfg2.extra["custom_key"] == 42


def test_load_reference_pose_cfg(reference_project_available):
    p = (reference_project_available +
         "/dlc-models/iteration-0/ReachingAug30-trainset95shuffle1/train/pose_cfg.yaml")
    cfg = PoseConfig.from_yaml(p)
    assert cfg.num_joints == 5
    assert cfg.all_joints_names == ["Hand", "Finger1", "Tongue",
                                    "Joystick1", "Joystick2"]
    assert cfg.pos_dist_thresh == 17
    assert cfg.global_scale == 0.8
    assert cfg.net_type == "resnet_50"


def test_load_reference_project_config(reference_project_available):
    cfg = ProjectConfig.from_yaml(reference_project_available + "/config.yaml")
    assert cfg.Task == "Reaching"
    assert cfg.scorer == "Mackenzie"
    assert len(cfg.bodyparts) == 5
    S0 = cfg.skeleton_incidence()
    assert S0.shape == (2, 5)
    np.testing.assert_array_equal(S0[0], [1, -1, 0, 0, 0])
    np.testing.assert_array_equal(S0[1], [0, 0, 0, 1, -1])


def test_model_folder_layout():
    cfg = ProjectConfig(Task="Reaching", date="Aug30", iteration=0)
    assert str(paths.model_folder(0.95, 1, cfg)) == (
        "dlc-models/iteration-0/ReachingAug30-trainset95shuffle1")
    assert str(paths.training_set_folder(cfg)) == (
        "training-datasets/iteration-0/UnaugmentedDataSet_ReachingAug30")


def test_snapshot_naming_contract():
    assert paths.snapshot_name(2, 100) == "snapshot-step2-100"
    assert paths.final_snapshot_name(1) == "snapshot-step1-final--0"


def test_data_metadata_filenames():
    cfg = ProjectConfig(Task="Reaching", scorer="Mackenzie", date="Aug30")
    tsf = paths.training_set_folder(cfg)
    datafn, metafn = paths.data_and_metadata_filenames(tsf, 0.95, 1, cfg)
    assert datafn.endswith("Reaching_Mackenzie95shuffle1.mat")
    assert metafn.endswith("Documentation_data-Reaching_95shuffle1.pickle")


def test_orbax_snapshot_roundtrip(tmp_path):
    """Optional Orbax backend mirrors the msgpack snapshot payloads."""
    import numpy as np

    pytest_orbax = __import__("pytest")
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest_orbax.skip("orbax not available")

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib

    variables = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                 "batch_stats": {"m": np.ones(3, np.float32)}}
    opt_state = {"momentum": np.full(3, 0.5, np.float32)}
    path = ckpt_lib.save_snapshot_orbax(tmp_path, 2, 7, variables, opt_state)
    assert path.name == "snapshot-step2-7.orbax"
    got_vars, got_opt = ckpt_lib.load_snapshot_orbax(path, variables,
                                                     opt_state)
    np.testing.assert_array_equal(got_vars["params"]["w"],
                                  variables["params"]["w"])
    np.testing.assert_array_equal(got_opt["momentum"],
                                  opt_state["momentum"])
