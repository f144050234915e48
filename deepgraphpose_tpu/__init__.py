"""deepgraphpose_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of DeepGraphPose.

A semi-supervised deep graphical model for animal pose tracking from video,
re-designed from scratch for TPU hardware: Flax ResNet backbones with deconv
scoremap / location-refinement heads, a fully jittable masked DGP objective
(network + spatial + temporal cliques over soft-argmax keypoints), streaming
batched video inference, and data-parallel training over a `jax.sharding.Mesh`.

Capability surface mirrors paninski-lab/deepgraphpose (see SURVEY.md):
the DLC project filestructure (config.yaml, labeled-data/, dlc-models/,
training-datasets/, videos_dgp/) is read and written natively.
"""

__version__ = "0.1.0"

from deepgraphpose_tpu.core.config import PoseConfig, ProjectConfig  # noqa: F401


# Lazy top-level API (mirrors the reference's `import deepgraphpose` /
# `import deeplabcut` surfaces without importing jax/cv2 at package import
# time). Resolved names are cached in module globals.
_LAZY_API = {
        # training pipeline (ref: deepgraphpose.models.fitdgp)
        "fit_dlc": ("deepgraphpose_tpu.train.fit", "fit_dlc"),
        "fit_dgp_labeledonly": ("deepgraphpose_tpu.train.fit",
                                "fit_dgp_labeledonly"),
        "fit_dgp": ("deepgraphpose_tpu.train.fit", "fit_dgp"),
        "fit_dlc_heads": ("deepgraphpose_tpu.train.headonly",
                          "fit_dlc_heads"),
        # inference / evaluation (ref: deepgraphpose.models.eval)
        "estimate_pose": ("deepgraphpose_tpu.infer.predict",
                          "estimate_pose"),
        "plot_dgp": ("deepgraphpose_tpu.infer.video_writer", "plot_dgp"),
        "evaluate_dgp": ("deepgraphpose_tpu.evaluation.metrics",
                         "evaluate_dgp"),
        # DLC-style toolbox (ref: deeplabcut top-level API)
        "create_new_project": ("deepgraphpose_tpu.project",
                               "create_new_project"),
        "add_new_videos": ("deepgraphpose_tpu.project", "add_new_videos"),
        "extract_frames": ("deepgraphpose_tpu.project", "extract_frames"),
        "create_training_dataset": ("deepgraphpose_tpu.project",
                                    "create_training_dataset"),
        "merge_datasets": ("deepgraphpose_tpu.project.refine",
                           "merge_datasets"),
        "mergeandsplit": ("deepgraphpose_tpu.project.refine",
                          "mergeandsplit"),
        "analyze_videos": ("deepgraphpose_tpu.infer.analyze",
                           "analyze_videos"),
        "analyze_time_lapse_frames": ("deepgraphpose_tpu.infer.analyze",
                                      "analyze_time_lapse_frames"),
        "evaluate_network": ("deepgraphpose_tpu.evaluation.metrics",
                             "evaluate_network"),
        "filterpredictions": ("deepgraphpose_tpu.evaluation.filtering",
                              "filterpredictions"),
        "extract_outlier_frames": ("deepgraphpose_tpu.evaluation.outliers",
                                   "extract_outlier_frames"),
        "analyzeskeleton": ("deepgraphpose_tpu.evaluation.skeleton",
                            "analyzeskeleton"),
        "plot_trajectories": ("deepgraphpose_tpu.infer.plotting",
                              "plot_trajectories"),
        "check_labels": ("deepgraphpose_tpu.infer.plotting", "check_labels"),
        # labeling UI (ref: deeplabcut.label_frames / refine_labels wx GUIs)
        "LabelServer": ("deepgraphpose_tpu.project.label_server",
                        "LabelServer"),
        "extract_save_all_maps": ("deepgraphpose_tpu.evaluation.maps",
                                  "extract_save_all_maps"),
        # raw training-dataset target inspection (ref: vis_dataset.py)
        "display_dataset": ("deepgraphpose_tpu.evaluation.maps",
                            "display_dataset"),
        # label-file hygiene (ref: trainingsetmanipulation.py:36-219)
        "compare_video_lists_and_data_folders": (
            "deepgraphpose_tpu.project",
            "compare_video_lists_and_data_folders"),
        "drop_duplicates_in_annotation_files": (
            "deepgraphpose_tpu.project",
            "drop_duplicates_in_annotation_files"),
        "drop_annotations_for_deleted_images": (
            "deepgraphpose_tpu.project",
            "drop_annotations_for_deleted_images"),
        "drop_unannotated_images": ("deepgraphpose_tpu.project",
                                    "drop_unannotated_images"),
        # conversion helpers (ref: utils/conversioncode.py; top-level
        # exports, DeepLabCut __init__.py:57)
        "convertcsv2h5": ("deepgraphpose_tpu.project.conversion",
                          "convertcsv2h5"),
        "convertannotationdata_fromwindows2unixstyle": (
            "deepgraphpose_tpu.project.conversion",
            "convertannotationdata_fromwindows2unixstyle"),
        "analyze_videos_converth5_to_csv": (
            "deepgraphpose_tpu.project.conversion",
            "analyze_videos_converth5_to_csv"),
        "merge_windowsannotationdataONlinuxsystem": (
            "deepgraphpose_tpu.project.conversion",
            "merge_windowsannotationdataONlinuxsystem"),
        # GUI-name counterparts (ref: DeepLabCut __init__.py:33-38 wx-only
        # exports; headless equivalents here)
        "select_crop_parameters": ("deepgraphpose_tpu.project",
                                   "crop_select"),
        "multiple_individual_labeling_toolbox": (
            "deepgraphpose_tpu.project", "multi_individual"),
        # 3-D (ref: deeplabcut pose_estimation_3d)
        "create_new_project_3d": ("deepgraphpose_tpu.threed",
                                  "create_new_project_3d"),
        "calibrate_cameras": ("deepgraphpose_tpu.threed",
                              "calibrate_cameras"),
        "triangulate": ("deepgraphpose_tpu.threed", "triangulate"),
        "create_labeled_video_3d": ("deepgraphpose_tpu.threed.plotting3d",
                                    "create_labeled_video_3d"),
}

# reference-spelled names (DeepLabCut __init__.py:30-58) — every name the
# reference exports resolves, so `import deepgraphpose_tpu as deeplabcut`
# runs reference project scripts (deepgraphpose_tpu/compat.py)
for _name in ("label_frames", "refine_labels", "launch_dlc",
              "train_network",
              "return_train_network_path", "return_evaluate_network_data",
              "load_demo_data", "create_pretrained_human_project",
              "create_training_model_comparison",
              "adddatasetstovideolistandviceversa", "check_undistortion",
              "comparevideolistsanddatafolders",
              "dropannotationfileentriesduetodeletedimages",
              "dropimagesduetolackofannotation",
              "dropduplicatesinannotatinfiles",
              "ShortenVideo", "DownSampleVideo", "create_labeled_video"):
    _LAZY_API[_name] = ("deepgraphpose_tpu.compat", _name)
del _name


def __getattr__(name):
    if name in _LAZY_API:
        import importlib

        module, attr = _LAZY_API[name]
        value = getattr(importlib.import_module(module), attr)
        globals()[name] = value  # cache: next access skips __getattr__
        return value
    raise AttributeError(f"module 'deepgraphpose_tpu' has no attribute "
                         f"{name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY_API))
