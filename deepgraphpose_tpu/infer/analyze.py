"""DLC-style ``analyze_videos``: scorer-named trajectory export.

ref: deeplabcut/pose_estimation_tensorflow/predict_videos.py:35-526
(analyze_videos / AnalyzeVideo) and utils/auxiliaryfunctions.py:349-378
(GetScorerName) / 251-262 (SaveData). Where the reference runs numpy- or
in-graph TF decoding per batch (GetPoseF/GetPoseS/GetPoseF_GTF), this rides
the package's batched streaming TPU inference (infer.predict.estimate_pose).

Output contract per video (destfolder defaults to the video's directory):
  <vname><DLCscorer>.h5               pandas DF, MultiIndex (scorer,
                                      bodyparts, [x, y, likelihood])
  <vname><DLCscorer>.csv              if save_as_csv
  <vname><DLCscorer>includingmetadata.pickle
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import numpy as np

from deepgraphpose_tpu.core import checkpoint as ckpt_lib
from deepgraphpose_tpu.core import paths as paths_lib
from deepgraphpose_tpu.core.config import PoseConfig, ProjectConfig


def get_scorer_name(proj: ProjectConfig, pose_cfg: PoseConfig, shuffle: int,
                    trainingsiterations="unknown") -> tuple[str, str]:
    """(DLC scorer, legacy scorer) — ref: auxiliaryfunctions.py:349-378."""
    if "resnet" in pose_cfg.net_type:
        netname = pose_cfg.net_type.replace("_", "")
    else:
        netname = "mobnet_" + str(
            int(float(pose_cfg.net_type.split("_")[-1]) * 100))
    tail = f"{proj.Task}{proj.date}shuffle{shuffle}_{trainingsiterations}"
    return f"DLC_{netname}_{tail}", f"DeepCut_{netname}_{tail}"


def _resolve_snapshot(train_dir: Path, proj: ProjectConfig,
                      snapshot: str | None) -> tuple[Path, str]:
    """(snapshot path, trainingsiterations string).

    Uses proj.snapshotindex over the *step-2 (DGP) snapshots first*, falling
    back to any step (ref: predict_videos.py:142-158 sorts snapshots by
    iteration and indexes with cfg['snapshotindex'])."""
    if snapshot is not None:
        p = train_dir / f"{snapshot}{ckpt_lib.CKPT_SUFFIX}"
        if not p.exists():
            raise FileNotFoundError(p)
        return p, p.stem.split("-")[-1]
    for step in (2, 1, 0, None):
        snaps = sorted(train_dir.glob(
            f"snapshot-step{step}-*{ckpt_lib.CKPT_SUFFIX}")) if step is not None \
            else sorted(train_dir.glob(f"snapshot-*{ckpt_lib.CKPT_SUFFIX}"))
        if snaps:
            snaps = sorted(snaps, key=ckpt_lib._snapshot_iter)
            idx = proj.snapshotindex if proj.snapshotindex != "all" else -1
            p = snaps[int(idx)]
            return p, p.stem.split("-")[-1]
    raise FileNotFoundError(
        f"no snapshots under {train_dir}; train the network first")


def analyze_videos(config: str | Path, videos: list, videotype: str = "",
                   shuffle: int = 1,
                   trainingsetindex: int = 0, save_as_csv: bool = True,
                   destfolder: str | Path | None = None,
                   batchsize: int | None = None,
                   snapshot: str | None = None,
                   cropping: tuple | None = None,
                   num_outputs: int = 1,
                   max_frames: int | None = None,
                   quantize: bool | str | None = None,
                   scale: float | None = None,
                   preset: str | None = None,
                   dynamic: tuple = (False, 0.5, 10)) -> str:
    """Analyze every video; returns the DLC scorer string.

    ``videos`` may contain files or directories (all videos inside are
    picked up, ref: predict_videos.py:528-555 GetVideoList behavior).
    ``dynamic=(state, detectiontreshold, margin)`` mirrors the reference's
    dynamic-cropping switch (ref: predict_videos.py:37,90-101 GetPoseDynamic)
    — here it routes to the TPU-redesigned batched fixed-size tracker
    (infer/dynamic.py). ``quantize=True`` runs the int8 backbone
    (models/quant.py), ``quantize="residual"`` also carries the residual
    stream in int8; the levers compose.

    ``scale`` resizes frames before inference (coordinates stay in
    original-video pixels), the reference's analyze-time resize lever.
    ``preset="fast"`` selects the measured above-target full-frame
    operating point — scale 0.75 + residual-int8, 2148.8 fps/chip vs
    728.8 bf16 at 1.0x on the Reaching frame size, at a ~3 px accuracy
    cost (PERF.md "Downscaled inference", EVAL.md "Resolution-lever
    accuracy"); explicit scale=/quantize= arguments override its choices.
    """
    from deepgraphpose_tpu.data.video import VideoReader
    from deepgraphpose_tpu.infer.export import export_pose_like_dlc
    from deepgraphpose_tpu.infer.predict import estimate_pose
    from deepgraphpose_tpu.train.fit import resolve_project

    preset_quantize = False
    if preset is not None:
        if preset != "fast":
            raise ValueError(f"unknown preset {preset!r}; only 'fast'")
        if scale is None:
            scale = 0.75
        if quantize is None:  # an explicit quantize=False/--no-int8 wins
            quantize = "residual"
            preset_quantize = True
    if quantize is None:
        quantize = False

    config = Path(config)
    dlcpath = config.parent
    proj, pose_cfg, train_dir = resolve_project(dlcpath, shuffle,
                                                trainingsetindex)
    if preset_quantize:
        from deepgraphpose_tpu.models.quant import supports_residual_int8

        if not supports_residual_int8(pose_cfg.net_type):
            # the preset degrades to plain int8 where the residual-carry
            # lowering doesn't exist (models/quant.py raises there)
            quantize = True
    frac = proj.TrainingFraction[trainingsetindex]
    snap_path, iters = _resolve_snapshot(Path(train_dir), proj, snapshot)
    scorer, scorer_legacy = get_scorer_name(proj, pose_cfg, shuffle, iters)
    print(f"Using snapshot {snap_path.name} -> scorer {scorer}")

    video_files: list[Path] = []
    for v in videos:
        p = Path(v)
        if p.is_dir():
            # videotype filters directory scans (ref: predict_videos.py
            # videotype='avi' + auxiliaryfunctions.GetVideoList)
            vt = videotype.lower().lstrip(".")
            video_files.extend(
                Path(f) for f in paths_lib.list_videos(p)
                if not vt or Path(f).suffix.lower().lstrip(".") == vt)
        elif p.exists():
            video_files.append(p)
        else:
            print(f"warning: video {p} not found; skipping")

    if cropping is not None and scale is not None and scale != 1.0:
        raise ValueError(
            "cropping= and scale= don't compose here: analyze_videos' crop "
            "box is in original pixels while scaled inference crops in "
            "resized pixels. Use estimate_pose(scale=, crop=) directly, "
            "whose crop box is documented as resized-pixel coordinates")
    crop = None
    if cropping is not None:
        x1, x2, y1, y2 = cropping
        crop = (x1, y1, x2, y2)  # estimate_pose order: (x0, y0, x1, y1)

    names = pose_cfg.all_joints_names or [
        f"bp{i}" for i in range(pose_cfg.num_joints)]

    for video in video_files:
        dest = Path(destfolder) if destfolder else video.parent
        dest.mkdir(parents=True, exist_ok=True)
        dataname = dest / f"{video.stem}{scorer}.h5"
        if dataname.exists() or (dest / f"{video.stem}{scorer_legacy}.h5").exists():
            print(f"{video.stem} already analyzed ({dataname.name})")
            continue

        t0 = time.time()
        if scale is not None and scale != 1.0 and (
                num_outputs > 1 or (dynamic and dynamic[0])):
            print("warning: scale is only applied in the full-frame "
                  "single-output path (dynamic cropping already reduces "
                  "compute; num_outputs > 1 decodes full-frame)")
        if num_outputs > 1:
            if crop is not None:
                print("warning: cropping is not applied in the "
                      "num_outputs > 1 path")
            if dynamic and dynamic[0]:
                print("warning: dynamic cropping is not applied in the "
                      "num_outputs > 1 path (full-frame decode)")
            n = _analyze_multi(config, snap_path, video, dest, shuffle,
                               pose_cfg, scorer, names, num_outputs,
                               batchsize, max_frames, save_as_csv)
            labels = None
        elif dynamic and dynamic[0]:
            from deepgraphpose_tpu.infer.dynamic import \
                estimate_pose_dynamic_video

            if crop is not None:
                print("warning: static cropping is ignored with "
                      "dynamic=(True, ...) — the tracker crops around the "
                      "detected animal on the full frame (coordinates are "
                      "full-frame); pass cropping without dynamic to crop "
                      "statically")
            labels = estimate_pose_dynamic_video(
                config, snap_path, video, dest, shuffle=shuffle,
                detection_threshold=float(dynamic[1]),
                margin=int(dynamic[2]),
                batch_size=batchsize or pose_cfg.infer_batch_size,
                max_frames=max_frames, save_pose=False, quantize=quantize)
            n = labels["x"].shape[0]
            export_pose_like_dlc(labels, scorer, names,
                                 str(dataname.with_suffix("")))
            if not save_as_csv:
                dataname.with_suffix(".csv").unlink(missing_ok=True)
        else:
            labels = estimate_pose(
                proj_cfg_file=config, dgp_model_file=snap_path,
                video_file=video, output_dir=dest, shuffle=shuffle,
                save_pose=False, crop=crop, batch_size=batchsize,
                max_frames=max_frames, pose_cfg=pose_cfg,
                quantize=quantize, scale=scale)
            n = labels["x"].shape[0]
            # writes <stem>.csv + <stem>.h5 with the scorer layout
            export_pose_like_dlc(labels, scorer, names,
                                 str(dataname.with_suffix("")))
            if not save_as_csv:
                dataname.with_suffix(".csv").unlink(missing_ok=True)
        t1 = time.time()

        reader = VideoReader(video)
        nx, ny = reader.width, reader.height
        reader.close()
        meta = {"data": {
            "start": t0, "stop": t1, "run_duration": t1 - t0,
            "Scorer": scorer,
            "DLC-model-config file": pose_cfg.to_dict(),
            "fps": None, "batch_size": batchsize or pose_cfg.infer_batch_size,
            "frame_dimensions": (ny, nx), "nframes": n,
            "iteration (active-learning)": proj.iteration,
            "training set fraction": frac,
            "cropping": cropping is not None,
            "cropping_parameters": list(cropping) if cropping
            else [0, nx, 0, ny],
        }}
        with open(str(dataname).split(".h5")[0]
                  + "includingmetadata.pickle", "wb") as f:
            pickle.dump(meta, f)
        print(f"analyzed {video.name}: {n} frames in {t1 - t0:.1f}s")
    return scorer


def _analyze_multi(config, snap_path, video, dest, shuffle, pose_cfg,
                   scorer, names, num_outputs, batchsize, max_frames,
                   save_as_csv) -> int:
    """num_outputs > 1 path: top-k decode per joint, suffixed-column export
    (ref: predict_videos.py:188-196 + multi_pose_predict)."""
    import jax
    import jax.numpy as jnp

    from deepgraphpose_tpu.data.video import VideoReader, iter_frame_batches
    from deepgraphpose_tpu.infer.export import export_multi_pose_like_dlc
    from deepgraphpose_tpu.infer.predict import make_multi_infer_fn
    from deepgraphpose_tpu.models.pose_model import init_model

    reader = VideoReader(video)
    n = (min(reader.n_frames, max_frames) if max_frames
         else reader.n_frames)
    bs = batchsize or pose_cfg.infer_batch_size
    dtype = (jnp.bfloat16 if pose_cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    model, variables = init_model(pose_cfg, jax.random.PRNGKey(0),
                                  (reader.height, reader.width), dtype=dtype)
    variables, _ = ckpt_lib.load_snapshot(snap_path, variables)
    infer = make_multi_infer_fn(model, pose_cfg, num_outputs)

    nj = pose_cfg.num_joints
    pose_all = np.zeros((n, nj, num_outputs, 3))
    n_read = 0
    for start, block in iter_frame_batches(reader, bs, n):
        pad = bs - block.shape[0]
        arr = np.concatenate([block, block[-1:].repeat(pad, 0)]) if pad \
            else block
        pose = np.asarray(infer(variables, jnp.asarray(arr)))
        pose_all[start:start + block.shape[0]] = pose[:block.shape[0]]
        n_read = start + block.shape[0]
    reader.close()
    if n_read < n:
        print(f"warning: decoder yielded {n_read}/{n} frames; truncating")
        pose_all = pose_all[:n_read]
        n = n_read
    export_multi_pose_like_dlc(pose_all, scorer, names,
                               str(dest / f"{video.stem}{scorer}"))
    if not save_as_csv:
        Path(str(dest / f"{video.stem}{scorer}") + ".csv").unlink(
            missing_ok=True)
    return n


def analyze_time_lapse_frames(config: str | Path, directory: str | Path,
                              frametype: str = ".png", shuffle: int = 1,
                              trainingsetindex: int = 0,
                              save_as_csv: bool = True,
                              snapshot: str | None = None,
                              batchsize: int | None = None) -> str:
    """Batched inference over a directory of same-sized images.

    ref: predict_videos.py:610-724 (analyze_time_lapse_frames /
    GetPosesofFrames). Writes ``<dirname><scorer>.h5`` (+ .csv) inside the
    directory; returns the scorer.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from deepgraphpose_tpu.infer.export import export_pose_like_dlc
    from deepgraphpose_tpu.infer.predict import make_infer_fn
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.train.fit import resolve_project

    config = Path(config)
    directory = Path(directory)
    proj, pose_cfg, train_dir = resolve_project(config.parent, shuffle,
                                                trainingsetindex)
    snap_path, iters = _resolve_snapshot(Path(train_dir), proj, snapshot)
    scorer, _ = get_scorer_name(proj, pose_cfg, shuffle, iters)

    frames = sorted(p for p in directory.iterdir()
                    if p.suffix.lower() == frametype.lower())
    if not frames:
        raise FileNotFoundError(f"no {frametype} frames in {directory}")
    imgs = []
    for p in frames:
        img = cv2.imread(str(p))
        if img is None:
            raise FileNotFoundError(f"unreadable image {p}")
        imgs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    hw = imgs[0].shape[:2]
    if any(i.shape[:2] != hw for i in imgs):
        raise ValueError("all frames must share one size "
                         "(ref: GetPosesofFrames assumes constant dims)")

    dtype = (jnp.bfloat16 if pose_cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    model, variables = init_model(pose_cfg, jax.random.PRNGKey(0), hw,
                                  dtype=dtype)
    variables, _ = ckpt_lib.load_snapshot(snap_path, variables)
    infer = make_infer_fn(model, pose_cfg)

    bs = batchsize or pose_cfg.infer_batch_size
    nj = pose_cfg.num_joints
    mu_all = np.zeros((len(imgs), nj, 2))
    lik_all = np.zeros((len(imgs), nj))
    for s in range(0, len(imgs), bs):
        chunk = imgs[s:s + bs]
        pad = bs - len(chunk)
        arr = np.stack(chunk + [chunk[-1]] * pad)
        mu, lik = infer(variables, jnp.asarray(arr))
        mu_all[s:s + len(chunk)] = np.asarray(mu)[:len(chunk)]
        lik_all[s:s + len(chunk)] = np.asarray(lik)[:len(chunk)]

    stride = pose_cfg.stride
    labels = {"x": mu_all[:, :, 1] * stride + stride / 2,
              "y": mu_all[:, :, 0] * stride + stride / 2,
              "likelihoods": lik_all}
    names = pose_cfg.all_joints_names or [f"bp{i}" for i in range(nj)]
    out_stem = directory / f"{directory.name}{scorer}"
    export_pose_like_dlc(labels, scorer, names, str(out_stem))
    if not save_as_csv:
        # the writer appends '.csv' by string concat; with_suffix would
        # mangle directory names containing dots
        Path(str(out_stem) + ".csv").unlink(missing_ok=True)
    print(f"analyzed {len(imgs)} frames in {directory} -> {out_stem}.h5")
    return scorer
