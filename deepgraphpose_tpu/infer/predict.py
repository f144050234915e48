"""Batched streaming full-video inference.

The reference runs ONE frame per Session.run (ref: eval.py:306-345
estimate_pose) — SURVEY §3.4 names this the biggest win for the rebuild.
Here: host decodes frames sequentially into fixed-size uint8 batches on a
background thread, transfers them while the previous batch computes, and a
single jitted program does forward + soft-argmax + likelihood for the whole
batch. uint8 travels over PCIe/DMA (4x less than f32); normalization happens
on device.

Decode semantics match the reference:
* mu from ``argmax_2d_from_cm`` (softmax -> gaussian smooth -> expectation),
* pixel coords = mu * stride + stride/2, flipped to (x, y) and rescaled by
  any resize factors (ref: eval.py:352-356),
* likelihood = max sigmoid(scoremap logit) over the 2x2 cells around mu
  (ref: eval.py:331-343).
"""

from __future__ import annotations

import functools
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from deepgraphpose_tpu.core import checkpoint as ckpt_lib
from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.data.prefetch import DevicePrefetcher
from deepgraphpose_tpu.data.video import VideoReader
from deepgraphpose_tpu.infer.export import export_pose_like_dlc
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.ops.softargmax import softargmax_2d


def infer_forward(model, cfg: PoseConfig, variables, images_u8):
    """(variables, uint8 images) -> (mu_rc, likelihood); trace-time pure."""
    images = images_u8.astype(jnp.float32)
    heads = model.apply(variables, images)
    pred = heads["part_pred"]                    # (B, H, W, nj) logits
    if getattr(cfg, "use_pallas_softargmax", False):
        from deepgraphpose_tpu.ops.pallas.softargmax_kernel import \
            softargmax_2d_pallas

        mu = softargmax_2d_pallas(pred, cfg.gamma, cfg.gauss_len)
    else:
        mu, _ = softargmax_2d(pred, gamma=cfg.gamma, gauss_len=cfg.gauss_len)

    b, h, w, nj = pred.shape
    r0 = jnp.clip(jnp.floor(mu[..., 0]).astype(jnp.int32), 0, h - 1)
    c0 = jnp.clip(jnp.floor(mu[..., 1]).astype(jnp.int32), 0, w - 1)
    bi = jax.lax.broadcasted_iota(jnp.int32, (b, nj), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (b, nj), 1)

    def at(dr, dc):
        r = jnp.clip(r0 + dr, 0, h - 1)
        c = jnp.clip(c0 + dc, 0, w - 1)
        return pred[bi, r, c, ji]

    best = jnp.maximum(jnp.maximum(at(0, 0), at(0, 1)),
                       jnp.maximum(at(1, 0), at(1, 1)))
    likelihood = jax.nn.sigmoid(best)
    return mu, likelihood


def make_infer_fn(model, cfg: PoseConfig):
    """Jitted (variables, uint8 images) -> (mu_rc, likelihood)."""
    from deepgraphpose_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    return jax.jit(functools.partial(infer_forward, model, cfg))


def make_multi_infer_fn(model, cfg: PoseConfig, num_outputs: int):
    """Jitted top-k decode for num_outputs > 1 (ref: predict_videos.py
    num_outputs path + predict.py:79-116 multi_pose_predict).

    (variables, uint8 images) -> (B, nj, num_outputs, 3) [x, y, likelihood]
    in pixel coordinates.
    """
    from deepgraphpose_tpu.ops.decode import multi_pose_decode

    @jax.jit
    def fn(variables, images_u8):
        heads = model.apply(variables, images_u8.astype(jnp.float32))
        return multi_pose_decode(heads["part_pred"], heads.get("locref"),
                                 num_outputs, stride=cfg.stride,
                                 locref_stdev=cfg.locref_stdev)

    return fn


def _batch_producer(reader: VideoReader, batch_size: int,
                    new_size=None, crop=None, max_frames=None):
    """Yield (start_index, n_valid, uint8 batch) with last-batch padding."""
    import cv2

    buf, start = [], 0
    n = 0
    for i, frame in reader.iter_frames():
        if max_frames is not None and i >= max_frames:
            break
        if new_size is not None:
            frame = cv2.resize(frame, (new_size[1], new_size[0]))
        if crop is not None:
            x0, y0, x1, y1 = crop
            frame = frame[y0:y1, x0:x1]
        buf.append(frame)
        n += 1
        if len(buf) == batch_size:
            yield start, batch_size, np.stack(buf)
            start += batch_size
            buf = []
    if buf:
        pad = batch_size - len(buf)
        arr = np.stack(buf + [buf[-1]] * pad)
        yield start, len(buf), arr


def estimate_pose(proj_cfg_file: str | Path | None,
                  dgp_model_file: str | Path,
                  video_file: str | Path,
                  output_dir: str | Path,
                  shuffle: int = 1,
                  save_pose: bool = True,
                  save_str: str = "",
                  new_size: tuple | None = None,
                  scale: float | None = None,
                  crop: tuple | None = None,
                  batch_size: int | None = None,
                  max_frames: int | None = None,
                  pose_cfg: PoseConfig | None = None,
                  variables=None, model=None,
                  compute_dtype=None,
                  quantize: bool | str = False,
                  calib_frames: int = 16) -> dict:
    """Full-video inference; returns {'x','y','likelihoods'} (T, nj) arrays.

    API mirrors the reference's estimate_pose (ref: eval.py:217-372),
    including skip-if-CSV-exists and DLC-format CSV/H5 export.

    quantize=True runs the backbone in int8 (models/quant.py; calibrated on
    the video's first ``calib_frames`` frames) — ~2x conv rate on the TPU
    MXU (PERF.md int8 probe), a TPU-first extension the reference lacks.
    quantize="residual" additionally carries the inter-unit residual
    stream in int8 (+25% over default int8; accuracy cost measured in
    EVAL.md "residual-int8 carry accuracy").

    ``scale`` is a relative resize (new_size = round(scale * video dims));
    coordinates are still returned in original-video pixels. Mutually
    exclusive with ``new_size``. PERF.md "Downscaled inference" records
    the measured fps/accuracy trade-off per scale. ``crop`` is applied
    after any resize, so with new_size/scale the (x0, y0, x1, y1) box is
    in resized pixels; returned coordinates are original-video pixels in
    every combination.
    """
    video_file = Path(video_file)
    output_dir = Path(output_dir)
    save_file = output_dir / (video_file.stem + save_str)
    if save_pose and (save_file.with_suffix(".csv")).exists():
        print(f"{save_file}.csv exists; skipping inference")
        from deepgraphpose_tpu.infer.export import load_pose_from_dlc
        return load_pose_from_dlc(str(save_file) + ".csv")

    if pose_cfg is None:
        from deepgraphpose_tpu.train.fit import resolve_project

        _, pose_cfg, _ = resolve_project(Path(proj_cfg_file).parent, shuffle)

    reader = VideoReader(video_file)
    if scale is not None:
        if new_size is not None:
            raise ValueError("pass scale= or new_size=, not both")
        if not 0 < scale:
            raise ValueError(f"scale must be positive, got {scale}")
        if scale != 1.0:
            new_size = (max(1, round(reader.height * scale)),
                        max(1, round(reader.width * scale)))
    in_h, in_w = (new_size if new_size is not None
                  else (reader.height, reader.width))
    if crop is not None:
        # crop is applied AFTER any resize, so the box is in resized
        # pixels when new_size/scale is given (matches _batch_producer)
        in_h, in_w = crop[3] - crop[1], crop[2] - crop[0]
    scale_x = reader.width / new_size[1] if new_size is not None else 1.0
    scale_y = reader.height / new_size[0] if new_size is not None else 1.0

    if batch_size is None:
        batch_size = pose_cfg.infer_batch_size

    import jax.numpy as _jnp

    dtype = compute_dtype
    if dtype is None:
        dtype = (_jnp.bfloat16 if pose_cfg.compute_dtype == "bfloat16"
                 else _jnp.float32)
    from deepgraphpose_tpu.models.quant import QuantizedPoseModel

    if model is None and variables is not None:
        # caller supplied variables only: the module object is cheap to
        # construct — no init forward, which at video resolution costs a
        # full-frame compile just to discard the result
        from deepgraphpose_tpu.models.pose_model import PoseModel

        model = PoseModel(pose_cfg, dtype=dtype)
    elif variables is None:
        # honor caller-supplied variables: only snapshot-load when they are
        # absent. The snapshot template comes from the DEFAULT architecture,
        # so a structurally different caller model cannot host it.
        if isinstance(model, QuantizedPoseModel):
            raise ValueError(
                "estimate_pose(model=<quantized>) needs the matching "
                "quantized variables passed alongside (or pass quantize= "
                "and let estimate_pose quantize the snapshot itself)")
        # param/batch-stat shapes are input-size independent, so a tiny
        # init suffices as the restore template
        new_model, init_vars = init_model(pose_cfg, jax.random.PRNGKey(0),
                                          dtype=dtype)
        if model is None:
            model = new_model
        variables, _ = ckpt_lib.load_snapshot(dgp_model_file, init_vars)

    if quantize and not isinstance(model, QuantizedPoseModel):
        from deepgraphpose_tpu.models.quant import (calib_frames_from_video,
                                                    quantize_model)

        calib = calib_frames_from_video(video_file, calib_frames,
                                        new_size=new_size, crop=crop)
        model, variables = quantize_model(
            pose_cfg, variables, calib, dtype=dtype,
            residual_int8=(quantize == "residual"))

    infer = make_infer_fn(model, pose_cfg)

    n_total = (min(reader.n_frames, max_frames) if max_frames
               else reader.n_frames)
    nj = pose_cfg.num_joints
    mu_all = np.zeros((n_total, nj, 2), np.float64)
    lik_all = np.zeros((n_total, nj), np.float64)

    producer = _batch_producer(reader, batch_size, new_size, crop, max_frames)
    pf = DevicePrefetcher(
        producer, lambda item: (item[0], item[1], jax.device_put(item[2])),
        depth=3)
    t0 = time.time()
    done = 0
    for start, n_valid, images in pf:
        mu, lik = infer(variables, images)
        mu = np.asarray(mu[:n_valid])
        lik = np.asarray(lik[:n_valid])
        end = min(start + n_valid, n_total)
        mu_all[start:end] = mu[:end - start]
        lik_all[start:end] = lik[:end - start]
        done = end
    dt = time.time() - t0
    reader.close()
    fps = done / dt if dt > 0 else float("inf")
    print(f"[estimate_pose] {done} frames in {dt:.2f}s = {fps:.1f} frames/s")

    stride = pose_cfg.stride
    xr = mu_all[:, :, 1] * stride + 0.5 * stride
    yr = mu_all[:, :, 0] * stride + 0.5 * stride
    if crop is not None:
        # offset in the (possibly resized) frame, BEFORE mapping back to
        # original pixels — crop+scale/new_size compose correctly
        xr = xr + crop[0]
        yr = yr + crop[1]
    xr = xr * scale_x
    yr = yr * scale_y
    labels = {"x": xr, "y": yr, "likelihoods": lik_all}

    if save_pose:
        output_dir.mkdir(parents=True, exist_ok=True)
        export_pose_like_dlc(labels, Path(dgp_model_file).stem,
                             pose_cfg.all_joints_names or
                             [f"bp{i}" for i in range(nj)], str(save_file))
    return labels
