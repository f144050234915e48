"""Ahead-of-time model export for serving (StableHLO via jax.export).

The reference has no deployment story beyond pickled TF1 graphs; a
production TPU framework needs one. This module freezes a trained pose
model — weights baked in as constants — into a serialized StableHLO
artifact that any JAX-compatible runtime (TPU serving hosts, CPU fallback,
IFRT/PJRT loaders) can execute without this package's Python code on the
hot path.

The exported function has the inference contract of
``infer/predict.py::infer_forward``: uint8 images (B, H, W, 3) ->
(mu_rc (B, nj, 2) scoremap coords, likelihood (B, nj)). Batch and frame
size are static (TPU-first: fixed shapes, one compiled program).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from deepgraphpose_tpu.core.config import PoseConfig

_META_SUFFIX = ".json"


def export_infer_artifact(model, cfg: PoseConfig, variables,
                          in_hw: tuple[int, int], batch_size: int,
                          out_path: str | Path,
                          platforms: tuple = ("tpu", "cpu")) -> Path:
    """Serialize the frozen inference function to ``out_path``.

    Weights are captured as constants, so the artifact is self-contained.
    A sidecar ``<out_path>.json`` records the decode metadata a server
    needs (stride, joint names, input shape).
    """
    from deepgraphpose_tpu.infer.predict import infer_forward

    out_path = Path(out_path)

    def fn(images_u8):
        return infer_forward(model, cfg, variables, images_u8)

    spec = jax.ShapeDtypeStruct((batch_size, *in_hw, 3), jnp.uint8)
    exported = jax.export.export(
        jax.jit(fn), platforms=list(platforms))(spec)
    out_path.write_bytes(exported.serialize())
    meta = dict(
        input_shape=[batch_size, *in_hw, 3],
        num_joints=cfg.num_joints,
        all_joints_names=list(cfg.all_joints_names),
        stride=float(cfg.stride),
        net_type=cfg.net_type,
        outputs=["mu_rc (B, nj, 2) scoremap (row, col); pixels = "
                 "coord * stride + stride/2", "likelihood (B, nj)"],
        platforms=list(platforms),
    )
    from deepgraphpose_tpu.models.quant import QuantizedPoseModel

    meta["quantized_int8"] = isinstance(model, QuantizedPoseModel)
    meta["residual_int8"] = bool(getattr(model, "residual_int8", False))
    Path(str(out_path) + _META_SUFFIX).write_text(json.dumps(meta, indent=1))
    return out_path


def export_from_snapshot(config_path: str | Path, snapshot: str | Path,
                         out_path: str | Path, batch_size: int = 16,
                         in_hw: tuple[int, int] | None = None,
                         shuffle: int = 1,
                         platforms: tuple = ("tpu", "cpu"),
                         quantize: bool | str = False) -> Path:
    """Export a trained snapshot from a DLC project layout.

    ``in_hw`` defaults to the first project video's frame size.
    ``quantize=True`` exports the int8-quantized backbone (models/quant.py,
    calibrated on frames from the first project video) — the serving
    artifact then runs the MXU's 2x int8 conv rate on TPU hosts.
    ``quantize="residual"`` additionally carries the inter-unit residual
    stream in int8 (CLI: --residual-int8); the artifact metadata records
    the mode as ``residual_int8``.
    """
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.train.fit import (dgp_video_sets, resolve_project,
                                             _warm_start)

    config_path = Path(config_path)
    proj_dir = config_path.parent
    proj, cfg, train_dir = resolve_project(proj_dir, shuffle)
    if in_hw is None:
        from deepgraphpose_tpu.data.video import VideoReader

        vids = dgp_video_sets(proj, proj_dir)
        reader = VideoReader(vids[0])
        in_hw = (reader.height, reader.width)
        reader.close()
    model, variables = init_model(cfg, jax.random.PRNGKey(0), in_hw)
    snap_name = Path(snapshot).name
    if snap_name.endswith(".ckpt"):
        snap_name = snap_name[: -len(".ckpt")]
    # allow_init_weights=False: never fall back to the ImageNet backbone
    # (random heads) — a missing snapshot must fail, not export garbage
    variables, warmed = _warm_start(variables, cfg, Path(train_dir),
                                    snap_name, allow_init_weights=False)
    if not warmed:
        raise FileNotFoundError(f"snapshot {snapshot} not found under "
                                f"{train_dir}")
    if quantize:
        from deepgraphpose_tpu.models.quant import (calib_frames_from_video,
                                                    quantize_model)

        vids = dgp_video_sets(proj, proj_dir)
        # resize_to: export at a non-native serving size still calibrates
        # (frames are resized to in_hw rather than filtered out)
        calib = calib_frames_from_video(vids[0], resize_to=tuple(in_hw))
        model, variables = quantize_model(
            cfg, variables, calib,
            residual_int8=(quantize == "residual"))
    return export_infer_artifact(model, cfg, variables, in_hw, batch_size,
                                 out_path, platforms)


def load_infer_artifact(path: str | Path):
    """Deserialize an exported artifact -> (callable, metadata dict).

    The callable maps uint8 images (B, H, W, 3) -> (mu_rc, likelihood) and
    runs on whatever platform the artifact was exported for.
    """
    path = Path(path)
    exported = jax.export.deserialize(path.read_bytes())
    meta = {}
    meta_path = Path(str(path) + _META_SUFFIX)
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())

    def call(images_u8):
        return exported.call(jnp.asarray(images_u8, jnp.uint8))

    return call, meta
