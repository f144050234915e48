"""StableHLO serving export (infer/serving.py)."""

import os
import sys
from pathlib import Path

import jax
import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(__file__))

from deepgraphpose_tpu.core.config import PoseConfig  # noqa: E402
from deepgraphpose_tpu.infer.serving import (export_from_snapshot,  # noqa: E402
                                             export_infer_artifact,
                                             load_infer_artifact)
from deepgraphpose_tpu.models.pose_model import init_model  # noqa: E402


def test_export_roundtrip_matches_direct_call(tmp_path):
    from deepgraphpose_tpu.infer.predict import infer_forward

    cfg = PoseConfig(num_joints=3, net_type="mobilenet_v2_0.35",
                     all_joints_names=["a", "b", "c"])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (48, 64))
    art = tmp_path / "pose.stablehlo"
    export_infer_artifact(model, cfg, variables, (48, 64), batch_size=2,
                          out_path=art, platforms=("cpu",))
    assert art.exists() and art.stat().st_size > 1000

    call, meta = load_infer_artifact(art)
    assert meta["num_joints"] == 3
    assert meta["input_shape"] == [2, 48, 64, 3]

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    mu_art, lik_art = call(images)
    mu_ref, lik_ref = infer_forward(model, cfg, variables,
                                    jax.numpy.asarray(images))
    np.testing.assert_allclose(np.asarray(mu_art), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lik_art), np.asarray(lik_ref),
                               rtol=1e-5, atol=1e-5)


def test_export_from_snapshot_project(tmp_path):
    from conftest import make_synthetic_project

    from deepgraphpose_tpu.train.fit import fit_dlc

    root = str(tmp_path / "proj")
    make_synthetic_project(root, n_frames=10, n_labeled=3, hw=(48, 64))
    cfg_path = Path(root, "dlc-models/iteration-0/"
                    "SynthJan1-trainset95shuffle1", "train", "pose_cfg.yaml")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["net_type"] = "mobilenet_v2_0.35"
    cfg_path.write_text(yaml.safe_dump(raw))
    fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
            bn_train=False, jitter=False)

    art = tmp_path / "model.stablehlo"
    out = export_from_snapshot(Path(root) / "config.yaml",
                               "snapshot-step0-final--0", art,
                               batch_size=2, platforms=("cpu",))
    assert out.exists()
    call, meta = load_infer_artifact(out)
    mu, lik = call(np.zeros(meta["input_shape"], np.uint8))
    assert np.asarray(mu).shape == (2, meta["num_joints"], 2)
    assert np.all(np.isfinite(np.asarray(mu)))


def test_export_missing_snapshot_raises(tmp_path):
    """A missing snapshot must fail loudly — never fall back to
    init_weights (ImageNet backbone + random heads) and export garbage."""
    import pytest
    from conftest import make_synthetic_project

    root = str(tmp_path / "proj2")
    make_synthetic_project(root, n_frames=8, n_labeled=2, hw=(48, 64))
    cfg_path = Path(root, "dlc-models/iteration-0/"
                    "SynthJan1-trainset95shuffle1", "train", "pose_cfg.yaml")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["net_type"] = "mobilenet_v2_0.35"
    cfg_path.write_text(yaml.safe_dump(raw))
    with pytest.raises(FileNotFoundError):
        export_from_snapshot(Path(root) / "config.yaml",
                             "snapshot-step9-final--0",
                             tmp_path / "x.stablehlo", batch_size=1,
                             in_hw=(48, 64), platforms=("cpu",))


def test_export_int8_quantized_roundtrip(tmp_path):
    from deepgraphpose_tpu.infer.predict import infer_forward
    from deepgraphpose_tpu.models.quant import quantize_model

    cfg = PoseConfig(num_joints=3, net_type="resnet_50",
                     all_joints_names=["a", "b", "c"])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (48, 64))
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 255, (2, 48, 64, 3)).astype(np.float32)
    # f32 heads AND carry: bf16 constant-folding in the exported artifact
    # reassociates differently from the live jit (~0.006 cells); f32 pins
    # them together (intra-chain int8 carries are exact either way)
    qmodel, qvars = quantize_model(cfg, variables, calib,
                                   dtype=jax.numpy.float32,
                                   carry_dtype=jax.numpy.float32)

    art = tmp_path / "pose_int8.stablehlo"
    export_infer_artifact(qmodel, cfg, qvars, (48, 64), batch_size=2,
                          out_path=art, platforms=("cpu",))
    call, meta = load_infer_artifact(art)
    assert meta["quantized_int8"] is True
    assert meta["residual_int8"] is False

    images = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    mu_art, lik_art = call(images)
    mu_ref, lik_ref = infer_forward(qmodel, cfg, qvars,
                                    jax.numpy.asarray(images))
    np.testing.assert_allclose(np.asarray(mu_art), np.asarray(mu_ref),
                               rtol=1e-4, atol=1e-4)


def test_export_residual_int8_roundtrip(tmp_path):
    """quantize='residual' export: int8 residual-stream carries survive
    serialization and the metadata records the mode."""
    from deepgraphpose_tpu.infer.predict import infer_forward
    from deepgraphpose_tpu.models.quant import quantize_model

    cfg = PoseConfig(num_joints=3, net_type="resnet_50",
                     all_joints_names=["a", "b", "c"])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (48, 64))
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 255, (2, 48, 64, 3)).astype(np.float32)
    qmodel, qvars = quantize_model(cfg, variables, calib,
                                   dtype=jax.numpy.float32,
                                   carry_dtype=jax.numpy.float32,
                                   residual_int8=True)

    art = tmp_path / "pose_resint8.stablehlo"
    export_infer_artifact(qmodel, cfg, qvars, (48, 64), batch_size=2,
                          out_path=art, platforms=("cpu",))
    call, meta = load_infer_artifact(art)
    assert meta["quantized_int8"] is True
    assert meta["residual_int8"] is True

    images = rng.integers(0, 255, (2, 48, 64, 3), dtype=np.uint8)
    mu_art, _ = call(images)
    mu_ref, _ = infer_forward(qmodel, cfg, qvars,
                              jax.numpy.asarray(images))
    np.testing.assert_allclose(np.asarray(mu_art), np.asarray(mu_ref),
                               rtol=1e-4, atol=1e-4)
