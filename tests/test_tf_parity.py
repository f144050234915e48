"""Activation parity vs a raw-TF-ops reconstruction of the reference graph.

North-star evidence (BASELINE.md: per-keypoint RMSE within 1 px of TF1 DGP):
one weight set — exported by ``export_tf_arrays`` in TF checkpoint naming —
drives (a) this package's Flax/XLA forward pass and (b) a from-scratch
``tf.nn`` reconstruction of slim ``resnet_v1_50`` + DGP prediction layers +
``argmax_2d_from_cm`` (tests/tf_reference_net.py). Backbone features,
scoremap/locref logits, and soft-argmax coordinates must agree to ~1e-4.

Sizes include ones where slim's VALID pool / conv2d_same padding produce
*different output dims* than plain-SAME arithmetic (e.g. 100 -> 12, not 14),
so these tests pin the spatial contract, not just the kernels.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepgraphpose_tpu.core.config import PoseConfig  # noqa: E402
from deepgraphpose_tpu.models.pose_model import (init_model,  # noqa: E402
                                                 scoremap_size)
from deepgraphpose_tpu.models.tf_import import export_tf_arrays  # noqa: E402
from deepgraphpose_tpu.ops.softargmax import softargmax_2d  # noqa: E402

from tf_reference_net import reference_forward, slim_resnet_features  # noqa: E402

NJ = 3


def _randomized_model(in_hw, rng_seed=0):
    """Model with randomized BN affine/stats so the parity is non-trivial."""
    cfg = PoseConfig(num_joints=NJ, net_type="resnet_50",
                     all_joints_names=[f"bp{i}" for i in range(NJ)])
    model, variables = init_model(cfg, jax.random.PRNGKey(rng_seed), in_hw)
    rng = np.random.default_rng(rng_seed)

    def perturb(path, leaf):
        leaf = np.asarray(leaf, np.float32)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("scale",):
            return leaf * rng.uniform(0.8, 1.2, leaf.shape).astype(np.float32)
        if name in ("bias", "mean"):
            return leaf + rng.normal(0, 0.1, leaf.shape).astype(np.float32)
        if name == "var":
            return rng.uniform(0.8, 1.2, leaf.shape).astype(np.float32)
        return leaf

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    return cfg, model, variables


def _flax_forward(cfg, model, variables, images):
    filt = lambda mdl, method: method == "__call__"
    heads, state = model.apply(variables, jnp.asarray(images),
                               capture_intermediates=filt)
    feats = state["intermediates"]["ResNetV1_0"]["__call__"][0][0]
    return np.asarray(feats), {k: np.asarray(v) for k, v in heads.items()}


@pytest.mark.parametrize("hw", [(64, 64), (100, 100), (75, 100)])
def test_forward_parity_vs_tf_reconstruction(hw):
    cfg, model, variables = _randomized_model(hw)
    arrays = export_tf_arrays(variables, "resnet_50")

    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (2, *hw, 3)).astype(np.float32)

    feats_j, heads_j = _flax_forward(cfg, model, variables, images)
    ref = reference_forward(arrays, images, NJ, gamma=1.0, gauss_len=2.0)

    # spatial contract: flax == TF reconstruction == formula
    assert ref["features"].shape == feats_j.shape
    assert heads_j["part_pred"].shape == ref["part_pred"].shape
    assert heads_j["part_pred"].shape[1:3] == scoremap_size(cfg, hw)

    scale = np.abs(ref["features"]).max()
    np.testing.assert_allclose(feats_j, ref["features"], atol=1e-4 * scale,
                               rtol=1e-4)
    sscale = np.abs(ref["part_pred"]).max()
    np.testing.assert_allclose(heads_j["part_pred"], ref["part_pred"],
                               atol=1e-4 * sscale, rtol=1e-4)
    lscale = np.abs(ref["locref"]).max()
    np.testing.assert_allclose(heads_j["locref"], ref["locref"],
                               atol=1e-4 * lscale, rtol=1e-4)

    # soft-argmax decode: coordinates in scoremap cells (1e-3 cell = .008 px)
    mu_j, smoothed_j = softargmax_2d(jnp.asarray(heads_j["part_pred"]),
                                     gamma=1.0, gauss_len=2.0)
    np.testing.assert_allclose(np.asarray(mu_j), ref["mu"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(smoothed_j), ref["smoothed"],
                               atol=1e-5)


def test_scoremap_dims_divergent_size():
    """H=100: slim gives 12 output cells where ceil(H/16)*2 says 14."""
    cfg = PoseConfig(num_joints=NJ, net_type="resnet_50",
                     all_joints_names=[f"bp{i}" for i in range(NJ)])
    assert scoremap_size(cfg, (100, 100)) == (12, 12)
    assert scoremap_size(cfg, (64, 64)) == (8, 8)
    assert scoremap_size(cfg, (747, 832)) == (94, 104)


def test_backbone_parity_atrous_output_stride_8():
    """output_stride=8 exercises two dilated blocks (rate 2 then 4)."""
    cfg = PoseConfig(num_joints=NJ, net_type="resnet_50", output_stride=8,
                     all_joints_names=[f"bp{i}" for i in range(NJ)])
    model, variables = init_model(cfg, jax.random.PRNGKey(2), (64, 64))
    arrays = export_tf_arrays(variables, "resnet_50")
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32)
    feats_j, _ = _flax_forward(cfg, model, variables, images)
    feats_t = slim_resnet_features(arrays, images, "resnet_50",
                                   output_stride=8)
    assert feats_t.shape == feats_j.shape
    scale = np.abs(feats_t).max()
    np.testing.assert_allclose(feats_j, feats_t, atol=1e-4 * scale, rtol=1e-4)


def _reference_estimate_pose(arrays, cfg, frames_u8, crop=None):
    """Numpy/TF replay of the reference's estimate_pose frame loop
    (ref: eval.py:306-372): per-frame forward, neighborhood likelihood,
    mu*stride + stride/2 pixel conversion — the pipeline our batched
    estimate_pose must match end to end."""
    from tf_reference_net import reference_forward

    nj = cfg.num_joints
    xs, ys, liks = [], [], []
    for frame in frames_u8:
        if crop is not None:  # PIL box (left, upper, right, lower)
            x0, y0, x1, y1 = crop
            frame = frame[y0:y1, x0:x1]
        out = reference_forward(arrays, frame[None].astype(np.float32), nj,
                                gamma=cfg.gamma, gauss_len=cfg.gauss_len)
        mu = np.asarray(out["mu"])[0]            # (nj, 2) scoremap (r, c)
        part = np.asarray(out["part_pred"])[0]   # (h, w, nj) logits
        lik = np.zeros(nj)
        for j in range(nj):
            sig = 1.0 / (1.0 + np.exp(-part[:, :, j]))
            f = np.floor(mu[j]).astype(int)
            c = np.ceil(mu[j]).astype(int) + 1
            win = sig[f[0]:c[0], f[1]:c[1]]
            r_, c_ = np.unravel_index(np.argmax(win), win.shape)
            lik[j] = sig[f[0] + r_, f[1] + c_]
        xs.append(mu[:, 1] * cfg.stride + 0.5 * cfg.stride)
        ys.append(mu[:, 0] * cfg.stride + 0.5 * cfg.stride)
        liks.append(lik)
    return (np.asarray(xs), np.asarray(ys), np.asarray(liks))


def test_estimate_pose_pipeline_parity_vs_tf(tmp_path):
    """PIPELINE-level TF1 parity (north star: <= 1 px): the full batched
    estimate_pose — video decode, optional crop, likelihood neighborhood
    rule, stride/offset pixel conversion, CSV export naming — agrees with
    a frame-at-a-time replay of the reference's eval loop
    (ref: eval.py:217-372) running the raw-TF reconstruction on the SAME
    exported weights. Goes beyond the activation tests above: it executes
    both *pipelines*, not both networks."""
    import cv2

    from deepgraphpose_tpu.infer.predict import estimate_pose

    hw = (96, 128)
    cfg, model, variables = _randomized_model(hw, rng_seed=3)
    cfg.compute_dtype = "float32"
    arrays = export_tf_arrays(variables, "resnet_50")

    # video with a bright moving blob (gives the soft-argmax a real peak)
    rng = np.random.default_rng(0)
    vid = tmp_path / "clip.avi"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                         (hw[1], hw[0]))
    frames = []
    for i in range(5):
        f = rng.integers(0, 40, (*hw, 3)).astype(np.uint8)
        r0, c0 = 20 + 8 * i, 30 + 10 * i
        f[r0:r0 + 12, c0:c0 + 12] = 230
        frames.append(f)
        wr.write(f[:, :, ::-1])  # cv2 writes BGR
    wr.release()
    # read back exactly what each side will see (MJPG is lossy)
    from deepgraphpose_tpu.data.video import VideoReader
    reader = VideoReader(str(vid))
    decoded = np.stack([reader.read_frame(i) for i in range(5)])
    reader.close()

    for crop in (None, (16, 8, 112, 88)):  # (x0, y0, x1, y1)
        ours = estimate_pose(None, "snapshot-step2-final--0", str(vid),
                             str(tmp_path / "out"), save_pose=False,
                             crop=crop, pose_cfg=cfg, variables=variables,
                             model=model, compute_dtype=jnp.float32)
        xr, yr, lik = _reference_estimate_pose(arrays, cfg, decoded,
                                               crop=crop)
        # coordinate-frame convention: the reference computes xmin/ymin for
        # a cropped run but never adds them back (eval.py:317-322 vs
        # 352-356 — coords stay in crop space); ours returns full-frame
        # pixels (predict.py adds crop[0]/crop[1]). Compare in crop space.
        x0, y0 = (crop[0], crop[1]) if crop else (0, 0)
        dx = np.abs(np.asarray(ours["x"]) - x0 - xr).max()
        dy = np.abs(np.asarray(ours["y"]) - y0 - yr).max()
        dl = np.abs(np.asarray(ours["likelihoods"]) - lik).max()
        assert dx < 0.25 and dy < 0.25, (crop, dx, dy)
        assert dl < 1e-2, (crop, dl)
