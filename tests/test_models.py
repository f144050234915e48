"""Model shape / semantics tests (CPU, tiny inputs).

ResNet-50 CPU compiles are expensive: all tests share one initialized model
via a module-scoped fixture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.pose_model import PoseModel, init_model, scoremap_size


def _cfg(**kw):
    base = dict(num_joints=3, net_type="resnet_50", location_refinement=True)
    base.update(kw)
    return PoseConfig(**base)


@pytest.fixture(scope="module")
def resnet_model():
    cfg = _cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (64, 48))
    apply = jax.jit(model.apply)
    return model, variables, apply


def test_scoremap_size_formula():
    cfg = _cfg()
    assert scoremap_size(cfg, (64, 64)) == (8, 8)
    assert scoremap_size(cfg, (747, 832)) == (94, 104)  # Reaching demo dims


def test_resnet50_forward_shapes(resnet_model):
    _, variables, apply = resnet_model
    out = apply(variables, jnp.zeros((2, 64, 48, 3)))
    # 16x backbone stride, 2x deconv => total stride 8
    assert out["part_pred"].shape == (2, 8, 6, 3)
    assert out["locref"].shape == (2, 8, 6, 6)


def test_mean_pixel_subtraction_changes_output(resnet_model):
    _, variables, apply = resnet_model
    a = apply(variables, jnp.zeros((2, 64, 48, 3)))
    b = apply(variables, jnp.full((2, 64, 48, 3), 123.68))
    assert not np.allclose(np.asarray(a["part_pred"]),
                           np.asarray(b["part_pred"]))


def test_frozen_bn_deterministic_across_calls(resnet_model):
    _, variables, apply = resnet_model
    x = jnp.ones((2, 64, 48, 3)) * 50
    y1 = apply(variables, x)["part_pred"]
    y2 = apply(variables, x)["part_pred"]
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_param_structure_has_expected_blocks(resnet_model):
    _, variables, _ = resnet_model
    params = variables["params"]
    backbone_key = [k for k in params if k.startswith("ResNetV1")][0]
    blocks = params[backbone_key]
    assert "conv1" in blocks
    assert "block4_unit3" in blocks  # resnet-50: 3 units in block4
    assert "block3_unit6" in blocks  # resnet-50: 6 units in block3
    assert "part_pred" in params and "locref_pred" in params
    assert "batch_stats" in variables


def test_mobilenet_forward_shapes():
    cfg = _cfg(net_type="mobilenet_v2_0.35")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (64, 64))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out["part_pred"].shape == (1, 8, 8, 3)


def test_bfloat16_compute_dtype():
    cfg = _cfg(net_type="mobilenet_v2_0.35")
    model = PoseModel(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)))
    # heads cast back to f32 for the loss
    assert out["part_pred"].dtype == jnp.float32


def test_unknown_net_type_raises():
    with pytest.raises(ValueError):
        cfg = _cfg(net_type="resnet_33")
        init_model(cfg, jax.random.PRNGKey(0), (32, 32))


def test_intermediate_supervision_training():
    """intermediate_supervision=True adds the block3 head and its CE term to
    the DLC loss (ref: pose_net.py:69-78, 181-186)."""
    import numpy as np

    from deepgraphpose_tpu.train import steps as steps_lib

    cfg = _cfg(intermediate_supervision=True)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    assert "intermediate_supervision" in variables["params"]

    tx = steps_lib.make_optimizer(0.005)
    opt_state = tx.init(variables["params"])
    step = steps_lib.make_dlc_train_step(model, cfg, tx)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    coords = jnp.asarray(rng.uniform(2, 28, (2, cfg.num_joints, 2)),
                         jnp.float32)
    present = jnp.ones((2, cfg.num_joints), bool)
    variables, opt_state, out = step(variables, opt_state, imgs, coords,
                                     present, 0)
    assert "part_loss_interm" in out
    assert np.isfinite(float(out["part_loss_interm"]))
    assert float(out["total_loss"]) > float(out["part_loss_interm"])


def test_mobilenet_dgp_train_step():
    """The DGP objective trains over the MobileNetV2 backbone too."""
    import numpy as np

    from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams
    from deepgraphpose_tpu.train import steps as steps_lib

    cfg = _cfg(net_type="mobilenet_v2_0.35")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    nj = cfg.num_joints
    lp = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=4.0,
        n_hidden_frames_total=8.0,
        S0=np.zeros((0, nj), np.float32),
        ws=np.zeros((0,), np.float32), ws_max=np.zeros((0,), np.float32))
    tx = steps_lib.make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    step = steps_lib.make_dgp_train_step(model, lp, tx)
    rng = np.random.default_rng(0)
    t = 2
    imgs = jnp.asarray(rng.uniform(0, 255, (t, 32, 32, 3)), jnp.float32)
    vis = np.zeros(t * nj, np.float32)
    vis[:nj] = 1
    batch = dict(
        targets=jnp.asarray(rng.uniform(0, 3, (t, nj, 2)), jnp.float32),
        visible_mask=jnp.asarray(vis), hidden_mask=jnp.asarray(1 - vis),
        frame_mask=jnp.ones(t), wt_batch=jnp.zeros(t - 1),
        pair_mask=jnp.ones(t - 1), flow=jnp.zeros((t - 1, 32, 32)))
    variables, opt_state, out = step(variables, opt_state, imgs, batch)
    assert np.isfinite(float(out["total_loss"]))


def test_bn_train_mode_updates_stats_and_learns():
    """bn_train=True normalizes by batch stats and EWMA-updates the
    batch_stats collection; eval-mode forward then uses the updated moving
    stats (the from-scratch extension — the reference always freezes BN)."""
    from deepgraphpose_tpu.train import steps as steps_lib

    cfg = _cfg(net_type="mobilenet_v2_0.35")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    stats0 = jax.tree_util.tree_map(np.array, variables["batch_stats"])

    tx = steps_lib.make_optimizer(0.005)
    opt_state = tx.init(variables["params"])
    step = steps_lib.make_dlc_train_step(model, cfg, tx, bn_train=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)
    coords = jnp.asarray(rng.uniform(2, 28, (2, cfg.num_joints, 2)),
                         jnp.float32)
    present = jnp.ones((2, cfg.num_joints), bool)
    variables, opt_state, out = step(variables, opt_state, imgs, coords,
                                     present, 0)
    assert np.isfinite(float(out["total_loss"]))
    stats1 = jax.tree_util.tree_map(np.array, variables["batch_stats"])
    leaves0 = jax.tree_util.tree_leaves(stats0)
    leaves1 = jax.tree_util.tree_leaves(stats1)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1)), \
        "batch_stats were not updated by the bn_train step"
    # eval-mode forward with the updated stats stays finite and is the
    # frozen path (no further stat mutation required)
    heads = model.apply(variables, imgs)
    assert np.all(np.isfinite(np.asarray(heads["part_pred"])))


def test_bn_train_dgp_step_updates_stats():
    from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams
    from deepgraphpose_tpu.train import steps as steps_lib

    cfg = _cfg(net_type="mobilenet_v2_0.35")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    nj = cfg.num_joints
    lp = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=4.0,
        n_hidden_frames_total=8.0,
        S0=np.zeros((0, nj), np.float32),
        ws=np.zeros((0,), np.float32), ws_max=np.zeros((0,), np.float32))
    tx = steps_lib.make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    step = steps_lib.make_dgp_train_step(model, lp, tx, bn_train=True)
    stats0 = jax.tree_util.tree_map(np.array, variables["batch_stats"])
    rng = np.random.default_rng(0)
    t = 2
    imgs = jnp.asarray(rng.uniform(0, 255, (t, 32, 32, 3)), jnp.float32)
    vis = np.zeros(t * nj, np.float32)
    vis[:nj] = 1
    batch = dict(
        targets=jnp.asarray(rng.uniform(0, 3, (t, nj, 2)), jnp.float32),
        visible_mask=jnp.asarray(vis), hidden_mask=jnp.asarray(1 - vis),
        frame_mask=jnp.ones(t), wt_batch=jnp.zeros(t - 1),
        pair_mask=jnp.ones(t - 1), flow=jnp.zeros((t - 1, 32, 32)))
    variables, opt_state, out = step(variables, opt_state, imgs, batch)
    assert np.isfinite(float(out["total_loss"]))
    stats1 = jax.tree_util.tree_map(np.array, variables["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree_util.tree_leaves(stats0),
                   jax.tree_util.tree_leaves(stats1)))
