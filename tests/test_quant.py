"""int8 post-training quantization (models/quant.py).

The fold-parity test proves BN folding + the functional backbone walk
against the flax module exactly; the int8 tests bound the quantization
error of the full forward and check the duck-typed inference call sites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.models import quant as quant_lib


def _setup(nj=4, hw=(75, 83), net="resnet_50", seed=0):
    cfg = PoseConfig(num_joints=nj, net_type=net)
    model, variables = init_model(cfg, jax.random.PRNGKey(seed), hw)
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (2, *hw, 3)).astype(np.float32)
    return cfg, model, variables, images


def test_fold_parity_exact():
    """Folded-weight f32 walk == flax backbone (topology + BN fold)."""
    cfg, model, variables, images = _setup()
    # give the frozen BN non-trivial stats/affine so folding is exercised
    rng = np.random.default_rng(1)

    def jitter(tree, lo, hi):
        return jax.tree_util.tree_map(
            lambda x: x * jnp.asarray(rng.uniform(lo, hi, x.shape),
                                      x.dtype), tree)

    variables = {
        "params": variables["params"],
        "batch_stats": jitter(variables["batch_stats"], 0.5, 2.0),
    }
    variables["params"] = jax.tree_util.tree_map(jnp.asarray,
                                                 variables["params"])

    heads = model.apply(variables, jnp.asarray(images),
                        return_features=True)
    folded = quant_lib.folded_backbone_weights(variables)
    _, feats = jax.jit(
        lambda im: quant_lib._collect_forward(cfg, folded, im))(
            jnp.asarray(images))
    f = np.asarray(feats)
    r = np.asarray(heads["features"])
    # fold is algebraically exact; only float reassociation differs
    # (measured ~6e-7 relative at 50 layers deep)
    assert np.abs(f - r).max() <= 1e-5 * np.abs(r).max()


def test_int8_forward_close_and_ducktyped():
    cfg, model, variables, images = _setup()
    qmodel, qvars = quant_lib.quantize_model(cfg, variables, images,
                                             dtype=jnp.float32)

    ref = model.apply(variables, jnp.asarray(images))
    out = jax.jit(qmodel.apply)(qvars, jnp.asarray(images))
    assert set(out) == set(ref)
    for k in ("part_pred", "locref"):
        r = np.asarray(ref[k])
        q = np.asarray(out[k])
        assert np.all(np.isfinite(q))
        scale = np.abs(r).max() + 1e-9
        err = np.abs(q - r).max() / scale
        # int8 PTQ across ~50 stacked convs: a few percent relative error
        assert err < 0.25, f"{k}: rel err {err:.3f}"
        corr = np.corrcoef(r.ravel(), q.ravel())[0, 1]
        assert corr > 0.99, f"{k}: corr {corr:.4f}"

    # weights really are int8
    assert all(v.dtype == jnp.int8 for v in qvars["qw"].values())

    # decode argmax agreement: the quantized scoremap must peak in (nearly)
    # the same cell
    r = np.asarray(ref["part_pred"])
    q = np.asarray(out["part_pred"])
    b, h, w, nj = r.shape
    ri = r.reshape(b, -1, nj).argmax(1)
    qi = q.reshape(b, -1, nj).argmax(1)
    rrc = np.stack(np.unravel_index(ri, (h, w)), -1)
    qrc = np.stack(np.unravel_index(qi, (h, w)), -1)
    dist = np.abs(rrc - qrc).max(-1)
    assert (dist <= 1).mean() >= 0.75


def test_infer_fn_accepts_quantized_model():
    from deepgraphpose_tpu.infer.predict import make_infer_fn

    cfg, model, variables, images = _setup(hw=(64, 64))
    qmodel, qvars = quant_lib.quantize_model(cfg, variables, images)
    infer = make_infer_fn(qmodel, cfg)
    mu, lik = infer(qvars, jnp.asarray(images, jnp.uint8))
    assert mu.shape == (2, cfg.num_joints, 2)
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all((np.asarray(lik) >= 0) & (np.asarray(lik) <= 1))


def test_unknown_backbone_rejected():
    bad = PoseConfig(num_joints=3, net_type="vit_b16")
    with pytest.raises(NotImplementedError):
        quant_lib.quantize_model(bad, {"params": {}}, np.zeros((1, 8, 8, 3)))


def test_mobilenet_fold_parity_and_int8():
    cfg, model, variables, images = _setup(hw=(64, 80),
                                           net="mobilenet_v2_0.35")
    rng = np.random.default_rng(1)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map(
            lambda x: x * jnp.asarray(rng.uniform(0.5, 2.0, x.shape),
                                      x.dtype), variables["batch_stats"]),
    }
    heads = model.apply(variables, jnp.asarray(images), return_features=True)
    folded = quant_lib.folded_backbone_weights(variables)
    _, feats = jax.jit(
        lambda im: quant_lib._collect_forward(cfg, folded, im))(
            jnp.asarray(images))
    f = np.asarray(feats)
    r = np.asarray(heads["features"])
    assert np.abs(f - r).max() <= 1e-5 * np.abs(r).max() + 1e-6

    qmodel, qvars = quant_lib.quantize_model(cfg, variables, images,
                                             dtype=jnp.float32)
    out = jax.jit(qmodel.apply)(qvars, jnp.asarray(images))
    q = np.asarray(out["part_pred"])
    rp = np.asarray(model.apply(variables, jnp.asarray(images))["part_pred"])
    assert np.all(np.isfinite(q))
    corr = np.corrcoef(rp.ravel(), q.ravel())[0, 1]
    assert corr > 0.99, f"corr {corr:.4f}"
    # depthwise sites stayed float
    assert any(s.endswith("/depthwise") for s in qvars["dw"])
    assert not any(s.endswith("/depthwise") for s in qvars["qw"])


def test_dynamic_crop_accepts_quantized_model():
    from deepgraphpose_tpu.infer.dynamic import make_crop_infer_fn

    cfg, model, variables, images = _setup(hw=(64, 80))
    qmodel, qvars = quant_lib.quantize_model(cfg, variables, images)
    fn = make_crop_infer_fn(qmodel, cfg, (48, 64))
    center = jnp.asarray([32.0, 40.0])
    mu, lik = fn(qvars, jnp.asarray(images, jnp.uint8), center)
    assert mu.shape == (2, cfg.num_joints, 2)
    assert np.all(np.isfinite(np.asarray(mu)))


def test_percentile_calibration_clips_scales():
    cfg, model, variables, images = _setup(hw=(64, 64))
    _, qv_max = quant_lib.quantize_model(cfg, variables, images)
    qmodel, qv_p = quant_lib.quantize_model(cfg, variables, images,
                                            calib_percentile=99.0)
    for site, s in qv_p["act_scale"].items():
        assert float(s) <= float(qv_max["act_scale"][site]) + 1e-12
    out = jax.jit(qmodel.apply)(qv_p, jnp.asarray(images))
    assert np.all(np.isfinite(np.asarray(out["part_pred"])))


def test_bias_correction_changes_biases_and_not_worse():
    cfg, model, variables, images = _setup(hw=(64, 64))
    ref = np.asarray(model.apply(variables, jnp.asarray(images))["part_pred"])
    _, qv_off = quant_lib.quantize_model(cfg, variables, images,
                                         dtype=jnp.float32,
                                         bias_correction=False)
    qmodel, qv_on = quant_lib.quantize_model(cfg, variables, images,
                                             dtype=jnp.float32,
                                             bias_correction=True)
    changed = any(
        float(jnp.abs(qv_on["bias"][s] - qv_off["bias"][s]).max()) > 0
        for s in qv_on["bias"])
    assert changed
    out_off = np.asarray(jax.jit(qmodel.apply)(
        qv_off, jnp.asarray(images))["part_pred"])
    out_on = np.asarray(jax.jit(qmodel.apply)(
        qv_on, jnp.asarray(images))["part_pred"])
    err_off = np.abs(out_off - ref).mean()
    err_on = np.abs(out_on - ref).mean()
    # one-shot correction must not make things worse (usually improves)
    assert err_on <= err_off * 1.05, (err_on, err_off)


def test_residual_int8_close_to_plain_int8():
    """The int8 residual carry adds only block-boundary requantization
    noise on top of the plain int8 model (PERF.md round-4 lever)."""
    cfg, model, variables, images = _setup()
    qm, qv = quant_lib.quantize_model(cfg, variables, images,
                                      dtype=jnp.float32)
    qm_res, qv_res = quant_lib.quantize_model(cfg, variables, images,
                                              dtype=jnp.float32,
                                              residual_int8=True)
    assert qm_res.residual_int8 and not qm.residual_int8
    ref = model.apply(variables, jnp.asarray(images))
    out = jax.jit(qm.apply)(qv, jnp.asarray(images))
    out_res = jax.jit(qm_res.apply)(qv_res, jnp.asarray(images))
    for k in ("part_pred", "locref"):
        r = np.asarray(ref[k])
        q = np.asarray(out_res[k])
        assert np.all(np.isfinite(q))
        scale = np.abs(r).max() + 1e-9
        # vs f32: same class of bound as the plain int8 model
        assert np.abs(q - r).max() / scale < 0.30, k
        # vs plain int8: the carries add little on top
        p = np.asarray(out[k])
        assert np.abs(q - p).max() / scale < 0.15, k
        assert np.corrcoef(r.ravel(), q.ravel())[0, 1] > 0.99, k

    # scoremap argmax stays put
    r = np.asarray(ref["part_pred"])
    q = np.asarray(out_res["part_pred"])
    b, h, w, nj = r.shape
    ri = r.reshape(b, -1, nj).argmax(1)
    qi = q.reshape(b, -1, nj).argmax(1)
    rrc = np.stack(np.unravel_index(ri, (h, w)), -1)
    qrc = np.stack(np.unravel_index(qi, (h, w)), -1)
    assert (np.abs(rrc - qrc).max(-1) <= 1).mean() >= 0.75


def test_mobilenet_residual_int8_rejected():
    """residual_int8 is a ResNet carry lowering; on mobilenet it must
    refuse rather than silently no-op while export metadata claims the
    mode (round-4 advisor finding)."""
    import pytest

    cfg, _, variables, images = _setup(hw=(64, 80), net="mobilenet_v2_0.35")
    with pytest.raises(NotImplementedError, match="residual_int8"):
        quant_lib.quantize_model(cfg, variables, images,
                                 residual_int8=True)
