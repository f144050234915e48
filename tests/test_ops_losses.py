"""Loss-primitive parity tests vs literal numpy TF-semantics implementations."""

import numpy as np
import jax.numpy as jnp

from deepgraphpose_tpu.ops.losses import (
    sigmoid_cross_entropy, sigmoid_cross_entropy_elements, huber_loss,
    weighted_loss, masked_mean_per_map)


def np_sigmoid_ce(labels, logits):
    return (np.maximum(logits, 0) - logits * labels
            + np.log1p(np.exp(-np.abs(logits))))


def test_sigmoid_ce_plain_mean(rng):
    labels = rng.uniform(size=(3, 5, 7)).astype(np.float32)
    logits = rng.normal(size=(3, 5, 7)).astype(np.float32)
    got = float(sigmoid_cross_entropy(jnp.asarray(labels), jnp.asarray(logits)))
    want = np_sigmoid_ce(labels, logits).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sigmoid_ce_elements_stable_large_logits():
    ce = sigmoid_cross_entropy_elements(jnp.asarray([1.0]), jnp.asarray([1e4]))
    assert np.isfinite(float(ce[0]))


def test_huber_sum_by_nonzero_weights(rng):
    labels = rng.normal(size=(4, 6)).astype(np.float32)
    preds = rng.normal(size=(4, 6)).astype(np.float32) * 3
    w = (rng.uniform(size=(4, 6)) > 0.5).astype(np.float32)
    got = float(huber_loss(jnp.asarray(labels), jnp.asarray(preds), jnp.asarray(w)))
    d = preds - labels
    h = np.where(np.abs(d) < 1.0, 0.5 * d ** 2, np.abs(d) - 0.5)
    want = (h * w).sum() / max((w != 0).sum(), 1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_loss_broadcast_count():
    # per-row weights broadcast over columns; count counts broadcast elements
    l = jnp.ones((2, 4))
    w = jnp.asarray([1.0, 0.0]).reshape(2, 1)
    got = float(weighted_loss(l, w))
    # sum = 4, present = 4 elements in row 0
    np.testing.assert_allclose(got, 1.0)


def test_weighted_loss_all_zero_weights():
    assert float(weighted_loss(jnp.ones((3, 3)), 0.0)) == 0.0


def test_masked_mean_per_map_matches_gathered_mean(rng):
    vals = rng.normal(size=(6, 4, 5)).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 0], np.float32)
    got = float(masked_mean_per_map(jnp.asarray(vals), jnp.asarray(mask)))
    want = vals[mask.astype(bool)].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_mean_empty_mask_is_zero(rng):
    vals = jnp.asarray(rng.normal(size=(3, 2, 2)).astype(np.float32))
    assert float(masked_mean_per_map(vals, jnp.zeros(3))) == 0.0
