"""Loss primitives with TF1-parity reduction semantics.

The reference relies on ``tf.losses.sigmoid_cross_entropy`` /
``tf.losses.compute_weighted_loss`` with the default
SUM_BY_NONZERO_WEIGHTS reduction (sum(w * l) / count(w != 0)); getting the
same normalizers is required for step-for-step training parity
(ref: pose_net.py:165-196, nnet/losses.py:16-45, fitdgp.py:1025-1055).

Mask-based redesign: where the reference gathers dynamic marker subsets
(``tf.gather`` over feed_dict index lists), these functions take static-shape
tensors plus {0,1} marker masks, so the whole objective jits once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy_elements(labels: jnp.ndarray,
                                   logits: jnp.ndarray) -> jnp.ndarray:
    """Elementwise sigmoid CE, stable form: max(x,0) - x*z + log1p(exp(-|x|))."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_cross_entropy(labels: jnp.ndarray, logits: jnp.ndarray,
                          weights=1.0) -> jnp.ndarray:
    """TF-semantics sigmoid CE: sum(w * ce) / count(broadcast w != 0).

    With scalar weight 1.0 this is the plain mean (ref: pose_net.py:176-179).
    """
    ce = sigmoid_cross_entropy_elements(labels, logits)
    return weighted_loss(ce, weights)


def huber_elements(labels: jnp.ndarray, predictions: jnp.ndarray,
                   k: float = 1.0) -> jnp.ndarray:
    """Huber: 0.5 x^2 if |x| <= k else k|x| - 0.5 k^2 (ref: losses.py:16-45)."""
    diff = predictions - labels
    abs_diff = jnp.abs(diff)
    return jnp.where(abs_diff < k, 0.5 * diff * diff,
                     k * abs_diff - 0.5 * k * k)


def huber_loss(labels: jnp.ndarray, predictions: jnp.ndarray,
               weights=1.0, k: float = 1.0) -> jnp.ndarray:
    return weighted_loss(huber_elements(labels, predictions, k), weights)


def mse_loss(labels: jnp.ndarray, predictions: jnp.ndarray,
             weights=1.0) -> jnp.ndarray:
    return weighted_loss(jnp.square(predictions - labels), weights)


def weighted_loss(losses: jnp.ndarray, weights) -> jnp.ndarray:
    """TF compute_weighted_loss, reduction=SUM_BY_NONZERO_WEIGHTS.

    ``weights`` broadcasts against ``losses``; the denominator counts the
    number of *broadcast* elements with nonzero weight.
    """
    weights = jnp.asarray(weights, dtype=losses.dtype)
    w = jnp.broadcast_to(weights, losses.shape)
    num_present = jnp.sum((w != 0).astype(losses.dtype))
    total = jnp.sum(losses * w)
    return jnp.where(num_present > 0, total / jnp.maximum(num_present, 1.0), 0.0)


def masked_mean_per_map(values: jnp.ndarray, marker_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of per-marker maps over the selected markers.

    values: (N, H, W) per-marker elementwise losses.
    marker_mask: (N,) {0,1} selection.

    Equals TF's mean over a gathered (K, H, W) subset: sum over selected
    elements / (K * H * W).
    """
    n, h, w = values.shape
    m = marker_mask.astype(values.dtype)
    total = jnp.sum(values * m[:, None, None])
    count = jnp.sum(m) * h * w
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)
