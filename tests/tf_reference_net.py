"""Raw-TF-ops reconstruction of the reference forward pass, for parity tests.

Rebuilds, with nothing but ``tf.nn`` primitives (TF2 is installed; the
reference's ``tf.contrib.slim`` is not), the exact computation the reference
runs (ref: deeplabcut/pose_estimation_tensorflow/nnet/pose_net.py:36-53 —
slim ``resnet_v1_{50,101,152}`` with ``global_pool=False, output_stride=16,
is_training=False``; ref: src/deepgraphpose/models/fitdgp_util.py:18-74
(dgp_prediction_layer) and 281-402 (gaussian smoothing + argmax_2d_from_cm)).

slim semantics reproduced here:
* resnet_arg_scope: BatchNorm epsilon 1e-5, scale=True; inference mode
  (moving stats are constants).
* resnet_utils.conv2d_same for the root 7x7/2 and every strided 3x3:
  explicit symmetric pad of (effective_kernel - 1) then VALID.
* slim.max_pool2d default padding is VALID (root pool1 3x3/2).
* resnet_utils.subsample: identity-shortcut downsampling = strided slicing.
* stack_blocks_dense: stride on the LAST unit of each block; once the
  accumulated stride reaches output_stride, further units run dilated with
  an accumulating rate.
* prediction layers: 3x3 ``conv2d_transpose`` stride 2, 'SAME', + bias.

Weights come in TF checkpoint naming/layout, i.e. exactly what
``deepgraphpose_tpu.models.tf_import.export_tf_arrays`` emits, so one weight
set drives both implementations.
"""

from __future__ import annotations

import numpy as np

BLOCK_UNITS = {
    "resnet_50": (3, 4, 6, 3),
    "resnet_101": (3, 4, 23, 3),
    "resnet_152": (3, 8, 36, 3),
}
_DEPTHS = (256, 512, 1024, 2048)
_BOTTLENECKS = (64, 128, 256, 512)
_BN_EPS = 1e-5
MEAN_PIXEL = (123.68, 116.779, 103.939)


def _tf():
    import tensorflow as tf
    return tf


def _bn(tf, x, arrays, scope):
    gamma = arrays[f"{scope}/gamma"]
    beta = arrays[f"{scope}/beta"]
    mean = arrays[f"{scope}/moving_mean"]
    var = arrays[f"{scope}/moving_variance"]
    inv = gamma / np.sqrt(var + _BN_EPS)
    return x * inv + (beta - mean * inv)


def _conv2d_same(tf, x, w, stride, rate=1):
    """slim resnet_utils.conv2d_same: explicit pad + VALID for stride > 1."""
    if stride == 1:
        return tf.nn.conv2d(x, w, strides=1, padding="SAME",
                            dilations=(rate, rate))
    k = int(w.shape[0])
    keff = k + (k - 1) * (rate - 1)
    total = keff - 1
    beg, end = total // 2, total - total // 2
    x = tf.pad(x, [[0, 0], [beg, end], [beg, end], [0, 0]])
    return tf.nn.conv2d(x, w, strides=(1, stride, stride, 1), padding="VALID",
                        dilations=(rate, rate))


def _bottleneck(tf, x, arrays, base, depth, depth_bottleneck, stride, rate):
    in_depth = int(x.shape[-1])
    if depth != in_depth:
        shortcut = tf.nn.conv2d(x, arrays[f"{base}/shortcut/weights"],
                                strides=(1, stride, stride, 1), padding="SAME")
        shortcut = _bn(tf, shortcut, arrays, f"{base}/shortcut/BatchNorm")
    elif stride != 1:
        shortcut = x[:, ::stride, ::stride, :]  # subsample(): 1x1 pool
    else:
        shortcut = x
    y = tf.nn.conv2d(x, arrays[f"{base}/conv1/weights"], strides=1,
                     padding="SAME")
    y = tf.nn.relu(_bn(tf, y, arrays, f"{base}/conv1/BatchNorm"))
    y = _conv2d_same(tf, y, arrays[f"{base}/conv2/weights"], stride, rate)
    y = tf.nn.relu(_bn(tf, y, arrays, f"{base}/conv2/BatchNorm"))
    y = tf.nn.conv2d(y, arrays[f"{base}/conv3/weights"], strides=1,
                     padding="SAME")
    y = _bn(tf, y, arrays, f"{base}/conv3/BatchNorm")
    return tf.nn.relu(shortcut + y)


def slim_resnet_features(arrays, images_u8, net_type="resnet_50",
                         output_stride=16):
    """images (uint8/float, T,H,W,3 RGB 0-255) -> block4 features (numpy)."""
    tf = _tf()
    scope = f"resnet_v1_{net_type.split('_')[-1]}"
    x = tf.constant(np.asarray(images_u8, np.float32) -
                    np.asarray(MEAN_PIXEL, np.float32))
    x = _conv2d_same(tf, x, arrays[f"{scope}/conv1/weights"], stride=2)
    x = tf.nn.relu(_bn(tf, x, arrays, f"{scope}/conv1/BatchNorm"))
    x = tf.nn.max_pool2d(x, ksize=3, strides=2, padding="VALID")

    current_stride, rate = 4, 1
    for b, (n_units, depth, db) in enumerate(
            zip(BLOCK_UNITS[net_type], _DEPTHS, _BOTTLENECKS)):
        block_stride = 2 if b < 3 else 1
        for u in range(n_units):
            unit_stride = block_stride if u == n_units - 1 else 1
            base = f"{scope}/block{b + 1}/unit_{u + 1}/bottleneck_v1"
            if current_stride == output_stride:
                x = _bottleneck(tf, x, arrays, base, depth, db, 1, rate)
                rate *= unit_stride
            else:
                x = _bottleneck(tf, x, arrays, base, depth, db, unit_stride, 1)
                current_stride *= unit_stride
    return np.asarray(x)


def prediction_head(arrays, features, scope, num_outputs, stride=2):
    """slim.conv2d_transpose 3x3/stride, SAME, + bias (TF kernel layout)."""
    tf = _tf()
    w = tf.constant(np.asarray(arrays[f"{scope}/block4/weights"], np.float32))
    b = np.asarray(arrays[f"{scope}/block4/biases"], np.float32)
    feats = tf.constant(np.asarray(features, np.float32))
    n, h, wd = features.shape[0], features.shape[1], features.shape[2]
    out = tf.nn.conv2d_transpose(
        feats, w, output_shape=(n, h * stride, wd * stride, num_outputs),
        strides=(1, stride, stride, 1), padding="SAME")
    return np.asarray(out) + b


def argmax_2d_from_cm(scoremaps, nj, gamma=1.0, gauss_len=2.0):
    """Reference soft-argmax (fitdgp_util.py:342-402) in raw TF ops.

    Returns (mu, smoothed) with mu (T, nj, 2) as (row, col).
    """
    tf = _tf()
    sm = np.asarray(scoremaps, np.float32)
    t, h, w, c = sm.shape
    flat = tf.reshape(tf.transpose(tf.constant(sm), [0, 3, 1, 2]), (t * c, -1))
    probs = tf.nn.softmax(flat * gamma)
    probs = tf.transpose(tf.reshape(probs, (t, c, h, w)), [0, 2, 3, 1])

    # make_gaussian_2d_kernel + apply_gaussian_2d_kernel: zero pad by
    # gauss_len, depthwise VALID conv with the 2-D outer-product kernel
    radius = int(gauss_len * 1.0)
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k1 = np.exp(-0.5 * np.square(x / gauss_len))
    k1 = k1 / k1.sum()
    k2 = np.outer(k1, k1).astype(np.float32)
    kernel = tf.constant(np.tile(k2[:, :, None, None], (1, 1, c, 1)))
    padded = tf.pad(probs, [[0, 0], [radius, radius], [radius, radius],
                            [0, 0]], "CONSTANT")
    smoothed = tf.nn.depthwise_conv2d(padded, kernel, strides=(1, 1, 1, 1),
                                      padding="VALID")
    norm = tf.reduce_sum(smoothed, axis=(1, 2), keepdims=True)
    smoothed = smoothed / (norm + 1e-100)

    rows = np.arange(h, dtype=np.float32)[None, :, None, None]
    cols = np.arange(w, dtype=np.float32)[None, None, :, None]
    mu_r = tf.reduce_sum(smoothed * rows, axis=(1, 2))
    mu_c = tf.reduce_sum(smoothed * cols, axis=(1, 2))
    mu = tf.stack([mu_r, mu_c], axis=-1)
    return np.asarray(mu), np.asarray(smoothed)


def reference_forward(arrays, images_u8, num_joints, net_type="resnet_50",
                      output_stride=16, gamma=1.0, gauss_len=2.0):
    """Full reference-pipeline forward: features, heads, soft-argmax."""
    feats = slim_resnet_features(arrays, images_u8, net_type, output_stride)
    part = prediction_head(arrays, feats, "pose/part_pred", num_joints)
    locref = prediction_head(arrays, feats, "pose/locref_pred",
                             2 * num_joints)
    mu, smoothed = argmax_2d_from_cm(part, num_joints, gamma, gauss_len)
    return dict(features=feats, part_pred=part, locref=locref, mu=mu,
                smoothed=smoothed)
