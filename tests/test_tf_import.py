"""TF checkpoint importer tests.

Covers the three contracts of models/tf_import.py:
1. name mapping covers every backbone + head variable (nothing silently
   unmapped except expected skips),
2. deconv kernel transform numerically matches tf.nn.conv2d_transpose,
3. a real TF checkpoint written with slim-style variable names round-trips
   through load_tf_checkpoint_arrays -> import_tf_arrays into the Flax tree.

TensorFlow is only required for (2)+(3); both skip if absent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models import tf_import
from deepgraphpose_tpu.models.pose_model import init_model

tf = pytest.importorskip("tensorflow")


def _small_model(nj=3, net_type="resnet_50"):
    cfg = PoseConfig(num_joints=nj, net_type=net_type,
                     all_joints_names=[f"bp{i}" for i in range(nj)])
    return init_model(cfg, jax.random.PRNGKey(0), (32, 32))


def test_name_map_is_total_for_resnet50():
    _, variables = _small_model()
    unmapped = []
    n_mapped = 0
    for path, _ in tf_import._iter_paths(variables):
        entry = tf_import.tf_name_for_path(path, "resnet_50")
        if entry is None:
            unmapped.append("/".join(path))
        else:
            n_mapped += 1
    # every variable of the standard model must have a TF counterpart
    assert not unmapped, f"unmapped paths: {unmapped[:8]}"
    # resnet50: 53 convs + 53 BNs*4 + heads (2 deconvs * 2 vars)
    assert n_mapped == 53 + 53 * 4 + 4


def test_name_map_examples():
    name, _ = tf_import.tf_name_for_path(
        ("params", "ResNetV1_0", "block3_unit4", "conv2", "kernel"),
        "resnet_101")
    assert name == "resnet_v1_101/block3/unit_4/bottleneck_v1/conv2/weights"
    name, _ = tf_import.tf_name_for_path(
        ("batch_stats", "ResNetV1_0", "block1_unit1", "shortcut_bn", "var"),
        "resnet_50")
    assert name == ("resnet_v1_50/block1/unit_1/bottleneck_v1/shortcut/"
                    "BatchNorm/moving_variance")
    name, _ = tf_import.tf_name_for_path(
        ("params", "part_pred", "block4", "bias"), "resnet_50")
    assert name == "pose/part_pred/block4/biases"


def test_deconv_transform_matches_tf_conv2d_transpose(rng):
    """flax ConvTranspose(imported kernel) == tf.nn.conv2d_transpose."""
    b, h, w, cin, cout, stride = 2, 5, 7, 4, 3, 2
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    k_tf = rng.standard_normal((3, 3, cout, cin)).astype(np.float32)

    y_tf = tf.nn.conv2d_transpose(
        tf.constant(x), tf.constant(k_tf),
        output_shape=(b, h * stride, w * stride, cout),
        strides=(1, stride, stride, 1), padding="SAME").numpy()

    import flax.linen as nn

    k_flax = tf_import._deconv_from_tf(k_tf)
    mod = nn.ConvTranspose(cout, (3, 3), strides=(stride, stride),
                           padding="SAME", use_bias=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, cin)))
    variables = {"params": {"kernel": jnp.asarray(k_flax)}}
    y_flax = np.asarray(mod.apply(variables, jnp.asarray(x)))

    assert y_flax.shape == y_tf.shape
    np.testing.assert_allclose(y_flax, y_tf, rtol=1e-5, atol=1e-5)
    # round trip
    np.testing.assert_array_equal(tf_import._deconv_to_tf(k_flax), k_tf)


def test_checkpoint_roundtrip(tmp_path, rng):
    """Write a slim-named TF checkpoint, import, check values + report."""
    _, variables = _small_model()

    # Build TF variables named exactly like the slim/DGP checkpoint.
    arrays = {}
    for path, leaf in tf_import._iter_paths(variables):
        name, transform = tf_import.tf_name_for_path(path, "resnet_50")
        arr = rng.standard_normal(np.shape(leaf)).astype(np.float32)
        if transform is tf_import._deconv_from_tf:
            arr = tf_import._deconv_to_tf(arr)
        arrays[name] = arr

    g = tf.Graph()
    with g.as_default():
        tf_vars = [tf.compat.v1.get_variable(
            name, initializer=tf.constant(val))
            for name, val in arrays.items()]
        saver = tf.compat.v1.train.Saver(var_list=tf_vars)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(tmp_path / "snapshot-step2-final--0"))

    loaded = tf_import.load_tf_checkpoint_arrays(ckpt)
    assert set(loaded) >= set(arrays)

    new_vars, report = tf_import.import_tf_arrays(variables, loaded,
                                                  net_type="resnet_50")
    assert not report["missing"]
    assert len(report["imported"]) == 53 + 53 * 4 + 4

    # spot-check: backbone conv passes through untouched
    np.testing.assert_array_equal(
        new_vars["params"]["ResNetV1_0"]["conv1"]["kernel"],
        arrays["resnet_v1_50/conv1/weights"])
    # deconv kernel got the flip+swap
    got = new_vars["params"]["part_pred"]["block4"]["kernel"]
    want = tf_import._deconv_from_tf(arrays["pose/part_pred/block4/weights"])
    np.testing.assert_array_equal(got, want)
    # original tree untouched
    assert not np.array_equal(
        variables["params"]["ResNetV1_0"]["conv1"]["kernel"],
        new_vars["params"]["ResNetV1_0"]["conv1"]["kernel"])

    # scope filter: only resnet
    bb_only, report2 = tf_import.import_tf_arrays(
        variables, loaded, net_type="resnet_50", scopes=("resnet",))
    assert len(report2["imported"]) == 53 + 53 * 4
    np.testing.assert_array_equal(
        bb_only["params"]["part_pred"]["block4"]["bias"],
        variables["params"]["part_pred"]["block4"]["bias"])


def test_export_tf_arrays_roundtrip():
    _, variables = _small_model()
    exported = tf_import.export_tf_arrays(variables, "resnet_50")
    back, report = tf_import.import_tf_arrays(variables, exported,
                                              net_type="resnet_50")
    assert not report["missing"]
    for path, leaf in tf_import._iter_paths(variables):
        node = back
        for k in path:
            node = node[k]
        np.testing.assert_allclose(np.asarray(leaf, np.float32), node,
                                   rtol=0, atol=0)


def test_write_tf_checkpoint_roundtrip(tmp_path):
    """Flax -> TF checkpoint on disk -> Flax again, bit-exact."""
    _, variables = _small_model()
    prefix = tf_import.write_tf_checkpoint(
        variables, str(tmp_path / "snapshot-step2-final--0"), "resnet_50")
    loaded = tf_import.load_tf_checkpoint_arrays(prefix)
    back, report = tf_import.import_tf_arrays(variables, loaded,
                                              net_type="resnet_50")
    assert not report["missing"]
    for path, leaf in tf_import._iter_paths(variables):
        node = back
        for k in path:
            node = node[k]
        np.testing.assert_array_equal(np.asarray(leaf, np.float32), node)


def test_mobilenet_name_map_total_and_roundtrip():
    """Every MobileNetV2 variable maps to a slim name (ref:
    pose_net_mobilenet.py:31-200 loads slim MobilenetV2 checkpoints), and
    export -> import is bit-exact including the depthwise layout swap."""
    cfg = PoseConfig(num_joints=3, net_type="mobilenet_v2_1.0",
                     all_joints_names=["a", "b", "c"])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (64, 64))

    arrays = tf_import.export_tf_arrays(variables, "mobilenet_v2_1.0")
    # canonical slim names present
    for name in ("MobilenetV2/Conv/weights",
                 "MobilenetV2/Conv/BatchNorm/moving_variance",
                 "MobilenetV2/expanded_conv/depthwise/depthwise_weights",
                 "MobilenetV2/expanded_conv/project/weights",
                 "MobilenetV2/expanded_conv_16/project/weights",
                 "MobilenetV2/Conv_1/weights",
                 "pose/part_pred/block4/weights"):
        assert name in arrays, name
    # the first op (expansion=1) has no expand conv, later ones do
    assert "MobilenetV2/expanded_conv/expand/weights" not in arrays
    assert "MobilenetV2/expanded_conv_1/expand/weights" in arrays
    # depthwise kernels are TF layout (H, W, C, 1)
    dw = arrays["MobilenetV2/expanded_conv/depthwise/depthwise_weights"]
    assert dw.shape[:2] == (3, 3) and dw.shape[3] == 1

    # every backbone/head variable is covered (nothing silently skipped)
    def count(tree):
        return sum(count(v) if isinstance(v, dict) else 1
                   for v in tree.values())

    assert len(arrays) == count(variables["params"]) + count(
        variables["batch_stats"])

    new_vars, report = tf_import.import_tf_arrays(
        variables, arrays, net_type="mobilenet_v2_1.0")
    assert not report["missing"]
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(new_vars)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_depthwise_transform_matches_tf(rng):
    """flax grouped conv with the transformed kernel == tf depthwise conv."""
    tf = pytest.importorskip("tensorflow")

    c = 8
    x = rng.normal(0, 1, (1, 10, 12, c)).astype(np.float32)
    w_tf = rng.normal(0, 1, (3, 3, c, 1)).astype(np.float32)
    out_tf = np.asarray(tf.nn.depthwise_conv2d(
        x, w_tf, strides=(1, 1, 1, 1), padding="SAME"))

    import flax.linen as nn

    w_fl = tf_import._depthwise_from_tf(w_tf)
    conv = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                   use_bias=False)
    out_fl = conv.apply({"params": {"kernel": jnp.asarray(w_fl)}},
                        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_fl), out_tf, atol=1e-5)
