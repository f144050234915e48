"""TF-checkpoint -> Flax weight importer.

The reference initializes its backbone from slim's ImageNet
``resnet_v1_50.ckpt`` (ref: README.md:50-53, demo/run_dgp_demo.py:108-111)
and each training step restores the previous step's TF1 snapshot by
variable-scope filters ``resnet`` / ``pose/part_pred`` / ``pose/locref_pred``
(ref: src/deepgraphpose/models/fitdgp.py:393-400, 688-695). This module maps
those TF variable names onto this package's Flax tree so that

* ImageNet warm-starts work from the stock slim checkpoint, and
* TF1 DGP snapshots can be imported for apples-to-apples RMSE comparison
  (BASELINE.md: per-keypoint RMSE within 1 px of TF1 DGP).

Layout notes:
* slim conv weights are HWIO — identical to Flax ``nn.Conv``; no transpose.
* TF ``conv2d_transpose`` kernels are (H, W, out, in) and the op computes the
  *adjoint* of a strided conv (kernel spatially mirrored relative to
  ``lax.conv_transpose``'s default). Flax ``nn.ConvTranspose`` kernels are
  (H, W, in, out) with no mirroring, so imported deconv kernels are flipped
  along both spatial axes and have their channel axes swapped. Verified
  numerically against ``tf.nn.conv2d_transpose`` in
  tests/test_tf_import.py.
* slim BatchNorm {gamma, beta, moving_mean, moving_variance} map onto
  FrozenBatchNorm {scale, bias} (params) and {mean, var} (batch_stats).

Only TensorFlow's checkpoint *reader* is needed, and only when importing
from an on-disk checkpoint; ``import_tf_arrays`` is pure numpy.
"""

from __future__ import annotations

import re
from typing import Callable, Mapping

import numpy as np

_BN_MAP = {
    # (flax collection, flax leaf) -> slim BatchNorm suffix
    ("params", "scale"): "gamma",
    ("params", "bias"): "beta",
    ("batch_stats", "mean"): "moving_mean",
    ("batch_stats", "var"): "moving_variance",
}

_HEAD_SCOPES = {
    "part_pred": "pose/part_pred",
    "locref_pred": "pose/locref_pred",
    "intermediate_supervision": "pose/intermediate_supervision",
}


def _deconv_from_tf(arr: np.ndarray) -> np.ndarray:
    """TF conv2d_transpose (H, W, out, in) -> Flax ConvTranspose (H, W, in, out).

    TF's op mirrors the kernel spatially relative to ``lax.conv_transpose``
    (flax default ``transpose_kernel=False``), hence the double flip.
    """
    return np.ascontiguousarray(arr[::-1, ::-1].transpose(0, 1, 3, 2))


def _deconv_to_tf(arr: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_deconv_from_tf` (used by the snapshot exporter)."""
    return np.ascontiguousarray(arr.transpose(0, 1, 3, 2)[::-1, ::-1])


def _depthwise_from_tf(arr: np.ndarray) -> np.ndarray:
    """TF depthwise (H, W, C, mult=1) -> flax grouped conv (H, W, 1, C).

    Self-inverse under the same transpose (mult == 1), so the exporter
    reuses it. TF applies filter [:, :, c, 0] to channel c; a flax conv
    with feature_group_count=C applies kernel[:, :, 0, c] to group c.
    """
    return np.ascontiguousarray(arr.transpose(0, 1, 3, 2))


# flat slim index of (block, unit): slim names the 17 inverted-residual ops
# expanded_conv, expanded_conv_1 ... expanded_conv_16 in order
_V2_UNITS = (1, 2, 3, 4, 3, 3, 1)
_V2_OFFSETS = tuple(sum(_V2_UNITS[:b]) for b in range(len(_V2_UNITS)))


def _mobilenet_scope(block: int, unit: int) -> str:
    flat = _V2_OFFSETS[block] + unit
    suffix = "" if flat == 0 else f"_{flat}"
    return f"MobilenetV2/expanded_conv{suffix}"


def tf_name_for_path(path: tuple[str, ...], net_type: str) -> tuple[str, Callable] | None:
    """Map one Flax variable path to (tf_variable_name, array_transform).

    ``path`` is (collection, module..., leaf), e.g.
    ``("params", "ResNetV1_0", "block1_unit2", "conv1", "kernel")``.
    Returns None for paths with no TF counterpart.
    """
    scope = f"resnet_v1_{net_type.split('_')[-1]}"
    collection, *mods, leaf = path
    ident = lambda a: a

    # --- backbone ---
    if mods and mods[0].startswith("ResNetV1"):
        mods = mods[1:]
        if not mods:
            return None
        if mods[0] == "conv1" and leaf == "kernel":
            return f"{scope}/conv1/weights", ident
        if mods[0] == "bn1":
            return (f"{scope}/conv1/BatchNorm/{_BN_MAP[(collection, leaf)]}",
                    ident)
        m = re.fullmatch(r"block(\d+)_unit(\d+)", mods[0])
        if m:
            base = (f"{scope}/block{m.group(1)}/unit_{m.group(2)}/"
                    "bottleneck_v1")
            sub = mods[1]
            cm = re.fullmatch(r"conv(\d)", sub)
            if cm and leaf == "kernel":
                return f"{base}/conv{cm.group(1)}/weights", ident
            bm = re.fullmatch(r"bn(\d)", sub)
            if bm:
                return (f"{base}/conv{bm.group(1)}/BatchNorm/"
                        f"{_BN_MAP[(collection, leaf)]}", ident)
            if sub == "shortcut_conv" and leaf == "kernel":
                return f"{base}/shortcut/weights", ident
            if sub == "shortcut_bn":
                return (f"{base}/shortcut/BatchNorm/"
                        f"{_BN_MAP[(collection, leaf)]}", ident)
        return None

    # --- MobileNetV2 backbone (slim scope MobilenetV2, ref:
    # pose_net_mobilenet.py:31-200 / mobilenet_v2.py) ---
    if mods and mods[0].startswith("MobileNetV2"):
        mods = mods[1:]
        if not mods:
            return None
        bn_leaf = _BN_MAP.get((collection, leaf))
        if mods[0] == "conv_stem" and leaf == "kernel":
            return "MobilenetV2/Conv/weights", ident
        if mods[0] == "stem_bn" and bn_leaf:
            return f"MobilenetV2/Conv/BatchNorm/{bn_leaf}", ident
        if mods[0] == "conv_head" and leaf == "kernel":
            return "MobilenetV2/Conv_1/weights", ident
        if mods[0] == "head_bn" and bn_leaf:
            return f"MobilenetV2/Conv_1/BatchNorm/{bn_leaf}", ident
        m = re.fullmatch(r"block(\d+)_unit(\d+)", mods[0])
        if m:
            base = _mobilenet_scope(int(m.group(1)), int(m.group(2)))
            sub = mods[1]
            if sub == "depthwise" and leaf == "kernel":
                return f"{base}/depthwise/depthwise_weights", _depthwise_from_tf
            if sub in ("expand", "project") and leaf == "kernel":
                return f"{base}/{sub}/weights", ident
            bm = re.fullmatch(r"(expand|depthwise|project)_bn", sub)
            if bm and bn_leaf:
                return f"{base}/{bm.group(1)}/BatchNorm/{bn_leaf}", ident
        return None

    # --- heads: pose/{part_pred,locref_pred,intermediate_supervision}/block4 ---
    if mods and mods[0] in _HEAD_SCOPES:
        # flax: params/<head>/block4/{kernel,bias}
        tf_scope = _HEAD_SCOPES[mods[0]]
        if leaf == "kernel":
            return f"{tf_scope}/block4/weights", _deconv_from_tf
        if leaf == "bias":
            return f"{tf_scope}/block4/biases", ident
    return None


def _iter_paths(tree: Mapping, prefix: tuple = ()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _iter_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _set_path(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def import_tf_arrays(variables: Mapping, arrays: Mapping[str, np.ndarray],
                     net_type: str = "resnet_50",
                     scopes: tuple[str, ...] | None = None,
                     strict_shapes: bool = True) -> tuple[dict, dict]:
    """Copy TF-named arrays into a Flax variable tree.

    Args:
      variables: Flax variables ({'params': ..., 'batch_stats': ...}).
      arrays: mapping of TF variable name -> numpy array (e.g. from
        :func:`load_tf_checkpoint_arrays`).
      net_type: resnet_50 / resnet_101 / resnet_152.
      scopes: if given, only TF names starting with one of these prefixes are
        imported (mirrors the reference's scope-filtered restores,
        ref: fitdgp.py:393-400 — e.g. ``("resnet",)`` for ImageNet
        warm-start, ``("resnet", "pose")`` for a full DGP snapshot).
      strict_shapes: raise on shape mismatch instead of skipping.

    Returns:
      (new_variables, report) where report = {'imported': [...],
      'missing': [...tf names wanted but absent...], 'skipped': [...]}.
    """
    # deep-copy the nested dict structure so _set_path does not mutate input
    def _deep(d):
        return {k: _deep(v) if isinstance(v, Mapping) else v
                for k, v in d.items()}

    new_vars = _deep(variables)
    report = {"imported": [], "missing": [], "skipped": []}
    for path, leaf in _iter_paths(variables):
        entry = tf_name_for_path(path, net_type)
        if entry is None:
            report["skipped"].append("/".join(path))
            continue
        tf_name, transform = entry
        if scopes is not None and not tf_name.startswith(tuple(scopes)):
            report["skipped"].append("/".join(path))
            continue
        if tf_name not in arrays:
            report["missing"].append(tf_name)
            continue
        arr = transform(np.asarray(arrays[tf_name]))
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            msg = (f"shape mismatch for {tf_name}: checkpoint {arr.shape} "
                   f"vs model {np.shape(leaf)}")
            if strict_shapes:
                raise ValueError(msg)
            report["missing"].append(tf_name + f" ({msg})")
            continue
        _set_path(new_vars, path, np.asarray(arr, dtype=np.float32))
        report["imported"].append(tf_name)
    return new_vars, report


def load_tf_checkpoint_arrays(ckpt_path: str,
                              prefix_filter: tuple[str, ...] | None = None
                              ) -> dict[str, np.ndarray]:
    """Read every (optionally prefix-filtered) tensor from a TF checkpoint.

    Works for both slim ImageNet checkpoints (``resnet_v1_50.ckpt``) and TF1
    DGP snapshots (``snapshot-step2-final--0``). Requires tensorflow (reader
    only); gated so the rest of the package never imports TF.
    """
    try:
        from tensorflow.python.training import py_checkpoint_reader
    except Exception as e:  # pragma: no cover - env without TF
        raise ImportError(
            "reading TF checkpoints requires tensorflow; alternatively "
            "export the variables to .npz and use import_tf_arrays") from e
    reader = py_checkpoint_reader.NewCheckpointReader(str(ckpt_path))
    out = {}
    for name in reader.get_variable_to_shape_map():
        if prefix_filter and not name.startswith(tuple(prefix_filter)):
            continue
        out[name] = reader.get_tensor(name)
    return out


def import_tf_checkpoint(variables: Mapping, ckpt_path: str,
                         net_type: str = "resnet_50",
                         scopes: tuple[str, ...] | None = None) -> tuple[dict, dict]:
    """Load + import a TF checkpoint in one call (see import_tf_arrays)."""
    arrays = load_tf_checkpoint_arrays(ckpt_path)
    return import_tf_arrays(variables, arrays, net_type=net_type,
                            scopes=scopes)


def write_tf_checkpoint(variables: Mapping, ckpt_prefix: str,
                        net_type: str = "resnet_50") -> str:
    """Write a TF1-style checkpoint a DLC/DGP TF harness can restore.

    Produces ``<ckpt_prefix>.{index,data-...}`` with slim variable names
    (``resnet_v1_50/...``, ``pose/part_pred/block4/...``) so the original
    TF1 evaluation stack can load weights trained here — the reverse
    direction of :func:`import_tf_checkpoint`. Requires tensorflow.
    """
    try:
        import tensorflow as tf
    except Exception as e:  # pragma: no cover - env without TF
        raise ImportError("writing TF checkpoints requires tensorflow") from e

    arrays = export_tf_arrays(variables, net_type)
    g = tf.Graph()
    with g.as_default():
        tf_vars = [tf.compat.v1.get_variable(name,
                                             initializer=tf.constant(val))
                   for name, val in arrays.items()]
        saver = tf.compat.v1.train.Saver(var_list=tf_vars)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            out = saver.save(sess, str(ckpt_prefix))
    return out


def export_tf_arrays(variables: Mapping,
                     net_type: str = "resnet_50") -> dict[str, np.ndarray]:
    """Flax variables -> TF-named arrays (round-trip inverse of import).

    Useful for writing snapshots a TF1 DGP evaluation harness can restore.
    """
    out = {}
    for path, leaf in _iter_paths(variables):
        entry = tf_name_for_path(path, net_type)
        if entry is None:
            continue
        tf_name, transform = entry
        arr = np.asarray(leaf, dtype=np.float32)
        if transform is _deconv_from_tf:
            arr = _deconv_to_tf(arr)
        elif transform is _depthwise_from_tf:
            arr = _depthwise_from_tf(arr)  # self-inverse
        out[tf_name] = arr
    return out
