"""Flax ResNet-v1 backbones (50 / 101 / 152) with frozen batch-norm.

Behavioral spec from the reference (ref: deeplabcut/pose_estimation_tensorflow/
nnet/pose_net.py:36-53): slim ``resnet_v1_{50,101,152}`` with
``global_pool=False, output_stride=16, is_training=False`` — i.e. BN always
uses the stored moving statistics (a per-channel affine transform), strides
live on the *last* unit of each block (slim v1 convention), and when the
accumulated stride hits ``output_stride`` the remaining units switch to
dilated (atrous) convolutions.

TPU-first notes:
* Frozen BN folds into a scale/offset pair at apply time — XLA fuses it into
  the preceding convolution, so there is no BN cost at all on the MXU.
* Padding follows slim exactly (bit-parity with TF1 DGP snapshots): stride-1
  convs use TF-style 'SAME'; *strided* convs use slim's ``conv2d_same``
  (explicit symmetric pad of kernel-1, then VALID), and the root max-pool is
  VALID — these differ from plain 'SAME' both in edge values and, for some
  input sizes, in output dims. Verified against a raw-TF-ops reconstruction
  of the slim graph in tests/test_tf_parity.py.
* ``compute_dtype`` lets the whole trunk run in bfloat16 on the MXU while
  parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

BLOCK_UNITS = {
    "resnet_50": (3, 4, 6, 3),
    "resnet_101": (3, 4, 23, 3),
    "resnet_152": (3, 8, 36, 3),
}


def same_pad_for_stride(kernel: int, rate: int = 1) -> tuple[int, int]:
    """slim ``conv2d_same`` explicit padding for strided convs.

    slim pads (effective_kernel - 1) symmetrically and convolves VALID,
    which differs from TF 'SAME' for stride > 1 (SAME biases padding to the
    bottom/right). ref: tf.contrib.slim resnet_utils.conv2d_same, used by
    resnet_v1 for the root 7x7 and every strided 3x3.
    """
    keff = kernel + (kernel - 1) * (rate - 1)
    total = keff - 1
    return (total // 2, total - total // 2)


class FrozenBatchNorm(nn.Module):
    """BatchNorm defaulting to pure inference mode (moving stats constant).

    gamma/beta remain trainable parameters (slim keeps them in the trainable
    set even with is_training=False); mean/var live in the ``batch_stats``
    collection and are never updated by the optimizer.

    ``train=True`` normalizes by batch statistics and EWMA-updates the
    moving stats (requires ``mutable=["batch_stats"]`` at apply time). The
    reference never exposes this — it always warm-starts from ImageNet with
    ``is_training=False`` (ref: pose_net.py:52) — but from-scratch training
    (no pretrained checkpoint available) collapses without normalization, so
    this framework adds it as an opt-in extension (``fit_dlc(bn_train=...)``,
    auto-enabled when no warm start is found).
    """

    epsilon: float = 1e-5
    momentum: float = 0.99
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((features,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            batch_mean = jnp.mean(xf, axis=axes)
            batch_var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                m = self.momentum
                mean.value = m * mean.value + (1.0 - m) * batch_mean
                var.value = m * var.value + (1.0 - m) * batch_var
            use_mean, use_var = batch_mean, batch_var
        else:
            use_mean, use_var = mean.value, var.value
        # fold into a single multiply-add; XLA fuses this into the conv
        inv = scale / jnp.sqrt(use_var + self.epsilon)
        y = x * inv.astype(self.dtype) + (bias - use_mean * inv).astype(self.dtype)
        return y


class BottleneckV1(nn.Module):
    """slim resnet_v1 bottleneck unit: 1x1 -> 3x3(stride/rate) -> 1x1 + skip."""

    depth: int             # output channels
    depth_bottleneck: int  # bottleneck channels
    stride: int = 1
    rate: int = 1          # dilation for the 3x3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_depth = x.shape[-1]

        def conv(f, k, s, d, name):
            # slim: stride-1 convs are 'SAME'; strided convs are conv2d_same
            # (explicit symmetric pad + VALID) — edge values differ.
            pad = ("SAME" if s == 1
                   else (same_pad_for_stride(k, d),) * 2)
            return nn.Conv(f, (k, k), strides=(s, s), kernel_dilation=(d, d),
                           padding=pad, use_bias=False, dtype=self.dtype,
                           name=name)

        bn = lambda name, y: FrozenBatchNorm(dtype=self.dtype, name=name)(
            y, train)

        if in_depth != self.depth:
            shortcut = conv(self.depth, 1, self.stride, 1, "shortcut_conv")(x)
            shortcut = bn("shortcut_bn", shortcut)
        elif self.stride != 1:
            # slim subsample(): 1x1 max-pool with stride
            shortcut = nn.max_pool(x, (1, 1), strides=(self.stride, self.stride))
        else:
            shortcut = x

        y = conv(self.depth_bottleneck, 1, 1, 1, "conv1")(x)
        y = nn.relu(bn("bn1", y))
        y = conv(self.depth_bottleneck, 3, self.stride, self.rate, "conv2")(y)
        y = nn.relu(bn("bn2", y))
        y = conv(self.depth, 1, 1, 1, "conv3")(y)
        y = bn("bn3", y)
        return nn.relu(shortcut + y)


def unit_plan(units: Sequence[int], output_stride: int):
    """Resolved per-unit plan: (name, depth, depth_bottleneck, stride, rate).

    Encodes the slim v1 stride/atrous policy once — stride 2 on the *last*
    unit of blocks 1-3 (block4 stride 1), switching to dilated convs when
    the accumulated stride reaches ``output_stride`` — so the flax module
    and the int8 quantized forward (models/quant.py) consume the identical
    structure and cannot drift. ref: tf.contrib.slim resnet_v1.resnet_v1 /
    resnet_utils.stack_blocks_dense.
    """
    depths = (256, 512, 1024, 2048)
    bottlenecks = (64, 128, 256, 512)
    plan = []
    current_stride = 4
    rate = 1
    for b, (n_units, depth, db) in enumerate(
            zip(units, depths, bottlenecks)):
        block_stride = 2 if b < 3 else 1
        for u in range(n_units):
            unit_stride = block_stride if u == n_units - 1 else 1
            if unit_stride != 1 and current_stride >= output_stride:
                # switch to atrous: keep resolution, grow the rate
                effective_stride = 1
                unit_rate = rate
                rate = rate * unit_stride
            else:
                effective_stride = unit_stride
                unit_rate = rate
            plan.append((f"block{b + 1}_unit{u + 1}", depth, db,
                         effective_stride, unit_rate))
            current_stride *= effective_stride
    return plan


class ResNetV1(nn.Module):
    """ResNet-v1 trunk with output_stride control (no global pool / fc)."""

    units: Sequence[int] = (3, 4, 6, 3)
    output_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # slim root: conv2d_same(64, 7, stride=2) -> pad (3,3) + VALID,
        # then a VALID 3x3/2 max-pool (slim.max_pool2d default padding).
        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=(same_pad_for_stride(7),) * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        end_points = {}
        for name, depth, db, stride, rate in unit_plan(
                self.units, self.output_stride):
            x = BottleneckV1(depth=depth, depth_bottleneck=db, stride=stride,
                             rate=rate, dtype=self.dtype, name=name)(x, train)
            end_points[name.split("_")[0]] = x
        return x, end_points


def make_backbone(net_type: str, output_stride: int = 16,
                  dtype: Any = jnp.float32) -> ResNetV1:
    if net_type not in BLOCK_UNITS:
        raise ValueError(
            f"unknown net_type {net_type!r}; available: {sorted(BLOCK_UNITS)}"
            " (mobilenet variants: deepgraphpose_tpu.models.mobilenet)")
    return ResNetV1(units=BLOCK_UNITS[net_type], output_stride=output_stride,
                    dtype=dtype)
