"""MobileNetV2 backbones (width 1.0 / 0.75 / 0.5 / 0.35).

Capability parity with the reference's alternative backbone
(ref: deeplabcut/pose_estimation_tensorflow/nnet/pose_net_mobilenet.py:31-200,
mobilenet_v2.py) — inverted-residual blocks with frozen BN, output_stride
control via dilation, feature tap at the final 1x1 expansion (1280 ch,
scaled by the width multiplier with a 1280 floor as in the TF slim impl).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from deepgraphpose_tpu.models.resnet import FrozenBatchNorm

# (expansion, out_channels, num_units, first_stride)
_V2_SPEC = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

WIDTHS = {
    "mobilenet_v2_1.0": 1.0,
    "mobilenet_v2_0.75": 0.75,
    "mobilenet_v2_0.5": 0.5,
    "mobilenet_v2_0.35": 0.35,
}


def _depth(channels: int, multiplier: float, divisor: int = 8) -> int:
    """TF slim make_divisible."""
    v = max(divisor, int(channels * multiplier + divisor / 2) // divisor * divisor)
    if v < 0.9 * channels * multiplier:
        v += divisor
    return v


def unit_plan(width: float, output_stride: int):
    """Resolved per-unit plan: (name, expansion, out_ch, stride, rate).

    Encodes the stride/atrous policy once so the flax module and the int8
    quantized forward (models/quant.py) share one structure definition —
    same pattern as models/resnet.py::unit_plan.
    """
    plan = []
    current_stride = 2  # after the stride-2 stem
    rate = 1
    for b, (exp, out_c, n_units, first_stride) in enumerate(_V2_SPEC):
        out_ch = _depth(out_c, width)
        for u in range(n_units):
            stride = first_stride if u == 0 else 1
            if stride != 1 and current_stride >= output_stride:
                unit_stride, unit_rate = 1, rate
                rate *= stride
            else:
                unit_stride, unit_rate = stride, rate
            plan.append((f"block{b}_unit{u}", exp, out_ch, unit_stride,
                         unit_rate))
            current_stride *= unit_stride
    return plan


class InvertedResidual(nn.Module):
    expansion: int
    out_ch: int
    stride: int
    rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion
        bn = lambda name, z: FrozenBatchNorm(dtype=self.dtype, name=name)(
            z, train)
        y = x
        if self.expansion != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)
            y = nn.relu6(bn("expand_bn", y))
        y = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.rate, self.rate), padding="SAME",
                    feature_group_count=mid, use_bias=False, dtype=self.dtype,
                    name="depthwise")(y)
        y = nn.relu6(bn("depthwise_bn", y))
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = bn("project_bn", y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    width: float = 1.0
    output_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        bn = lambda name, z: FrozenBatchNorm(dtype=self.dtype, name=name)(
            z, train)
        ch = _depth(32, self.width)
        x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = nn.relu6(bn("stem_bn", x))
        end_points = {}
        for name, exp, out_ch, unit_stride, unit_rate in unit_plan(
                self.width, self.output_stride):
            x = InvertedResidual(
                expansion=exp, out_ch=out_ch, stride=unit_stride,
                rate=unit_rate, dtype=self.dtype, name=name)(x, train)
            end_points[name.split("_")[0]] = x
        # final 1x1: 1280 channels floor (TF slim keeps >= 1280 at width<1)
        last = _depth(1280, max(self.width, 1.0))
        x = nn.Conv(last, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_head")(x)
        x = nn.relu6(bn("head_bn", x))
        end_points["head"] = x
        return x, end_points


def make_backbone(net_type: str, output_stride: int = 16,
                  dtype: Any = jnp.float32) -> MobileNetV2:
    if net_type not in WIDTHS:
        raise ValueError(f"unknown mobilenet variant {net_type!r}; "
                         f"available: {sorted(WIDTHS)}")
    return MobileNetV2(width=WIDTHS[net_type], output_stride=output_stride,
                       dtype=dtype)
