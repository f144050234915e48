"""Deconvolutional prediction heads.

ref: deeplabcut/pose_estimation_tensorflow/nnet/pose_net.py:18-26
(prediction_layer — 3x3 conv2d_transpose, stride = deconvolutionstride,
'SAME' padding, no activation) and src/deepgraphpose/models/
fitdgp_util.py:18-74 (dgp_prediction_layer, same op with optional constant
initialization from DLC weights).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PredictionHead(nn.Module):
    """3x3 transposed conv, stride 2 by default; logits output."""

    num_outputs: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.num_outputs, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", dtype=self.dtype, name="block4")(x)
