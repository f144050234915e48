"""PoseModel: backbone + scoremap / locref heads.

ref: deeplabcut/pose_estimation_tensorflow/nnet/pose_net.py:28-196 (PoseNet).
Input preprocessing matches the reference: subtract the ImageNet mean pixel,
no scaling (ref: pose_net.py:38-41).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.heads import PredictionHead
from deepgraphpose_tpu.models.resnet import make_backbone
from deepgraphpose_tpu.models import mobilenet as mobilenet_lib


class PoseModel(nn.Module):
    """Flax module producing part-prediction and locref logits.

    Output spatial size is ``ceil(H / output_stride) * deconvolutionstride``
    per side (total stride 8 with the defaults).
    """

    cfg: PoseConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 return_features: bool = False) -> dict:
        """images: (T, H, W, 3) float32 RGB in [0, 255].

        ``train=True`` runs batch-norm on batch statistics and updates the
        moving stats (pass ``mutable=["batch_stats"]``) — a from-scratch
        extension; the reference always freezes BN (ref: pose_net.py:52).
        ``return_features=True`` adds the backbone output under
        ``"features"`` (the head-only training tap, train/headonly.py —
        the working redesign of the reference's preprocess/ feature dump,
        ref: preprocess/get_morig_resnet_outputs.py).
        """
        mean = jnp.asarray(self.cfg.mean_pixel, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean).astype(self.dtype)

        if self.cfg.net_type.startswith("mobilenet"):
            backbone = mobilenet_lib.make_backbone(
                self.cfg.net_type, output_stride=self.cfg.output_stride,
                dtype=self.dtype)
        else:
            backbone = make_backbone(
                self.cfg.net_type, output_stride=self.cfg.output_stride,
                dtype=self.dtype)
        features, end_points = backbone(x, train)

        heads = {}
        if return_features:
            heads["features"] = features
        heads["part_pred"] = PredictionHead(
            self.cfg.num_joints, self.cfg.deconvolutionstride,
            dtype=self.dtype, name="part_pred")(features).astype(jnp.float32)
        if self.cfg.location_refinement:
            heads["locref"] = PredictionHead(
                self.cfg.num_joints * 2, self.cfg.deconvolutionstride,
                dtype=self.dtype, name="locref_pred")(features).astype(jnp.float32)
        if self.cfg.intermediate_supervision and not self.cfg.net_type.startswith("mobilenet"):
            # supervise an intermediate block-3 tap (ref: pose_net.py:69-78)
            layer = min(self.cfg.intermediate_supervision_layer,
                        6 if self.cfg.net_type == "resnet_50" else
                        self.cfg.intermediate_supervision_layer)
            del layer  # block tap below is the block3 output
            heads["part_pred_interm"] = PredictionHead(
                self.cfg.num_joints, self.cfg.deconvolutionstride,
                dtype=self.dtype, name="intermediate_supervision")(
                    end_points["block3"]).astype(jnp.float32)
        return heads


def scoremap_size(cfg: PoseConfig, in_hw: tuple[int, int]) -> tuple[int, int]:
    """Predicted scoremap dims for an input size (ref: dataset.py:348-371
    discovers this by a throwaway forward pass; here it is a formula).

    ResNets follow the slim spatial recurrence exactly: conv2d_same root
    (out = ceil(h/2)), VALID 3x3/2 max-pool (out = (h-3)//2 + 1), then one
    ceil-halving per strided block until output_stride. MobileNetV2 is
    SAME-padded throughout, so it reduces to ceil(h/output_stride).
    Dims verified against a raw-TF-ops slim reconstruction
    (tests/test_tf_parity.py) for sizes where the two formulas disagree.
    """
    import math

    s = cfg.output_stride
    d = cfg.deconvolutionstride
    if cfg.net_type.startswith("mobilenet"):
        return (math.ceil(in_hw[0] / s) * d, math.ceil(in_hw[1] / s) * d)

    def one_side(h: int) -> int:
        h = (h + 1) // 2            # root 7x7/2, explicit pad (3,3)
        h = (h - 3) // 2 + 1        # pool1 3x3/2 VALID
        stride = 4
        while stride < s:           # strided last units (conv2d_same 3x3/2)
            h = (h + 1) // 2
            stride *= 2
        return h * d

    return (one_side(in_hw[0]), one_side(in_hw[1]))


def init_model(cfg: PoseConfig, rng: jax.Array, in_hw: tuple[int, int] = (64, 64),
               dtype: Any = jnp.float32):
    """Initialize (model, variables) with a tiny dummy batch."""
    model = PoseModel(cfg, dtype=dtype)
    dummy = jnp.zeros((1, in_hw[0], in_hw[1], 3), jnp.float32)
    variables = model.init(rng, dummy)
    return model, variables
