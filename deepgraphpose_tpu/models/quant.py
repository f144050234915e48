"""Post-training int8 quantization of the pose forward pass (inference).

Why this exists: PERF.md's int8 MXU probe (scripts/int8_conv_probe.py)
measured XLA's conv engaging the v5e's int8 MXU path at 304.9 TOPS vs
145.2 TOPS bf16 on the ResNet block4 shape — a 2.1x kernel-rate win. The
backbone is ~93% of the 143 GFLOP/frame forward cost, so an int8 backbone
is the single-chip lever that moves full-frame throughput past the bf16
roofline. The reference has no quantized path (pose_net.py runs f32
end-to-end; ref: deeplabcut/pose_estimation_tensorflow/nnet/pose_net.py);
this is a TPU-first extension.

Scheme — standard symmetric post-training quantization:

* frozen batch-norm folds into each conv exactly (the reference freezes BN
  at inference, ref: pose_net.py:52): ``W' = W * inv[oc]``,
  ``b = beta - mean * inv`` with ``inv = gamma / sqrt(var + eps)``;
* weights: per-output-channel symmetric int8, ``sw[oc] = max|W'[..,oc]|/127``;
* activations: per-conv-input per-tensor symmetric int8, scale calibrated
  as the max |x| over user-supplied calibration frames;
* the conv itself runs int8 x int8 -> int32 on the MXU
  (``preferred_element_type=int32``); one fused f32 epilogue applies
  ``y = conv * (sx * sw[oc]) + b`` (+ ReLU). Max-pools and zero padding
  are exact in the quantized domain (symmetric => zero-point 0);
* inter-layer activations are CARRIED NARROW — this is where the int8
  kernel-rate win is otherwise lost to HBM traffic (measured: an f32
  carry made the int8 model 0.88x the bf16 one end-to-end). Inside each
  bottleneck the conv1->conv2->conv3 chain requantizes in the epilogue
  (``int8 = clip(round((acc*oscale+b).relu / sx_next))``) so the tensor
  between convs is 1 byte/element — numerically identical to quantizing
  a wide carry, since the fused epilogue computes in f32 either way.
  Block boundaries (residual adds, the stem/maxpool) carry bfloat16;
* the 3x3 deconv heads (~5 of 143 GF/frame) stay in the model dtype —
  they set the sub-cell precision of the decode, so they are not worth
  quantizing;
* backbones: every ResNet variant, and MobileNetV2 (all widths) with the
  dense 1x1/stem/head convs quantized and the VPU-bound depthwise 3x3s
  kept float.

The result duck-types ``PoseModel``: ``qmodel.apply(qvariables, images)``
returns the same heads dict, so ``make_infer_fn`` / ``estimate_pose`` /
``analyze_videos`` take it unchanged.

Usage::

    qmodel, qvars = quantize_model(cfg, variables, calib_images)
    infer = make_infer_fn(qmodel, cfg)       # jitted int8 forward
    mu, lik = infer(qvars, images_u8)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.heads import PredictionHead
from deepgraphpose_tpu.models.resnet import (BLOCK_UNITS, same_pad_for_stride,
                                             unit_plan)

_BN_EPS = 1e-5  # FrozenBatchNorm.epsilon


def _fold(kernel, bn_params, bn_stats):
    """Fold frozen BN into the preceding conv: (W', bias)."""
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    return kernel * inv, bn_params["bias"] - bn_stats["mean"] * inv


def _backbone_scope(params: dict) -> tuple[str, str]:
    """-> (kind, scope) where kind is 'resnet' | 'mobilenet'."""
    for k in params:
        if k.startswith("ResNetV1"):
            return "resnet", k
        if k.startswith("MobileNetV2"):
            return "mobilenet", k
    raise NotImplementedError(
        "int8 quantization supports the ResNet and MobileNetV2 backbones "
        f"(param scopes: {sorted(params)})")


def folded_backbone_weights(variables: dict) -> dict:
    """{site: (W_folded f32 HWIO, bias f32)} for every backbone conv."""
    kind, scope = _backbone_scope(variables["params"])
    p = variables["params"][scope]
    s = variables["batch_stats"][scope]
    if kind == "mobilenet":
        out = {"conv_stem": _fold(p["conv_stem"]["kernel"], p["stem_bn"],
                                  s["stem_bn"]),
               "conv_head": _fold(p["conv_head"]["kernel"], p["head_bn"],
                                  s["head_bn"])}
        for name in p:
            if not name.startswith("block"):
                continue
            for conv in ("expand", "depthwise", "project"):
                if conv in p[name]:
                    out[f"{name}/{conv}"] = _fold(
                        p[name][conv]["kernel"], p[name][f"{conv}_bn"],
                        s[name][f"{conv}_bn"])
        return out
    out = {"conv1": _fold(p["conv1"]["kernel"], p["bn1"], s["bn1"])}
    for name in p:
        if not name.startswith("block"):
            continue
        for conv, bn in (("conv1", "bn1"), ("conv2", "bn2"),
                         ("conv3", "bn3"), ("shortcut_conv", "shortcut_bn")):
            if conv in p[name]:
                out[f"{name}/{conv}"] = _fold(p[name][conv]["kernel"],
                                              p[name][bn], s[name][bn])
    return out


def _conv(x, w, stride: int, rate: int, pad, preferred=None,
          groups: int = 1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=preferred)


def _pad_for(k: int, stride: int, rate: int):
    # slim: stride-1 convs are TF 'SAME'; strided convs are conv2d_same
    # (explicit symmetric pad + VALID) — models/resnet.py BottleneckV1.
    return "SAME" if stride == 1 else (same_pad_for_stride(k, rate),) * 2


def _walk_mobilenet(cfg: PoseConfig, width: float, x, conv_fn, dw_fn):
    """MobileNetV2 topology over models/mobilenet.py::unit_plan.

    ``conv_fn`` serves the dense (1x1 / stem) convs — the quantized FLOP
    bulk; ``dw_fn(site, x, stride, rate)`` serves the depthwise 3x3s, which
    stay float: they are VPU-bound (one MAC per pixel-channel), so int8
    gains nothing on the MXU, and grouped int8 conv lowering is uneven.
    """
    from deepgraphpose_tpu.models import mobilenet as mnet

    x = conv_fn("conv_stem", x, 2, 1, relu=True)
    end_points = {}
    for name, exp, out_ch, stride, rate in mnet.unit_plan(
            width, cfg.output_stride):
        y = x
        if exp != 1:
            y = conv_fn(f"{name}/expand", y, 1, 1, relu=True)
        y = dw_fn(f"{name}/depthwise", y, stride, rate)
        y = conv_fn(f"{name}/project", y, 1, 1, relu=False)
        x = x + y if (stride == 1 and x.shape[-1] == y.shape[-1]) else y
        end_points[name.split("_")[0]] = x
    x = conv_fn("conv_head", x, 1, 1, relu=True)
    end_points["head"] = x
    return x, end_points


def _walk_backbone(cfg: PoseConfig, units, x, conv_fn, block_out=None,
                   deq=None):
    """Shared backbone topology; ``conv_fn(site, x, stride, rate, relu)``.

    Consumes models/resnet.py::unit_plan so the quantized forward and the
    flax module share one structure definition.

    ``block_out(unit_name, x)`` post-processes each unit's wide (post-add,
    post-relu) output — the int8 walk uses it to requantize the residual
    stream; ``deq(unit_name, x)`` widens a possibly-int8 residual input for
    the identity/max-pool shortcut paths. Both default to identity, which
    reproduces the plain walk exactly.
    """
    block_out = block_out or (lambda name, x: x)
    deq = deq or (lambda name, x: x)
    x = conv_fn("conv1", x, 2, 1, relu=True)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        "VALID")  # slim VALID 3x3/2 root max-pool
    end_points = {}
    for name, depth, db, stride, rate in unit_plan(units, cfg.output_stride):
        if x.shape[-1] != depth:
            shortcut = conv_fn(f"{name}/shortcut_conv", x, stride, 1,
                               relu=False)
        elif stride != 1:
            shortcut = jax.lax.reduce_window(
                deq(name, x), -jnp.inf, jax.lax.max, (1, 1, 1, 1),
                (1, stride, stride, 1), "VALID")
        else:
            shortcut = deq(name, x)
        y = conv_fn(f"{name}/conv1", x, 1, 1, relu=True)
        y = conv_fn(f"{name}/conv2", y, stride, rate, relu=True)
        y = conv_fn(f"{name}/conv3", y, 1, 1, relu=False)
        x = jax.nn.relu(shortcut + y)
        end_points[name.split("_")[0]] = x
        x = block_out(name, x)
    return x, end_points


@dataclasses.dataclass(frozen=True)
class QuantizedPoseModel:
    """Duck-types PoseModel.apply for the inference call sites.

    ``carry_dtype`` is the HBM dtype of inter-layer activations at graph
    branch points (block inputs/outputs, residual adds); linear
    conv1->conv2->conv3 chains carry int8 via epilogue requantization when
    ``int8_carry`` (see module docstring — the carry width, not the conv
    rate, decides whether int8 beats bf16 end-to-end)."""

    cfg: PoseConfig
    dtype: Any = jnp.bfloat16  # head compute dtype
    carry_dtype: Any = jnp.bfloat16
    int8_carry: bool = True
    residual_int8: bool = False

    def apply(self, qvariables: dict, images: jnp.ndarray,
              train: bool = False, return_features: bool = False) -> dict:
        if train:
            raise ValueError("QuantizedPoseModel is inference-only")
        cfg = self.cfg
        mean = jnp.asarray(cfg.mean_pixel, dtype=jnp.float32)
        x = images.astype(jnp.float32) - mean

        features, end_points = _int8_backbone(
            cfg, qvariables, x, carry_dtype=self.carry_dtype,
            int8_carry=self.int8_carry, residual_int8=self.residual_int8)
        features = features.astype(self.dtype)

        heads = {}
        if return_features:
            heads["features"] = features
        head = PredictionHead(cfg.num_joints, cfg.deconvolutionstride,
                              dtype=self.dtype)
        heads["part_pred"] = head.apply(
            {"params": qvariables["heads"]["part_pred"]},
            features).astype(jnp.float32)
        if cfg.location_refinement:
            locref_head = PredictionHead(cfg.num_joints * 2,
                                         cfg.deconvolutionstride,
                                         dtype=self.dtype)
            heads["locref"] = locref_head.apply(
                {"params": qvariables["heads"]["locref_pred"]},
                features).astype(jnp.float32)
        if cfg.intermediate_supervision and "intermediate_supervision" in \
                qvariables["heads"]:
            interm = PredictionHead(cfg.num_joints, cfg.deconvolutionstride,
                                    dtype=self.dtype)
            heads["part_pred_interm"] = interm.apply(
                {"params": qvariables["heads"]["intermediate_supervision"]},
                end_points["block3"].astype(self.dtype)).astype(jnp.float32)
        return heads


def _chain_consumer(site: str) -> str | None:
    """The next conv in a ResNet bottleneck's linear chain (the only
    places _walk_backbone feeds one conv_fn output straight into another,
    models/resnet.py BottleneckV1), or None at a graph branch point."""
    if site.endswith("/conv1"):
        return site[:-1] + "2"
    if site.endswith("/conv2"):
        return site[:-1] + "3"
    return None


def _quantize_to(x, scale):
    xf = x.astype(jnp.float32)
    return jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)


def _int8_backbone(cfg: PoseConfig, qvariables: dict, x,
                   carry_dtype: Any = jnp.bfloat16, int8_carry: bool = True,
                   residual_int8: bool = False):
    """The int8 backbone walk (shared by apply and calibration passes).

    ``residual_int8`` extends the narrow carry to the residual stream:
    each unit's post-add/post-relu output requantizes to int8 with the
    NEXT unit's conv1 input scale, so block boundaries move 1 byte/elem
    through HBM instead of 2. The next unit's shortcut_conv shares that
    tensor; its calibrated input scale is bitwise-identical to conv1's
    (both statistics were computed on the same activation), so one scale
    serves both consumers. Identity/max-pool shortcuts dequantize with the
    same scale before the add. The final unit stays wide (it feeds the
    bf16 heads).

    Measured accuracy cost (EVAL.md "int8 residual-carry accuracy",
    11/44 Reaching split): +0.89 px test RMSE at the dlc argmax+locref
    decode, free at the dgp soft-argmax decode — hence opt-in, never
    the int8 default.
    """
    qw = qvariables["qw"]
    oscale = qvariables["oscale"]
    bias = qvariables["bias"]
    act_scale = qvariables["act_scale"]
    mobile = cfg.net_type.startswith("mobilenet")
    act = jax.nn.relu6 if mobile else jax.nn.relu

    def conv_fn(site, x, stride, rate, relu):
        k = qw[site].shape[0]
        # int8 input => the producer already requantized with THIS site's
        # act_scale (the _chain_consumer / residual block_out contracts)
        xq = x if x.dtype == jnp.int8 else _quantize_to(x, act_scale[site])
        y = _conv(xq, qw[site], stride, rate,
                  "SAME" if mobile else _pad_for(k, stride, rate),
                  preferred=jnp.int32)
        y = y.astype(jnp.float32) * oscale[site] + bias[site]
        if relu:
            y = act(y)
        nxt = _chain_consumer(site) if (int8_carry and not mobile) else None
        if nxt is not None and nxt in qw:
            return _quantize_to(y, act_scale[nxt])
        return y.astype(carry_dtype)

    block_out = deq = None
    if residual_int8 and not mobile:
        names = [n for n, *_ in unit_plan(BLOCK_UNITS[cfg.net_type],
                                          cfg.output_stride)]
        next_conv1 = {names[i]: f"{names[i + 1]}/conv1"
                      for i in range(len(names) - 1)}

        def block_out(name, x):
            nxt = next_conv1.get(name)
            if nxt is None:  # last unit: wide, feeds the bf16 heads
                return x.astype(carry_dtype)
            return _quantize_to(x, act_scale[nxt])

        def deq(name, x):
            if x.dtype != jnp.int8:
                return x
            return x.astype(jnp.float32) * act_scale[f"{name}/conv1"]

    if mobile:
        from deepgraphpose_tpu.models.mobilenet import WIDTHS

        dw = qvariables["dw"]

        def dw_fn(site, x, stride, rate):
            w, b = dw[site]["w"], dw[site]["b"]
            y = _conv(x.astype(w.dtype), w, stride, rate, "SAME",
                      groups=w.shape[-1])
            return jax.nn.relu6(y + b).astype(carry_dtype)

        return _walk_mobilenet(cfg, WIDTHS[cfg.net_type], x, conv_fn, dw_fn)
    return _walk_backbone(cfg, BLOCK_UNITS[cfg.net_type], x, conv_fn,
                          block_out=block_out, deq=deq)


def _collect_forward(cfg: PoseConfig, folded: dict, images,
                     percentile: float | None = None):
    """f32 forward on folded weights -> (per-site input amax, features).

    ``percentile`` (e.g. 99.9) replaces the max-|x| range statistic with a
    clipped one — the standard PTQ defense when a few activation outliers
    would otherwise stretch the int8 grid and waste resolution on values
    that barely occur.

    The features output doubles as the fold-parity check (tests/test_quant):
    it must match the flax backbone bit-for-tolerance, proving the folding
    and the _walk_backbone topology against models/resnet.py.
    """
    mean = jnp.asarray(cfg.mean_pixel, dtype=jnp.float32)
    x = images.astype(jnp.float32) - mean
    amax: dict = {}
    mobile = cfg.net_type.startswith("mobilenet")
    act = jax.nn.relu6 if mobile else jax.nn.relu

    def _range_stat(x):
        ax = jnp.abs(x)
        if percentile is None:
            return jnp.max(ax)
        return jnp.percentile(ax.ravel(), percentile)

    def conv_fn(site, x, stride, rate, relu):
        w, b = folded[site]
        amax[site] = _range_stat(x)
        y = _conv(x, w, stride, rate,
                  "SAME" if mobile else _pad_for(w.shape[0], stride, rate))
        y = y + b
        return act(y) if relu else y

    if mobile:
        from deepgraphpose_tpu.models.mobilenet import WIDTHS

        def dw_fn(site, x, stride, rate):
            w, b = folded[site]
            y = _conv(x, w, stride, rate, "SAME", groups=w.shape[-1])
            return jax.nn.relu6(y + b)

        features, _ = _walk_mobilenet(cfg, WIDTHS[cfg.net_type], x,
                                      conv_fn, dw_fn)
    else:
        features, _ = _walk_backbone(cfg, BLOCK_UNITS[cfg.net_type], x,
                                     conv_fn)
    return amax, features


def supports_residual_int8(net_type: str) -> bool:
    """Whether the int8 residual-stream carry lowering exists for this
    backbone (ResNet only; mobilenet's inverted-residual carries are
    narrow and stay float). The single source of truth — callers that
    pick modes (e.g. analyze_videos' fast preset) query this instead of
    duplicating the net_type check."""
    return net_type in BLOCK_UNITS


def quantize_model(cfg: PoseConfig, variables: dict, calib_images,
                   dtype: Any = jnp.bfloat16, calib_batch: int = 8,
                   calib_percentile: float | None = None,
                   bias_correction: bool = True,
                   carry_dtype: Any = jnp.bfloat16,
                   int8_carry: bool = True,
                   residual_int8: bool = False
                   ) -> tuple[QuantizedPoseModel, dict]:
    """Build the int8 model from trained f32 variables.

    calib_images: (N, H, W, 3) uint8/f32 frames representative of the
    inference distribution (a handful from the target video suffices —
    activation ranges are dominated by the weights, not the scene).

    ``bias_correction`` (default on) measures, per conv site on the f32
    walk's own activations, the per-channel output shift the int8 lowering
    introduces (E[conv_f32(x) - conv_int8(x)]) and folds it into the bias —
    per-layer bias correction in the spirit of Nagel et al.'s data-free
    quantization (see _local_bias_stats for why it must be local).

    MobileNetV2: the dense (1x1 / stem / head) convs quantize; depthwise
    3x3s stay float (VPU-bound — int8 gains nothing on the MXU).
    """
    from deepgraphpose_tpu.models.mobilenet import WIDTHS

    if cfg.net_type not in BLOCK_UNITS and cfg.net_type not in WIDTHS:
        raise NotImplementedError(
            "int8 quantization supports ResNet and MobileNetV2 backbones, "
            f"not {cfg.net_type}")
    if residual_int8 and not supports_residual_int8(cfg.net_type):
        # the inverted-residual carries are narrow and already the cheap
        # part; the lowering only implements int8 carries for ResNet —
        # refuse rather than let the model/export metadata claim a mode
        # that was never applied
        raise NotImplementedError(
            "residual_int8 is a ResNet residual-stream mode; "
            f"{cfg.net_type} has no int8 carry lowering — use int8_carry")
    folded = folded_backbone_weights(variables)

    collect = jax.jit(lambda imgs: _collect_forward(
        cfg, folded, imgs, percentile=calib_percentile)[0])
    calib = np.asarray(calib_images)
    amax: dict[str, float] = {}
    for i in range(0, len(calib), calib_batch):
        batch = jnp.asarray(calib[i:i + calib_batch])
        for site, v in collect(batch).items():
            amax[site] = max(amax.get(site, 0.0), float(v))

    qw, oscale, bias = {}, {}, {}
    act_scale = {}
    dw = {}
    for site, (w, b) in folded.items():
        if site.endswith("/depthwise"):
            dw[site] = {"w": jnp.asarray(np.asarray(w, np.float32)),
                        "b": jnp.asarray(np.asarray(b, np.float32))}
            continue
        w = np.asarray(w, np.float32)
        sw = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0
        sw = np.maximum(sw, 1e-12)
        qw[site] = jnp.asarray(
            np.clip(np.rint(w / sw), -127, 127).astype(np.int8))
        sx = max(amax.get(site, 0.0), 1e-12) / 127.0
        act_scale[site] = jnp.float32(sx)
        oscale[site] = jnp.asarray(sx * sw, jnp.float32)
        bias[site] = jnp.asarray(np.asarray(b, np.float32))

    heads = {k: v for k, v in variables["params"].items()
             if k in ("part_pred", "locref_pred", "intermediate_supervision")}
    qvariables = {"qw": qw, "oscale": oscale, "bias": bias,
                  "act_scale": act_scale, "heads": heads}
    if dw:
        qvariables["dw"] = dw

    if bias_correction:
        stats = jax.jit(lambda imgs: _local_bias_stats(
            cfg, folded, qvariables, imgs))
        diffs: dict[str, list] = {}
        for i in range(0, len(calib), calib_batch):
            for site, v in stats(jnp.asarray(calib[i:i + calib_batch])
                                 ).items():
                diffs.setdefault(site, []).append(np.asarray(v))
        for site in bias:
            qvariables["bias"][site] = bias[site] + jnp.asarray(
                np.mean(diffs[site], axis=0), jnp.float32)

    return QuantizedPoseModel(cfg, dtype=dtype, carry_dtype=carry_dtype,
                              int8_carry=int8_carry,
                              residual_int8=residual_int8), qvariables


def calib_frames_from_video(video_file, n: int = 8, new_size=None,
                            crop=None, resize_to=None) -> np.ndarray:
    """First-``n``-frames calibration stack — the one helper every
    ``quantize=True`` entry point uses (estimate_pose, dynamic, streaming,
    serving export), so their preprocessing cannot drift.

    ``new_size``/``crop`` mirror estimate_pose's preprocessing order;
    ``resize_to`` forces an exact (h, w) regardless of the video's native
    size (serving export at a non-native input size).
    """
    import cv2

    from deepgraphpose_tpu.data.video import VideoReader

    reader = VideoReader(video_file)
    frames = []
    for _, frame in reader.iter_frames():
        if new_size is not None:
            frame = cv2.resize(frame, (new_size[1], new_size[0]))
        if crop is not None:
            x0, y0, x1, y1 = crop
            frame = frame[y0:y1, x0:x1]
        if resize_to is not None and frame.shape[:2] != tuple(resize_to):
            frame = cv2.resize(frame, (resize_to[1], resize_to[0]))
        frames.append(frame)
        if len(frames) >= n:
            break
    reader.close()
    if not frames:
        raise ValueError(f"no decodable frames in {video_file} "
                         "to calibrate on")
    return np.stack(frames)


def _local_bias_stats(cfg: PoseConfig, folded: dict, qvariables: dict,
                      images):
    """Per-site per-channel E[conv_f32(x) - conv_int8(x)] on the SAME f32
    input — each layer's own quantization-induced output shift, measured
    free of upstream drift (the f32 walk carries the activations). A
    one-shot global version (comparing full f32 vs full int8 walks) is
    unstable: every layer's statistic embeds the *uncorrected* upstream
    drift, so correcting all layers at once overshoots (measured 1.6x
    worse on a 50-layer stack)."""
    mean_px = jnp.asarray(cfg.mean_pixel, dtype=jnp.float32)
    x = images.astype(jnp.float32) - mean_px
    qw = qvariables["qw"]
    oscale = qvariables["oscale"]
    act_scale = qvariables["act_scale"]
    mobile = cfg.net_type.startswith("mobilenet")
    act = jax.nn.relu6 if mobile else jax.nn.relu
    diff: dict = {}

    def conv_fn(site, x, stride, rate, relu):
        w, b = folded[site]
        pad = "SAME" if mobile else _pad_for(w.shape[0], stride, rate)
        y32 = _conv(x, w, stride, rate, pad) + b
        inv_sx = 1.0 / act_scale[site]
        xq = jnp.clip(jnp.round(x * inv_sx), -127, 127).astype(jnp.int8)
        y8 = _conv(xq, qw[site], stride, rate, pad, preferred=jnp.int32)
        y8 = y8.astype(jnp.float32) * oscale[site] + b
        diff[site] = jnp.mean(y32 - y8, axis=(0, 1, 2))
        return act(y32) if relu else y32  # f32 path carries forward

    if mobile:
        from deepgraphpose_tpu.models.mobilenet import WIDTHS

        def dw_fn(site, x, stride, rate):
            w, b = folded[site]
            y = _conv(x, w, stride, rate, "SAME", groups=w.shape[-1])
            return jax.nn.relu6(y + b)

        _walk_mobilenet(cfg, WIDTHS[cfg.net_type], x, conv_fn, dw_fn)
    else:
        _walk_backbone(cfg, BLOCK_UNITS[cfg.net_type], x, conv_fn)
    return diff
