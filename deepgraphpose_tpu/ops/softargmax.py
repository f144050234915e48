"""2-D soft-argmax over confidence maps.

Semantics mirror the reference pipeline (softmax with temperature gamma over
H*W → separable-Gaussian smoothing with zero padding → renormalize →
expectation over the (row, col) grid), ref:
src/deepgraphpose/models/fitdgp_util.py:281-315 (gaussian kernel),
342-402 (argmax_2d_from_cm), 318-339 (make_2Dgrids).

TPU-first design: everything is a fused XLA computation over static shapes;
the Gaussian smoothing is two depthwise 1-D convolutions (the reference's
separable_conv2d), which XLA fuses with the surrounding elementwise work.
Coordinates are (row, col) in scoremap space; callers convert to pixels via
``coord * stride + stride / 2`` (ref: eval.py:352-353).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(sigma: float, truncate: float = 1.0,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 1-D Gaussian kernel, radius = int(sigma * truncate).

    ref: fitdgp_util.py:281-287 (make_gaussian_2d_kernel, SciPy logic).
    """
    radius = int(sigma * truncate)
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * jnp.square(x / sigma))
    return k / jnp.sum(k)


def gaussian_smooth_2d(maps: jnp.ndarray, sigma: float,
                       truncate: float = 1.0) -> jnp.ndarray:
    """Depthwise separable Gaussian blur with zero ('CONSTANT') padding.

    maps: (T, H, W, C). Pad amount equals the kernel radius so output keeps
    the input shape (ref: fitdgp_util.py:289-315 pads by ``gauss_len`` and
    convolves VALID; with truncate=1.0 the radius equals that pad).
    """
    radius = int(sigma * truncate)
    if radius <= 0:
        # Kernel degenerates to identity (single tap of weight 1).
        return maps
    k = gaussian_kernel_1d(sigma, truncate, maps.dtype)
    ksize = 2 * radius + 1
    c = maps.shape[-1]
    dn = jax.lax.conv_dimension_numbers(maps.shape, (ksize, 1, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    # HIGHEST: TPU convs default to bf16 passes, which costs ~3e-2 scoremap
    # cells of accuracy in the expectation (~0.25 px); full f32 here is free
    # next to the backbone.
    kh = jnp.tile(k.reshape(ksize, 1, 1, 1), (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        maps, kh, window_strides=(1, 1), padding=[(radius, radius), (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    kw = jnp.tile(k.reshape(1, ksize, 1, 1), (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        out, kw, window_strides=(1, 1), padding=[(0, 0), (radius, radius)],
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return out


@functools.partial(jax.jit, static_argnames=("gamma", "gauss_len", "threshold"))
def softargmax_2d(scoremaps: jnp.ndarray, gamma: float = 1.0,
                  gauss_len: float = 2.0,
                  threshold: float | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-argmax keypoint decoding.

    Args:
      scoremaps: (T, H, W, C) raw logits from the part-prediction head.
      gamma: softmax temperature multiplier.
      gauss_len: sigma of the smoothing Gaussian.
      threshold: optional relative threshold; probability mass below
        ``threshold * max`` is zeroed and the map renormalized
        (ref: fitdgp_util.py:380-393, unused in training).

    Returns:
      mu: (T, C, 2) expected (row, col) coordinates in scoremap space.
      smoothed: (T, H, W, C) smoothed, renormalized probability maps.
    """
    t, h, w, c = scoremaps.shape
    # softmax over the spatial axes per (frame, joint)
    logits = (scoremaps * gamma).reshape(t, h * w, c)
    probs = jax.nn.softmax(logits, axis=1).reshape(t, h, w, c)

    probs = gaussian_smooth_2d(probs, gauss_len)
    norm = jnp.sum(probs, axis=(1, 2), keepdims=True)
    probs = probs / (norm + 1e-100)

    if threshold is not None:
        peak = jnp.max(probs, axis=(1, 2), keepdims=True)
        probs = jnp.where(probs < peak * threshold, 0.0, probs)
        norm = jnp.sum(probs, axis=(1, 2), keepdims=True)
        probs = probs / (norm + 1e-100)

    rows = jax.lax.broadcasted_iota(scoremaps.dtype, (1, h, w, 1), 1)
    cols = jax.lax.broadcasted_iota(scoremaps.dtype, (1, h, w, 1), 2)
    mu_r = jnp.sum(probs * rows, axis=(1, 2))  # (T, C)
    mu_c = jnp.sum(probs * cols, axis=(1, 2))
    mu = jnp.stack([mu_r, mu_c], axis=-1)
    return mu, probs


def coords_to_pixels(mu: jnp.ndarray, stride: float) -> jnp.ndarray:
    """Scoremap-space (row, col) -> pixel-space (row, col).

    ref: eval.py:352-353 (mu * stride + stride / 2).
    """
    return mu * stride + 0.5 * stride


def pixels_to_xy(mu_px: jnp.ndarray) -> jnp.ndarray:
    """(row, col) -> (x, y) export convention (ref: eval.py:352-353)."""
    return mu_px[..., ::-1]
